"""North-star sampler sweep: batch x gemm_precision, one TPU process.

Measures images/sec/chip for the FiTv2-XL 256x256 250-step ODE CFG sampler
(bench.py workload) at several batch sizes, bf16 vs int8 GEMMs, plus the
int8-vs-bf16 output deviation (cosine / relative L2 of the velocity field
at a mid-trajectory state) so speed and fidelity are reported together.

Run from /root/repo (no PYTHONPATH — it breaks the axon TPU plugin):
    python tools/bench_sweep.py [batches...]
"""

import os as _os, sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tools')):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

try:  # persistent compile cache — effective through the axon tunnel;
    # keyed per machine (SIGILL hazard for cross-host CPU AOT entries)
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO_ROOT)
except Exception:
    pass

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 250
CFG_SCALE = 1.5


def build_model(precision):
    from fitv2_tpu.models.fit import FiT
    return FiT(
        context_size=256, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=288, custom_freqs='normal', max_cached_len=64,
        dtype=jnp.bfloat16, gemm_precision=precision)


def make_sampler(model, batch, calib=None):
    b2 = 2 * batch
    n_h = n_w = 16
    n_ctx = 256
    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = jnp.asarray(np.broadcast_to(grid, (b2, 2, n_ctx)), jnp.int32)
    mask = None  # full grid: statically-absent mask (bench.py parity)
    size = jnp.asarray(np.broadcast_to(np.array([[n_h, n_w]]), (b2, 1, 2)),
                       jnp.int32)
    y = jnp.concatenate([(jnp.arange(batch) % 1000).astype(jnp.int32),
                         jnp.full((batch,), 1000, jnp.int32)])
    sigmas = jnp.linspace(0.0, 1.0, STEPS + 1)

    # quant collections ride as jit ARGUMENTS — closing over them embeds
    # ~0.7 GB of prequantized weights as HLO constants (the tunnel's
    # remote_compile rejects the payload with HTTP 413)
    @functools.partial(jax.jit, static_argnums=())
    def sample(params, extra, z):
        def step(z, pair):
            t_cur, t_next = pair[0], pair[1]
            z2 = jnp.concatenate([z, z], axis=0)
            t2 = jnp.full((b2,), t_cur, jnp.float32)
            out = model.apply({'params': params, **extra},
                              z2, t2, y, grid, mask, size)
            cond, uncond = jnp.split(out.astype(jnp.float32), 2, axis=0)
            v = uncond + CFG_SCALE * (cond - uncond)
            return z + (t_next - t_cur) * v, None

        pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
        z, _ = jax.lax.scan(step, z, pairs)
        return z

    extra = calib or {}

    def sample_bound(params, z):
        return sample(params, extra, z)

    def fwd(params, z, t):
        b = z.shape[0]
        return model.apply(
            {'params': params}, z, jnp.full((b,), t, jnp.float32), y[:b],
            grid[:b], None, size[:b])

    return sample_bound, jax.jit(fwd)


def init_params(batch=8):
    model = build_model('bf16')
    _, fwd = make_sampler(model, batch)
    gw, gh = np.meshgrid(np.arange(16), np.arange(16))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 16), jnp.float32),
        jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
        jnp.asarray(grid, jnp.int32)[None], jnp.ones((1, 256), jnp.float32),
        jnp.asarray([[[16, 16]]], jnp.int32))['params']
    # randomize (zero-init heads make outputs zero; we want a live network
    # for the fidelity comparison) then cast bf16
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        (0.02 * jax.random.normal(k, l.shape, jnp.float32)).astype(
            jnp.bfloat16)
        for k, l in zip(keys, leaves)])
    return params


def main():
    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    print('backend:', jax.devices(), flush=True)
    params = init_params()

    # fidelity: bf16 vs int8 velocity field at a mid-trajectory state
    m_bf = build_model('bf16')
    m_q = build_model('int8')
    _, fwd_bf = make_sampler(m_bf, 8)
    _, fwd_q = make_sampler(m_q, 8)
    z = jax.random.normal(jax.random.PRNGKey(3), (16, 256, 16), jnp.float32)
    a = np.asarray(fwd_bf(params, z, 0.5), np.float64).ravel()
    b = np.asarray(fwd_q(params, z, 0.5), np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
    print(f'int8 fidelity: cos={cos:.6f} relL2={rel:.4f}', flush=True)

    precisions = tuple((_os.environ.get('SWEEP_PRECISIONS') or
                        'bf16,int8,int8cal').split(','))
    for precision in precisions:
        model = build_model('int8' if precision == 'int8cal' else precision)
        calib = None
        if precision == 'int8cal':
            # one-batch calibration: static per-site activation scales
            # + one-time weight prequantization
            from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                             prequantize_weights)
            gw, gh = np.meshgrid(np.arange(16), np.arange(16))
            g = jnp.asarray(np.broadcast_to(
                np.stack([gw.reshape(-1), gh.reshape(-1)], 0),
                (16, 2, 256)), jnp.int32)
            mk = jnp.ones((16, 256), jnp.float32)
            sz = jnp.asarray(np.broadcast_to(np.array([[16, 16]]),
                                             (16, 1, 2)), jnp.int32)
            yy = (jnp.arange(16) % 1000).astype(jnp.int32)
            zz = jax.random.normal(jax.random.PRNGKey(9), (16, 256, 16),
                                   jnp.float32)
            cal = calibrate_quant_scales(
                model, params,
                [(zz * s, jnp.full((16,), t, jnp.float32), yy, g, mk, sz)
                 for s, t in ((1.0, 0.1), (0.8, 0.5), (0.6, 0.9))])
            qw = prequantize_weights(
                model, params,
                (zz, jnp.full((16,), 0.5, jnp.float32), yy, g, mk, sz))
            calib = {'quant_calib': cal, 'quant_weights': qw}
            print('calibrated + prequantized', flush=True)
        for batch in batches:
            sample, _ = make_sampler(model, batch, calib)
            z0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 16),
                                   jnp.float32)
            print(f'compiling {precision} batch={batch}...', flush=True)
            sample(params, z0).block_until_ready()
            t0 = time.perf_counter()
            n = 2
            for _ in range(n):
                out = sample(params, z0)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / n
            print(f'{precision} batch={batch}: {dt:7.3f} s -> '
                  f'{batch/dt:6.3f} img/s/chip '
                  f'({dt/STEPS*1e3:6.2f} ms/step)', flush=True)


if __name__ == '__main__':
    main()
