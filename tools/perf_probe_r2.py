"""Round-2 perf probe on the real TPU chip.

Measures, at the FiTv2-XL north-star shape (B=16 CFG batch, N=256, H=16,
Dh=72, bf16):
  1. isolated attention chain: XLA unfused vs fused megakernel (36-iter scan)
  2. full XL forward: attn_impl='xla' vs 'fused'
  3. sampler throughput at several batch sizes

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_probe_r2.py [stage...]
Stages: iso fwd batch (default: iso fwd)
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
# NOTE: do NOT set PYTHONPATH=/root/repo instead — it breaks the axon
# TPU plugin registration (backend 'axon' fails to initialize).

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def stage_iso():
    from fitv2_tpu.ops import fused_attention as fa
    B, N, H, Dh = 16, 256, 16, 72
    C = H * Dh
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (B, N, 3 * C), jnp.bfloat16)
    cos = jax.random.normal(jax.random.PRNGKey(1), (B, N, Dh), jnp.bfloat16)
    sin = jax.random.normal(jax.random.PRNGKey(2), (B, N, Dh), jnp.bfloat16)
    mask = jnp.ones((B, N), jnp.float32)

    def scan36(f):
        @jax.jit
        def run(qkv):
            def body(x, _):
                o = f(x, cos, sin, mask, H)
                # feed back so iterations are serialized; pad back to 3C
                return jnp.concatenate([o, o, x[..., 2 * C:]], -1), None
            out, _ = jax.lax.scan(body, qkv, None, length=36)
            return out
        return run

    print('compiling iso xla...', flush=True)
    t_xla = timeit(scan36(lambda *a: fa._reference_chain(*a, 1e-6, True, True)), qkv)
    print(f'iso  XLA chain   36x: {t_xla*1e3:8.3f} ms  ({t_xla/36*1e6:7.1f} us/call)', flush=True)
    print('compiling iso fused...', flush=True)
    t_fus = timeit(scan36(lambda *a: fa.fused_qkln_rope_attention(*a)), qkv)
    print(f'iso  fused kernel 36x: {t_fus*1e3:8.3f} ms  ({t_fus/36*1e6:7.1f} us/call)', flush=True)

    # numerics
    o1 = jax.jit(lambda x: fa._reference_chain(x, cos, sin, mask, H, 1e-6, True, True))(qkv)
    o2 = jax.jit(lambda x: fa.fused_qkln_rope_attention(x, cos, sin, mask, H))(qkv)
    err = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
    print(f'iso  max abs err: {err:.5f}', flush=True)


def build_xl(attn_impl):
    from fitv2_tpu.models.fit import FiT
    return FiT(
        context_size=256, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=288, custom_freqs='normal', max_cached_len=64,
        dtype=jnp.bfloat16, attn_impl=attn_impl)


def make_inputs(b2, n_ctx=256, n_h=16, n_w=16):
    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = jnp.asarray(np.broadcast_to(grid, (b2, 2, n_ctx)), jnp.int32)
    mask = jnp.ones((b2, n_ctx), jnp.float32)
    size = jnp.asarray(np.broadcast_to(np.array([[n_h, n_w]]), (b2, 1, 2)),
                       jnp.int32)
    y = (jnp.arange(b2) % 1000).astype(jnp.int32)
    return grid, mask, size, y


def init_params(model, grid, mask, size, y):
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 16), jnp.float32),
        jnp.zeros((1,)), y[:1], grid[:1],
        None if mask is None else mask[:1], size[:1])['params']
    return jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)


def stage_fwd():
    B2 = 16
    grid, mask, size, y = make_inputs(B2)
    x = jax.random.normal(jax.random.PRNGKey(1), (B2, 256, 16), jnp.bfloat16)
    t = jnp.full((B2,), 0.5, jnp.float32)
    for impl in ('xla', 'fused'):
        model = build_xl(impl)
        params = init_params(model, grid, mask, size, y)
        print(f'compiling fwd {impl}...', flush=True)
        f = jax.jit(lambda p, xx: model.apply({'params': p}, xx, t, y, grid,
                                              mask, size))
        dt = timeit(f, params, x, iters=20)
        tf = 2 * 0.294e12 * (B2 / 2) / dt  # fvcore-MAC-convention FLOPs
        print(f'fwd  {impl:5s}: {dt*1e3:8.3f} ms  ({tf/1e12:6.1f} TFLOP/s eff)',
              flush=True)


def stage_batch():
    # full 250-step sampler at several batch sizes, fused attention
    for batch in (8, 16, 32):
        b2 = 2 * batch
        model = build_xl('auto')
        grid, mask, size, _ = make_inputs(b2)
        y = jnp.concatenate([(jnp.arange(batch) % 1000).astype(jnp.int32),
                             jnp.full((batch,), 1000, jnp.int32)])
        params = init_params(model, grid, mask, size, y)
        sigmas = jnp.linspace(0.0, 1.0, 251)

        @jax.jit
        def sample(params, z):
            def step(z, pair):
                t_cur, t_next = pair[0], pair[1]
                z2 = jnp.concatenate([z, z], axis=0)
                t2 = jnp.full((b2,), t_cur, jnp.float32)
                out = model.apply({'params': params}, z2, t2, y, grid, mask,
                                  size)
                cond, uncond = jnp.split(out.astype(jnp.float32), 2, axis=0)
                v = uncond + 1.5 * (cond - uncond)
                return z + (t_next - t_cur) * v, None
            pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
            z, _ = jax.lax.scan(step, z, pairs)
            return z

        z0 = jax.random.normal(jax.random.PRNGKey(1), (batch, 256, 16),
                               jnp.float32)
        print(f'compiling sampler batch={batch}...', flush=True)
        dt = timeit(sample, params, z0, iters=2, warmup=1)
        print(f'sampler batch={batch}: {dt:7.3f} s -> '
              f'{batch/dt:6.3f} img/s/chip', flush=True)


if __name__ == '__main__':
    stages = sys.argv[1:] or ['iso', 'fwd']
    print('backend:', jax.default_backend(), jax.devices(), flush=True)
    for s in stages:
        {'iso': stage_iso, 'fwd': stage_fwd, 'batch': stage_batch}[s]()
    print('DONE', flush=True)
