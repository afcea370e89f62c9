"""On-chip A/B: Pallas fused int8 GEMM kernels vs the XLA int8 chain.

Decides whether ops/quant.py ``use_fused_kernels`` should be on in the
serving mode. Runs the bench workload (FiTv2-XL, batch 8, CFG double batch,
250-step Euler scan) twice — fused kernels off/on — plus a single-forward
numerics check. Timing follows the verify-skill rules: interleaved A/B,
multi-second scans, first measurement of each variant discarded.

Usage (real TPU, single process):
    python tools/fused_gemm_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the compile cache on import)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fitv2_tpu.ops import quant  # noqa: E402
from fitv2_tpu.ops.quant import (calibrate_quant_scales,  # noqa: E402
                                 prequantize_weights)


def main():
    print('devices:', jax.devices(), flush=True)
    model = bench.build_model('int8')
    n_h = n_w = 16
    n_ctx = model.context_size
    b2 = 2 * bench.BATCH

    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    grid = jnp.asarray(np.broadcast_to(grid, (b2, 2, n_ctx)), jnp.int32)
    mask = None
    size = jnp.asarray(np.broadcast_to(np.array([[n_h, n_w]]), (b2, 1, 2)),
                       jnp.int32)
    y = jnp.concatenate([
        (jnp.arange(bench.BATCH) % 1000).astype(jnp.int32),
        jnp.full((bench.BATCH,), 1000, jnp.int32)])

    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        rng, jnp.zeros((1, n_ctx, 16), jnp.float32), jnp.zeros((1,)),
        y[:1], grid[:1], None, size[:1])['params']
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    # The DiT-style zero-init (FinalLayer linear + adaLN gates) makes a
    # fresh model output exactly 0, which would turn the fused-vs-XLA
    # numerics check below into 0-vs-0 (vacuous; first run of this probe
    # printed cos=0.0 for exactly this reason). Fill every all-zero leaf
    # with small noise so the comparison exercises real values.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        jnp.where(jnp.all(p == 0),
                  0.02 * jax.random.normal(k, p.shape, p.dtype), p)
        if jnp.issubdtype(p.dtype, jnp.floating) else p
        for p, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    zc = jax.random.normal(jax.random.PRNGKey(9), (b2, n_ctx, 16),
                           jnp.float32)
    batches = [(zc * s, jnp.full((b2,), t, jnp.float32), y, grid, mask,
                size) for s, t in ((1.0, 0.05), (0.8, 0.5), (0.7, 0.9))]
    extra = {
        'quant_calib': calibrate_quant_scales(model, params, batches),
        'quant_weights': prequantize_weights(model, params, batches[0]),
    }

    # --- single-forward numerics: fused vs XLA int8 chain -------------
    def fwd_fn():
        @jax.jit
        def fwd(params, extra, z, t):
            return model.apply({'params': params, **extra}, z, t, y,
                               grid, mask, size)
        return fwd

    z1 = zc * 0.9
    t1 = jnp.full((b2,), 0.4, jnp.float32)
    quant.set_fused_kernels(False)
    ref = np.asarray(fwd_fn()(params, extra, z1, t1), np.float64)
    print('XLA forward done', flush=True)
    quant.set_fused_kernels(True)
    fused = np.asarray(fwd_fn()(params, extra, z1, t1), np.float64)
    print('fused forward done', flush=True)
    rel = np.linalg.norm(fused - ref) / (np.linalg.norm(ref) + 1e-12)
    cos = float((fused * ref).sum() /
                (np.linalg.norm(fused) * np.linalg.norm(ref) + 1e-12))
    print(f'forward fused-vs-xla relL2={rel:.3e} cos={cos:.6f}', flush=True)

    # --- 250-step scan timing, interleaved ----------------------------
    sigmas = jnp.linspace(0.0, 1.0, bench.STEPS + 1)

    def make_sample():
        @jax.jit
        def sample(params, extra, z):
            def step(z, pair):
                t_cur, t_next = pair[0], pair[1]
                z2 = jnp.concatenate([z, z], axis=0)
                t2 = jnp.full((b2,), t_cur, jnp.float32)
                out = model.apply({'params': params, **extra}, z2, t2, y,
                                  grid, mask, size)
                cond, uncond = jnp.split(out.astype(jnp.float32), 2, axis=0)
                v = uncond + bench.CFG_SCALE * (cond - uncond)
                return z + (t_next - t_cur) * v, None
            pairs = jnp.stack([sigmas[:-1], sigmas[1:]], axis=-1)
            z, _ = jax.lax.scan(step, z, pairs)
            return z

        return sample

    z0 = jax.random.normal(jax.random.PRNGKey(1),
                           (bench.BATCH, n_ctx, 16), jnp.float32)
    fns = {}
    finals = {}
    for name, flag in (('xla', False), ('fused', True)):
        quant.set_fused_kernels(flag)
        fns[name] = make_sample()
        out = fns[name](params, extra, z0)
        finals[name] = np.asarray(out, np.float64)
        print(f'{name}: compiled + warm', flush=True)

    drel = (np.linalg.norm(finals['fused'] - finals['xla']) /
            (np.linalg.norm(finals['xla']) + 1e-12))
    print(f'250-step final-latent fused-vs-xla relL2={drel:.3e}', flush=True)

    times = {'xla': [], 'fused': []}
    for rnd in range(3):
        for name in ('xla', 'fused'):
            t0 = time.perf_counter()
            out = fns[name](params, extra, z0)
            out.block_until_ready()
            _ = np.asarray(out[0, 0, 0])  # force value fetch (lazy runtime)
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f'round {rnd} {name}: {dt*1000:.1f} ms '
                  f'({bench.BATCH/dt:.4f} img/s)', flush=True)

    for name in ('xla', 'fused'):
        best = min(times[name][1:])  # discard round 0 (first-call inflation)
        print(f'{name}: best-of-steady {best*1000:.1f} ms = '
              f'{bench.BATCH/best:.4f} img/s', flush=True)


if __name__ == '__main__':
    main()
