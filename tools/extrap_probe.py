"""XL sampler with velocity extrapolation (training-free NFE reduction).

Measures the bench workload (FiTv2-XL, 256px, 250-step ladder, CFG) with
flow/samplers.euler_sample_extrapolated at eval_every in {1, 2, 4}:
the model runs on 250/eval_every steps, the state still advances on the
fine ladder with linearly-extrapolated velocity. eval_every=1 must
reproduce the bench number (exact dense Euler).

Run: python tools/extrap_probe.py [eval_every...] [--batch N]
"""

import os as _os, sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tools')):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

try:
    from fitv2_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(_REPO_ROOT)
except Exception:
    pass

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 250
BATCH = 8
CFG_SCALE = 1.5


def main():
    args = [a for a in sys.argv[1:] if a not in ('int8', '--order2')]
    precision = 'int8' if 'int8' in sys.argv[1:] else 'bf16'
    order = 2 if '--order2' in sys.argv[1:] else 1
    evs = [int(a) for a in args] or [2, 4]
    print('backend:', jax.devices(), flush=True)

    from bench_sweep import build_model, init_params
    from fitv2_tpu.flow.samplers import euler_sample_extrapolated

    model = build_model(precision)
    params = init_params()
    b2 = 2 * BATCH
    n_ctx = 256
    gw, gh = np.meshgrid(np.arange(16), np.arange(16))
    grid = jnp.asarray(np.broadcast_to(
        np.stack([gw.reshape(-1), gh.reshape(-1)], 0), (b2, 2, n_ctx)),
        jnp.int32)
    size = jnp.asarray(np.broadcast_to(np.array([[16, 16]]), (b2, 1, 2)),
                       jnp.int32)
    y = jnp.concatenate([(jnp.arange(BATCH) % 1000).astype(jnp.int32),
                         jnp.full((BATCH,), 1000, jnp.int32)])
    sigmas = jnp.linspace(0.0, 1.0, STEPS + 1)

    extra = {}
    if precision == 'int8':
        from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                         prequantize_weights)
        zz = jax.random.normal(jax.random.PRNGKey(9), (b2, n_ctx, 16),
                               jnp.float32)
        cal_batches = [
            (zz * s, jnp.full((b2,), t, jnp.float32), y, grid, None, size)
            for s, t in ((1.0, 0.1), (0.8, 0.5), (0.6, 0.9))]
        extra = {
            'quant_calib': calibrate_quant_scales(model, params,
                                                  cal_batches),
            'quant_weights': prequantize_weights(model, params,
                                                 cal_batches[0]),
        }
        print('calibrated + prequantized', flush=True)

    outs = {}
    for ev in evs:
        @jax.jit
        def sample(params, extra, z, ev=ev):
            def drift(zc, t_vec):
                z_in = jnp.concatenate([zc, zc], 0).astype(jnp.bfloat16)
                t2 = jnp.concatenate([t_vec, t_vec]).astype(jnp.float32)
                out = model.apply({'params': params, **extra}, z_in, t2, y,
                                  grid, None, size)
                c, u = jnp.split(out.astype(jnp.float32), 2, axis=0)
                return u + CFG_SCALE * (c - u)
            return euler_sample_extrapolated(drift, z, sigmas, eval_every=ev,
                                             order=order)

        z0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, n_ctx, 16),
                               jnp.float32)
        print(f'compiling {precision} eval_every={ev} order={order}...',
              flush=True)
        sample(params, extra, z0).block_until_ready()
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = sample(params, extra, z0)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        outs[ev] = np.asarray(out)
        print(f'eval_every={ev}: {dt:7.3f} s -> {BATCH/dt:6.3f} img/s/chip '
              f'({STEPS//ev} model evals)', flush=True)

    ks = sorted(outs)
    if len(ks) > 1:
        ref = outs[ks[0]]
        for ev in ks[1:]:
            rel = np.linalg.norm(outs[ev] - ref) / np.linalg.norm(ref)
            print(f'latents relL2 eval_every={ev} vs {ks[0]}: {rel:.4f}',
                  flush=True)


if __name__ == '__main__':
    main()
