"""Reconcile the bench-vs-probe int8 serving gap (round-5 VERDICT #4).

BENCH_r04 reports int8 serving 1.4745 img/s; PARITY/README quote 1.56 from
tools/ablate_probe.py on the same workload — a persistent ~5-6% gap. The
two harnesses time the SAME jitted 250-step scan but under different
protocols:

  bench.py _timed   : N individually-synced calls (block_until_ready per
                      call), median — each call pays one full host<->device
                      round trip through the axon tunnel.
  ablate_probe      : 2 back-to-back dispatches, ONE final sync, /2 —
                      per-call host overhead amortized; this is also how a
                      real FID loop runs (batches dispatched back-to-back).

This probe measures the same int8 workload under both protocols plus a
4-deep pipeline, so the gap is attributed to measured per-call sync
overhead (or shown to be real). Run on the chip:
    python tools/bench_sync_probe.py
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

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 250
BATCH = 8


def main():
    print('backend:', jax.devices(), flush=True)
    from bench_sweep import build_model, init_params, make_sampler
    from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                     prequantize_weights)

    params = init_params()
    results = {}
    for precision in ('bf16', 'int8'):
        model = build_model(precision)
        calib = None
        if precision == 'int8':
            gw, gh = np.meshgrid(np.arange(16), np.arange(16))
            g = jnp.asarray(np.broadcast_to(
                np.stack([gw.reshape(-1), gh.reshape(-1)], 0),
                (16, 2, 256)), jnp.int32)
            sz = jnp.asarray(np.broadcast_to(np.array([[16, 16]]),
                                             (16, 1, 2)), jnp.int32)
            yy = (jnp.arange(16) % 1000).astype(jnp.int32)
            zz = jax.random.normal(jax.random.PRNGKey(9), (16, 256, 16),
                                   jnp.float32)
            cal = calibrate_quant_scales(
                model, params,
                [(zz * s, jnp.full((16,), t, jnp.float32), yy, g, None, sz)
                 for s, t in ((1.0, 0.1), (0.8, 0.5), (0.6, 0.9))])
            qw = prequantize_weights(
                model, params, (zz, jnp.full((16,), 0.5, jnp.float32), yy,
                                g, None, sz))
            calib = {'quant_calib': cal, 'quant_weights': qw}
        sample, _ = make_sampler(model, BATCH, calib)
        z0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 16),
                               jnp.float32)
        print(f'compiling {precision}...', flush=True)
        sample(params, z0).block_until_ready()
        sample(params, z0).block_until_ready()  # discard first-call 2x

        # protocol A: per-call sync x5, median (bench.py)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            sample(params, z0).block_until_ready()
            times.append(time.perf_counter() - t0)
        times.sort()
        per_call = times[2]

        # protocol B: k back-to-back dispatches, one sync (ablate_probe)
        pipelined = {}
        for k in (2, 4):
            t0 = time.perf_counter()
            for _ in range(k):
                out = sample(params, z0)
            out.block_until_ready()
            pipelined[k] = (time.perf_counter() - t0) / k
        r = {
            'per_call_synced_img_s': round(BATCH / per_call, 4),
            'pipelined2_img_s': round(BATCH / pipelined[2], 4),
            'pipelined4_img_s': round(BATCH / pipelined[4], 4),
            'per_call_sync_overhead_ms': round(
                (per_call - pipelined[4]) * 1e3, 1),
        }
        results[precision] = r
        print(f'{precision}: {json.dumps(r)}', flush=True)
    print('SYNC_PROBE_JSON ' + json.dumps(results), flush=True)


if __name__ == '__main__':
    main()
