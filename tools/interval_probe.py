"""On-chip probe: guidance-interval CFG serving mode (SamplingConfig
guidance_low/high) on the XL bench workload.

Steps with t_cur outside [low, high] run a single conditional forward
(batch B) instead of the CFG double batch (2B) — the reference's LwD
maruyama window semantics (fit_model_lwd_bk.py:1332) lifted to the main FM
Euler path. Measures the dense full-CFG path against interval variants at
bf16 and int8 serving precision, interleaved per the verify-skill timing
rules (multi-second 250-step scans, first round discarded).

Usage (real TPU, single process):
    python tools/interval_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (enables the compile cache on import)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from fitv2_tpu.sample import SamplingConfig, build_sampler  # noqa: E402


def main():
    print('devices:', jax.devices(), flush=True)
    labels = (jnp.arange(bench.BATCH) % 1000).astype(jnp.int32)
    rng = jax.random.PRNGKey(1)

    params = bench.init_params(bench.build_model())
    variants = []
    for precision in ('bf16', 'int8'):
        model = bench.build_model(precision)
        for name, low, high in (
                ('dense', 0.0, 1.0),
                ('win[.3,.9]', 0.3, 0.9),
                ('win[.1,.8]', 0.1, 0.8)):
            cfg = SamplingConfig(
                image_height=256, image_width=256,
                num_sampling_steps=bench.STEPS, cfg_scale=bench.CFG_SCALE,
                per_device_batch=bench.BATCH, dtype=jnp.bfloat16,
                guidance_low=low, guidance_high=high)
            fn = build_sampler(model, params, cfg)
            tag = f'{precision}:{name}'
            out = fn(rng, labels)
            jax.block_until_ready(out)
            _ = np.asarray(out).ravel()[0]
            print(f'{tag}: compiled + warm', flush=True)
            variants.append((tag, fn))

    times = {tag: [] for tag, _ in variants}
    for rnd in range(3):
        for tag, fn in variants:
            t0 = time.perf_counter()
            out = fn(rng, labels)
            jax.block_until_ready(out)
            _ = np.asarray(out).ravel()[0]
            dt = time.perf_counter() - t0
            times[tag].append(dt)
            print(f'round {rnd} {tag}: {dt*1000:.1f} ms '
                  f'({bench.BATCH/dt:.4f} img/s)', flush=True)

    print('--- best-of-steady (round 0 discarded) ---', flush=True)
    for tag, _ in variants:
        best = min(times[tag][1:])
        print(f'{tag}: {best*1000:.1f} ms = {bench.BATCH/best:.4f} img/s',
              flush=True)


if __name__ == '__main__':
    main()
