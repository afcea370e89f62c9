"""On-chip probe: the fully-composed serving mode — int8 GEMMs + guidance-
interval CFG + velocity-extrapolated Euler — on the XL bench workload.

Round-3 measured the ingredients separately (tools/interval_probe.py:
int8 win[.3,.9] 1.807 img/s; tools/extrap_probe.py: int8 extrap N=2
2.99 img/s). sample/pipeline.py composes them (each guidance phase runs
its own extrapolated scan with slope resets at the phase boundaries);
this probe measures the composition so bench.py's serving_max can report
the real maximum instead of the extrap-only number.

Interleaved per the verify-skill timing rules (multi-second 250-step
scans, round 0 discarded).

Usage (real TPU, single process):
    python tools/composed_probe.py
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
    model = bench.build_model('int8')
    variants = []
    for name, low, high, every, order in (
            ('extrap2-only', 0.0, 1.0, 2, 1),
            ('win[.3,.9]+extrap2', 0.3, 0.9, 2, 1),
            ('win[.3,.9]+extrap2-o2', 0.3, 0.9, 2, 2),
            ('win[.3,.9]+extrap4-o2', 0.3, 0.9, 4, 2)):
        cfg = SamplingConfig(
            image_height=256, image_width=256,
            num_sampling_steps=bench.STEPS, cfg_scale=bench.CFG_SCALE,
            per_device_batch=bench.BATCH, dtype=jnp.bfloat16,
            guidance_low=low, guidance_high=high,
            velocity_eval_every=every, velocity_extrap_order=order)
        fn = build_sampler(model, params, cfg)
        out = fn(rng, labels)
        jax.block_until_ready(out)
        _ = np.asarray(out).ravel()[0]
        print(f'{name}: compiled + warm', flush=True)
        variants.append((name, fn))

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
