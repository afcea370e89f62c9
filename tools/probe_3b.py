"""On-chip probe: FiTv2-3B/2 256x256 250-step serving throughput.

The reference's larger model (hidden 2304 / depth 40 / heads 24,
/root/reference/configs/fitv2/config_fitv2_3B.yaml:27-46; 653 GFLOPs/NFE,
README.md:55). Measures the same sampling pipeline the XL bench uses at the
3B geometry: bf16 dense CFG, int8 serving, int8 + guidance window [.3,.9].
Roofline: 653 GFLOPs x 2 (CFG) x 250 = 326.5 TFLOP/image -> v5e bf16
ceiling (197 TFLOP/s) = 0.60 img/s at 100% MFU.

Usage (real TPU, single process):
    python tools/probe_3b.py
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

BATCH = 8


def build_3b(precision='bf16'):
    from fitv2_tpu.models.fit import FiT
    return FiT(
        context_size=256, patch_size=2, in_channels=4, hidden_size=2304,
        depth=40, num_heads=24, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=False, use_sit=True, use_swiglu=True,
        q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
        adaln_lora_dim=576, custom_freqs='normal', max_cached_len=64,
        dtype=jnp.bfloat16, gemm_precision=precision)


def main():
    print('devices:', jax.devices(), flush=True)
    params = bench.init_params(build_3b())
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))
    print(f'params: {n_params/1e9:.3f}B', flush=True)
    labels = (jnp.arange(BATCH) % 1000).astype(jnp.int32)
    rng = jax.random.PRNGKey(1)

    variants = []
    for precision, name, low, high in (
            ('bf16', 'dense', 0.0, 1.0),
            ('int8', 'dense', 0.0, 1.0),
            ('int8', 'win[.3,.9]', 0.3, 0.9)):
        model = build_3b(precision)
        cfg = SamplingConfig(
            image_height=256, image_width=256,
            num_sampling_steps=bench.STEPS, cfg_scale=bench.CFG_SCALE,
            per_device_batch=BATCH, dtype=jnp.bfloat16,
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
                  f'({BATCH/dt:.4f} img/s)', flush=True)

    print('--- best-of-steady (round 0 discarded) ---', flush=True)
    for tag, _ in variants:
        best = min(times[tag][1:])
        print(f'{tag}: {best*1000:.1f} ms = {BATCH/best:.4f} img/s',
              flush=True)


if __name__ == '__main__':
    main()
