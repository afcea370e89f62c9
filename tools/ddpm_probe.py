"""FiTv1-XL DDPM/DDIM sampling throughput on the real chip.

The FiTv1 headline workload (reference sample_fit_ddp.py: FiT-XL/2 at
256x256, improved-diffusion 250-step respaced ancestral sampling, CFG 1.5)
measured through the SAME pipeline the CLI uses (sample/pipeline.py
sampler_mode='ddpm'/'ddim', vae=None so the number is model+loop, matching
bench.py's convention for the FiTv2 ODE path).

Model config = configs/fit_xl.yaml (reference configs/fit/config_fit_xl.yaml):
depth 28, hidden 1152, heads 16, epsilon + learned sigma, swiglu_large,
adaln 'normal', no qk-norm. ~628M params.

Usage: python tools/ddpm_probe.py [steps ...]  (default: 250 ddpm + ddim)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fitv2_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
CFG_SCALE = 1.5


def build_model():
    from fitv2_tpu.models.fit import FiT
    return FiT(
        context_size=256, patch_size=2, in_channels=4, hidden_size=1152,
        depth=28, num_heads=16, class_dropout_prob=0.1, num_classes=1000,
        learn_sigma=True, use_sit=False, use_swiglu=True,
        use_swiglu_large=True, adaln_type='normal', custom_freqs='normal',
        max_cached_len=64, dtype=jnp.bfloat16)


def init_params(model):
    n_ctx = model.context_size
    cpu = jax.devices('cpu')[0]
    with jax.default_device(cpu):
        rng = jax.random.PRNGKey(0)
        grid1 = jnp.zeros((1, 2, n_ctx), jnp.int32)
        size1 = jnp.asarray([[[16, 16]]], jnp.int32)
        params = jax.jit(model.init)(
            rng, jnp.zeros((1, n_ctx, 16), jnp.float32), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32), grid1, None, size1)['params']
        params = jax.tree_util.tree_map(
            lambda p: (p.astype(jnp.bfloat16) if p.dtype == jnp.float32
                       else p), params)
    dev = jax.devices()[0]
    if dev != cpu:
        params = jax.device_put(params, dev)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f'params: {n / 1e6:.1f}M', flush=True)
    return params


def main():
    from fitv2_tpu.sample.pipeline import SamplingConfig, build_sampler

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    model = build_model()
    params = init_params(model)
    labels = (jnp.arange(BATCH) % 1000).astype(jnp.int32)
    rng = jax.random.PRNGKey(1)

    for mode in ('ddpm', 'ddim'):
        cfg = SamplingConfig(
            image_height=256, image_width=256, num_sampling_steps=steps,
            cfg_scale=CFG_SCALE, per_device_batch=BATCH, dtype=jnp.bfloat16,
            sampler_mode=mode,
            diffusion_config={'diffusion_steps': 1000,
                              'noise_schedule': 'linear',
                              'learn_sigma': True})
        fn = build_sampler(model, params, cfg)
        fn(rng, labels).block_until_ready()  # compile + warmup
        t0 = time.perf_counter()
        n_iters = 3
        for _ in range(n_iters):
            out = fn(rng, labels)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / n_iters
        print(f'FiTv1-XL {mode} {steps}-step CFG batch-{BATCH}: '
              f'{dt * 1e3:.1f} ms = {BATCH / dt:.4f} img/s/chip '
              f'({dt / steps * 1e3:.2f} ms/step)', flush=True)


if __name__ == '__main__':
    main()
