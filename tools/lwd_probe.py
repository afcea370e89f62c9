"""LwD-XL sampler throughput on the real chip.

The fork's research headline is latency-vs-FID (plot_time_fid.py:20-23:
FM 20.38 s/batch -> BFM+SF+RA 11.33 s on an unspecified GPU). This probe
measures OUR LwD-XL serving latency: FiTLwD at the configs/fitv2_xl_lwd.yaml
geometry (depth 36, hidden 1152, K=12 perflow segments), `sample_cfg` with
S steps per segment = 2*K*S segment forwards of depth/K blocks each
(~= 2*S full-model-forward equivalents per image vs the 250-step ODE's 500).

Run: python tools/lwd_probe.py [S] [batch]
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


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print('backend:', jax.devices(), flush=True)

    from fitv2_tpu.models.fit_lwd import FiTLwD

    model = FiTLwD(
        context_size=256, patch_size=2, in_channels=4, hidden_size=1152,
        depth=36, num_heads=16, num_classes=1000, class_dropout_prob=0.1,
        number_of_perflow=12, n_patch_h=16, n_patch_w=16,
        adaln_type='lora', adaln_lora_dim=288, max_cached_len=64,
        dtype=jnp.bfloat16)

    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    grid, mask, size = make_grid_mask_size(1, 16, 16, 256)
    x0 = jnp.zeros((1, 256, 16), jnp.float32)
    y0 = jnp.zeros((1,), jnp.int32)
    print('init...', flush=True)
    params = jax.jit(lambda r: model.init(
        {'params': r, 'label_dropout': jax.random.PRNGKey(1)},
        x0, jnp.zeros((1,)), y0, grid, mask, size)
    )(jax.random.PRNGKey(0))['params']
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)

    y = (jnp.arange(batch) % 1000).astype(jnp.int32)

    @jax.jit
    def sample(params, z):
        return model.apply({'params': params}, z, y, 1.4, steps,
                           method=model.sample_cfg)

    z0 = jax.random.normal(jax.random.PRNGKey(2), (batch, 256, 16),
                           jnp.float32)
    print(f'compiling sample_cfg K=12 S={steps} batch={batch}...',
          flush=True)
    t0 = time.perf_counter()
    sample(params, z0).block_until_ready()
    print(f'compile+first: {time.perf_counter()-t0:.1f}s', flush=True)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = sample(params, z0)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f'LwD-XL sample_cfg: {dt*1e3:8.2f} ms/batch -> '
          f'{batch/dt:7.2f} img/s/chip '
          f'({2*12*steps} segment NFE = {2*steps} full-model equiv)',
          flush=True)


if __name__ == '__main__':
    main()
