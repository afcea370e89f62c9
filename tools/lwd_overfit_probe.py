"""On-chip LwD closed generative loop (round-4 VERDICT #5).

Runs tests/test_lwd_overfit_e2e.py's loop on the real chip: train all K=3
perflow segments of a small FiTLwD on ONE latent (reflow interpolant
targets, the reference's own overfit recipe
/root/reference/train_fitv2_lwd_onesample.py), then the sequential segment
samplers recover it from fresh noise — plain, CFG, windowed-Maruyama SDE,
and int8 W8A8 A/B on the same weights.

Run: python tools/lwd_overfit_probe.py [steps]
"""

import os as _os, sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tools'),
           _os.path.join(_REPO_ROOT, 'tests')):
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


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    print('backend:', jax.devices(), flush=True)
    from test_lwd_overfit_e2e import (
        build_lwd_overfit_setup, init_lwd_params, rel_l2, train_lwd_overfit)

    model, batch = build_lwd_overfit_setup()
    target = np.asarray(batch['feature'][0])
    t0 = time.time()
    state, first, last = train_lwd_overfit(
        model, batch, steps=steps,
        log=lambda i, l: print(f'step {i}: loss {l:.4f} '
                               f'({time.time()-t0:.0f}s)', flush=True))
    print(f'trained {steps} steps: loss {first:.4f} -> {last:.4f} '
          f'({time.time()-t0:.0f}s)', flush=True)
    ema = state.ema_params

    z0 = jax.random.normal(jax.random.PRNGKey(9), (4, 16, 16))
    y = jnp.full((4,), 3, jnp.int32)
    out = jax.jit(lambda p, z: model.apply(
        {'params': p}, z, y, 8, method=model.sample))(ema, z0)
    print(f'plain sample relL2: '
          f'{max(rel_l2(out[i], target) for i in range(4)):.4f}', flush=True)
    out_cfg = jax.jit(lambda p, z: model.apply(
        {'params': p}, z, y, 1.4, 8, method=model.sample_cfg))(ema, z0)
    print(f'sample_cfg relL2  : '
          f'{max(rel_l2(out_cfg[i], target) for i in range(4)):.4f}',
          flush=True)
    out_mar = jax.jit(lambda p, r, z: model.apply(
        {'params': p}, r, z, y, 1.4, 8, guidance_low=0.3, guidance_high=0.9,
        method=model.sample_maruyama_cfg))(ema, jax.random.PRNGKey(11), z0)
    print(f'maruyama win relL2: '
          f'{max(rel_l2(out_mar[i], target) for i in range(4)):.4f}',
          flush=True)
    ctrl = init_lwd_params(model, batch, seed=33)
    out_ctrl = jax.jit(lambda p, z: model.apply(
        {'params': p}, z, y, 8, method=model.sample))(ctrl, z0)
    print(f'control relL2     : '
          f'{min(rel_l2(out_ctrl[i], target) for i in range(4)):.4f}',
          flush=True)

    from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                     prequantize_weights)
    m_q = model.clone(gemm_precision='int8')
    cal_args = (batch['feature'][:4], jnp.full((4,), 0.5),
                batch['label'][:4], batch['grid'][:4], batch['mask'][:4],
                batch['size'][:4])
    rngs = {'label_dropout': jax.random.PRNGKey(21)}
    coll = {'quant_calib': calibrate_quant_scales(m_q, ema, [cal_args],
                                                  rngs=rngs),
            'quant_weights': prequantize_weights(m_q, ema, cal_args,
                                                 rngs=rngs)}
    out_q = jax.jit(lambda p, z: m_q.apply(
        {'params': p, **coll}, z, y, 8, method=m_q.sample))(ema, z0)
    print(f'int8 sample relL2 : '
          f'{max(rel_l2(out_q[i], target) for i in range(4)):.4f} '
          f'(drift vs bf16 {rel_l2(out_q, out):.4f})', flush=True)


if __name__ == '__main__':
    main()
