"""On-chip overfit-one-sample probe: train -> sample -> recover the target.

The real-hardware twin of tests/test_overfit_e2e.py (the reference recipe:
/root/reference/train_fitv2_lwd_onesample.py and train.py:443-464 inline
previews). Trains a small FiTv2 by flow matching on ONE latent until the
50-step Euler sampler reproduces it from fresh noise, then rolls the SAME
trained parameters out under the int8 W8A8 serving mode — distribution-level
serving fidelity evidence on the actual TPU.

Run from /root/repo (no PYTHONPATH — it breaks the axon TPU plugin):
    python tools/overfit_probe.py [steps]
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_REPO_ROOT, _os.path.join(_REPO_ROOT, 'tests')):
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
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    print('backend:', jax.devices(), flush=True)

    from test_overfit_e2e import (_rel_l2, build_overfit_setup, rollout,
                                  train_overfit)

    model, batch = build_overfit_setup()
    target = np.asarray(batch['feature'][:1])

    t0 = time.perf_counter()
    params, loss_first, loss_last = train_overfit(model, batch, steps=steps)
    print(f'train {steps} steps: {time.perf_counter()-t0:.1f}s, '
          f'loss {loss_first:.3f} -> {loss_last:.4f}', flush=True)

    out = rollout(model, {'params': params}, batch)
    err = _rel_l2(out, target)
    psnr = 10 * np.log10(float(np.max(np.abs(target)) ** 2 /
                               np.mean((out - target) ** 2)))
    print(f'bf16/fp32 rollout: relL2 vs target {err:.4f}, PSNR {psnr:.1f} dB',
          flush=True)

    from fitv2_tpu.ops.quant import calibrate_quant_scales, prequantize_weights
    mq = model.clone(gemm_precision='int8')
    n_ctx = batch['feature'].shape[1]
    zc = jax.random.normal(jax.random.PRNGKey(11), (1, n_ctx, 16))
    cal_batches = [
        (zc * s, jnp.full((1,), t, jnp.float32), batch['label'][:1],
         batch['grid'][:1], None, batch['size'][:1])
        for s, t in ((1.0, 0.05), (0.8, 0.5), (0.7, 0.9))]
    variables = {
        'params': params,
        'quant_calib': calibrate_quant_scales(mq, params, cal_batches),
        'quant_weights': prequantize_weights(mq, params, cal_batches[0]),
    }
    out_q = rollout(mq, variables, batch)
    err_q = _rel_l2(out_q, target)
    drift = _rel_l2(out_q, out)
    print(f'int8 serving rollout: relL2 vs target {err_q:.4f}, '
          f'vs fp32 endpoint {drift:.4f}', flush=True)
    ok = err < 0.15 and err_q < 0.2 and drift < 0.1
    print(f'PROBE {"PASS" if ok else "FAIL"}', flush=True)


if __name__ == '__main__':
    main()
