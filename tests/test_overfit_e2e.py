"""Closed-loop generative correctness without external weights.

Port of the reference's overfit-one-sample recipe
(/root/reference/train_fitv2_lwd_onesample.py; train.py:443-464 inline
previews): train a small FiTv2 by flow matching on a SINGLE latent until the
50-step Euler sampler reproduces that latent from fresh noise. For a
point-mass data distribution the optimal velocity field is
v(x, t) = (x1 - x) / (1 - t), so a correctly-wired model+loss+sampler chain
must recover x1 — the strongest train->sample->recover proof available in a
sandbox with no published checkpoints.

The same trained parameters are then rolled out under the int8 W8A8 serving
mode (ops/quant.py), giving the serving path distribution-level (not just
per-kernel) fidelity evidence: both precisions must land on the target.

Mirrors tools/overfit_probe.py (the on-chip version of the same loop).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.flow import create_transport
from fitv2_tpu.flow.samplers import euler_sample
from fitv2_tpu.models.fit import FiT
from fitv2_tpu.train import (
    OptimizerConfig, create_train_state, make_optimizer, make_train_step,
)

pytestmark = pytest.mark.slow


def build_overfit_setup(seed=0, n_h=4, n_w=4, hidden=96, depth=2,
                        class_dropout_prob=0.0):
    """Shared by this test and tools/overfit_probe.py."""
    n_ctx = n_h * n_w
    model = FiT(context_size=n_ctx, patch_size=2, in_channels=4,
                hidden_size=hidden, depth=depth, num_heads=4, num_classes=10,
                class_dropout_prob=class_dropout_prob,
                learn_sigma=False, use_sit=True,
                use_swiglu=True, q_norm='layernorm', k_norm='layernorm',
                adaln_type='lora', adaln_lora_dim=24, max_cached_len=16)
    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))
    grid = np.stack([gw.reshape(-1), gh.reshape(-1)], 0)
    B = 8
    batch = {
        'feature': jnp.broadcast_to(
            jax.random.normal(jax.random.PRNGKey(seed), (1, n_ctx, 16)),
            (B, n_ctx, 16)),
        'grid': jnp.asarray(np.broadcast_to(grid, (B, 2, n_ctx)), jnp.int32),
        'mask': jnp.ones((B, n_ctx), jnp.float32),
        'label': jnp.full((B,), 3, jnp.int32),
        'size': jnp.asarray(
            np.broadcast_to(np.array([[n_h, n_w]]), (B, 1, 2)), jnp.int32),
    }
    return model, batch


def train_overfit(model, batch, steps=1500, lr=2e-3):
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        batch['feature'][:1], jnp.zeros((1,)), batch['label'][:1],
        batch['grid'][:1], batch['mask'][:1], batch['size'][:1],
        train=True)['params']
    # uniform t covers the [0, 1] path endpoints better than lognorm for a
    # point-mass target; the reference onesample script trains the same flow
    transport = create_transport('Linear', 'velocity', snr_type='uniform')
    tx = make_optimizer(OptimizerConfig(learning_rate=lr))
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(model, transport, tx), donate_argnums=0)
    rng = jax.random.PRNGKey(5)
    first = last = None
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        if i == 0:
            first = float(metrics['loss'])
    last = float(metrics['loss'])
    return state.params, first, last


def rollout(model, variables, batch, steps=50, key=7):
    n_ctx = batch['feature'].shape[1]
    y = batch['label'][:1]
    grid, size = batch['grid'][:1], batch['size'][:1]

    def model_fn(z, t):
        out = model.apply(variables, z, t, y, grid, None, size)
        return out.astype(jnp.float32)

    z0 = jax.random.normal(jax.random.PRNGKey(key), (1, n_ctx, 16))
    sigmas = jnp.linspace(0.0, 1.0, steps + 1)
    return np.asarray(jax.jit(
        lambda z: euler_sample(model_fn, z, sigmas))(z0))


def _rel_l2(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


def test_overfit_one_sample_recovers_target():
    model, batch = build_overfit_setup()
    target = np.asarray(batch['feature'][:1])

    params, loss_first, loss_last = train_overfit(model, batch)
    assert loss_last < 0.25 * loss_first, (loss_first, loss_last)

    out = rollout(model, {'params': params}, batch)
    err = _rel_l2(out, target)

    # control: untrained params do NOT land on the target
    rnd_params = model.init(
        {'params': jax.random.PRNGKey(99),
         'label_dropout': jax.random.PRNGKey(98)},
        batch['feature'][:1], jnp.zeros((1,)), batch['label'][:1],
        batch['grid'][:1], batch['mask'][:1], batch['size'][:1],
        train=True)['params']
    err_rnd = _rel_l2(rollout(model, {'params': rnd_params}, batch), target)

    psnr = 10 * np.log10(
        float(np.max(np.abs(target)) ** 2 /
              np.mean((out - target) ** 2)))
    print(f'overfit e2e: relL2 {err:.4f} (random-params control {err_rnd:.3f}),'
          f' PSNR {psnr:.1f} dB, loss {loss_first:.3f}->{loss_last:.4f}')
    assert err < 0.15, err
    assert err < 0.25 * err_rnd, (err, err_rnd)

    # ---- int8 W8A8 serving mode on the SAME trained params ---------------
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
          f'vs fp32 rollout {drift:.4f}')
    # distribution-level serving evidence: the int8 rollout lands on the
    # same target, and stays close to the fp32 trajectory endpoint
    assert err_q < 0.2, err_q
    assert drift < 0.1, drift

    # ---- velocity-extrapolated rollout on the SAME trained params --------
    # (flow/samplers.euler_sample_extrapolated, eval_every=2: half the model
    # calls). A TRAINED velocity field, not the random-weights bench model —
    # the honest fidelity evidence for the training-free NFE reduction.
    from fitv2_tpu.flow.samplers import euler_sample_extrapolated
    n_ctx = batch['feature'].shape[1]
    y1, g1, s1 = batch['label'][:1], batch['grid'][:1], batch['size'][:1]

    def model_fn(z, t):
        return model.apply({'params': params}, z, t, y1, g1, None,
                           s1).astype(jnp.float32)

    z0 = jax.random.normal(jax.random.PRNGKey(7), (1, n_ctx, 16))
    sigmas = jnp.linspace(0.0, 1.0, 51)
    out_x = np.asarray(jax.jit(lambda z: euler_sample_extrapolated(
        model_fn, z, sigmas, eval_every=2))(z0))
    err_x = _rel_l2(out_x, target)
    drift_x = _rel_l2(out_x, out)
    print(f'extrapolated (25-eval) rollout: relL2 vs target {err_x:.4f}, '
          f'vs dense endpoint {drift_x:.4f}')
    assert err_x < 0.2, err_x
    assert drift_x < 0.1, drift_x

    # order=2 (Newton quadratic): same 13-eval budget at eval_every=4,
    # must stay at least as close to the dense endpoint as order=1
    out1 = np.asarray(jax.jit(lambda z: euler_sample_extrapolated(
        model_fn, z, sigmas, eval_every=4, order=1))(z0))
    out2 = np.asarray(jax.jit(lambda z: euler_sample_extrapolated(
        model_fn, z, sigmas, eval_every=4, order=2))(z0))
    d1, d2 = _rel_l2(out1, out), _rel_l2(out2, out)
    print(f'eval_every=4 drift vs dense endpoint: order1 {d1:.4f}, '
          f'order2 {d2:.4f}')
    assert d2 < d1 * 1.1 + 1e-3, (d2, d1)
    assert _rel_l2(out2, target) < 0.25


def test_overfit_guidance_interval_recovers_target():
    """Trained-model evidence for the guidance-interval serving mode
    (SamplingConfig guidance_low/high): with class dropout the model learns
    the point-mass field under BOTH the conditional and null classes, so the
    full CFG pipeline and the interval pipeline (single conditional forward
    outside the [0.3, 0.9] window) must both land on the target — the same
    distribution-level check the int8/extrapolation modes get above."""
    from fitv2_tpu.sample.pipeline import SamplingConfig, build_sampler

    model, batch = build_overfit_setup(class_dropout_prob=0.15)
    target = np.asarray(batch['feature'][:1])
    tgt_px = np.asarray(model.unpatchify(
        jnp.asarray(target), (8, 8), channel_last=False))

    params, loss_first, loss_last = train_overfit(model, batch, steps=1800)
    assert loss_last < 0.3 * loss_first, (loss_first, loss_last)

    base = dict(image_height=64, image_width=64, num_sampling_steps=50,
                per_device_batch=1, num_classes=10, dtype=jnp.float32,
                cfg_scale=1.5)
    labels = batch['label'][:1]
    rng = jax.random.PRNGKey(21)

    dense = build_sampler(model, params, SamplingConfig(**base))
    out_d = np.asarray(dense(rng, labels))
    win = build_sampler(model, params, SamplingConfig(
        guidance_low=0.3, guidance_high=0.9, **base))
    out_w = np.asarray(win(rng, labels))

    err_d, err_w = _rel_l2(out_d, tgt_px), _rel_l2(out_w, tgt_px)
    drift = _rel_l2(out_w, out_d)
    print(f'interval-guidance overfit: dense-CFG relL2 {err_d:.4f}, '
          f'window[.3,.9] relL2 {err_w:.4f}, drift {drift:.4f}')
    assert err_d < 0.2, err_d
    assert err_w < 0.2, err_w
    assert drift < 0.1, drift

    # ---- composed serving mode: interval + velocity extrapolation --------
    # (the config bench.py's serving_max reports; sample/pipeline.py runs
    # each guidance phase as its own extrapolated scan with slope resets at
    # the phase boundaries). Same bar as each ingredient alone: lands on the
    # target, small drift from the dense-CFG endpoint.
    comp = build_sampler(model, params, SamplingConfig(
        guidance_low=0.3, guidance_high=0.9, velocity_eval_every=2,
        velocity_extrap_order=2, **base))
    out_c = np.asarray(comp(rng, labels))
    err_c = _rel_l2(out_c, tgt_px)
    drift_c = _rel_l2(out_c, out_d)
    print(f'composed win[.3,.9]+extrap2-o2: relL2 {err_c:.4f}, '
          f'drift vs dense {drift_c:.4f}')
    assert err_c < 0.2, err_c
    assert drift_c < 0.1, drift_c
