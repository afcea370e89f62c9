"""Closed-loop LwD generative correctness without external weights.

Port of the reference's OWN overfit recipe — an LwD script
(/root/reference/train_fitv2_lwd_onesample.py) — completing what
tests/test_overfit_e2e.py proves for the plain FM path (round-3 VERDICT
"What's missing" #4): train all K perflow segments of a small FiTLwD on a
SINGLE latent with reflow interpolant targets (train/lwd_train_step.py),
then the sequential segment samplers must recover that latent from fresh
noise:

  - `sample` (per-segment Euler, reference forward :285-357)
  - `sample_cfg` (CFG double batch, reference forward_cfg :418-495)
  - `sample_maruyama_cfg` with a guidance window (reference
    fit_model_lwd_bk.py:1297-1404) — SDE, so a looser bound
  - the SAME trained params under the int8 W8A8 serving mode (ops/quant.py)

For a point-mass target the optimal segment velocity is the straight
interpolant slope, so a correctly-wired segment-train/segment-sample chain
must land on x1. A random-init control proves the recovery is learned.

Mirrors tools/lwd_overfit_probe.py (the on-chip run of the same loop).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit_lwd import FiTLwD
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.train import (
    OptimizerConfig, create_train_state, make_optimizer,
)
from fitv2_tpu.train.lwd_train_step import SegmentSampler, make_lwd_train_step

pytestmark = pytest.mark.slow

K = 3


def build_lwd_overfit_setup(seed=0, hidden=96, depth=3):
    """Shared by this test and tools/lwd_overfit_probe.py."""
    model = FiTLwD(
        context_size=16, patch_size=2, in_channels=4, hidden_size=hidden,
        depth=depth, num_heads=4, num_classes=10, class_dropout_prob=0.1,
        number_of_perflow=K, n_patch_h=4, n_patch_w=4,
        adaln_type='lora', adaln_lora_dim=24, max_cached_len=8)
    B = 8
    grid, mask, size = make_grid_mask_size(B, 4, 4, 16)
    x1 = jax.random.normal(jax.random.PRNGKey(seed), (1, 16, 16))
    batch = {'feature': jnp.broadcast_to(x1, (B, 16, 16)),
             'grid': grid, 'mask': mask,
             'label': jnp.full((B,), 3, jnp.int32), 'size': size}
    return model, batch


def init_lwd_params(model, batch, seed=1):
    return model.init(
        {'params': jax.random.PRNGKey(seed),
         'label_dropout': jax.random.PRNGKey(seed + 1)},
        batch['feature'][:1], jnp.zeros((1,)), batch['label'][:1],
        batch['grid'][:1], batch['mask'][:1], batch['size'][:1])['params']


def train_lwd_overfit(model, batch, steps=5000, lr=1.5e-3, seed=5,
                      log=None):
    params = init_lwd_params(model, batch)
    tx = make_optimizer(OptimizerConfig(learning_rate=lr))
    state = create_train_state(params, tx)
    # ema_decay 0.99 (~100-step horizon): per-step segment training is
    # noisy near convergence; recovery is asserted on the EMA weights —
    # the reference's published artifact is also the EMA (model_ema
    # checkpoints, README.md:54)
    step_fn = jax.jit(make_lwd_train_step(model, tx, ema_decay=0.99),
                      static_argnums=3, donate_argnums=0)
    seg = SegmentSampler(K, seed=0)
    rng = jax.random.PRNGKey(seed)
    first = last = None
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub, seg())
        if i == 0:
            first = float(metrics['loss'])
        if log and i % 400 == 0:
            log(i, float(metrics['loss']))
    last = float(metrics['loss'])
    return state, first, last


def rel_l2(x, target):
    x = np.asarray(x, np.float64)
    t = np.asarray(target, np.float64)
    return float(np.linalg.norm(x - t) / np.linalg.norm(t))


def test_lwd_overfit_recovers_target():
    model, batch = build_lwd_overfit_setup()
    target = np.asarray(batch['feature'][0])
    state, first, last = train_lwd_overfit(model, batch)
    assert last < 0.5 * first, (first, last)
    ema = state.ema_params

    z0 = jax.random.normal(jax.random.PRNGKey(9), (4, 16, 16))
    y = jnp.full((4,), 3, jnp.int32)

    # plain sequential segment sampler
    out = jax.jit(lambda p, z: model.apply(
        {'params': p}, z, y, 8, method=model.sample))(ema, z0)
    r_plain = max(rel_l2(out[i], target) for i in range(4))
    assert r_plain < 0.15, r_plain

    # CFG double-batch segment sampler (dropout-trained null class)
    out_cfg = jax.jit(lambda p, z: model.apply(
        {'params': p}, z, y, 1.4, 8, method=model.sample_cfg))(ema, z0)
    r_cfg = max(rel_l2(out_cfg[i], target) for i in range(4))
    assert r_cfg < 0.25, r_cfg

    # windowed Maruyama SDE sampler (reference guidance_low/high semantics)
    out_mar = jax.jit(lambda p, r, z: model.apply(
        {'params': p}, r, z, y, 1.4, 8, guidance_low=0.3, guidance_high=0.9,
        method=model.sample_maruyama_cfg))(ema, jax.random.PRNGKey(11), z0)
    r_mar = max(rel_l2(out_mar[i], target) for i in range(4))
    assert r_mar < 0.4, r_mar  # SDE adds noise until the last sub-step

    # control: fresh random params must NOT recover the target
    ctrl_params = init_lwd_params(model, batch, seed=33)
    out_ctrl = jax.jit(lambda p, z: model.apply(
        {'params': p}, z, y, 8, method=model.sample))(ctrl_params, z0)
    r_ctrl = min(rel_l2(out_ctrl[i], target) for i in range(4))
    assert r_ctrl > 2.0 * r_plain, (r_ctrl, r_plain)

    # int8 W8A8 serving: the SAME trained params quantized must land on the
    # same point (distribution-level serving fidelity for the LwD family)
    from fitv2_tpu.ops.quant import (calibrate_quant_scales,
                                     prequantize_weights)
    m_q = model.clone(gemm_precision='int8')
    cal_args = (batch['feature'][:4], jnp.full((4,), 0.5),
                batch['label'][:4], batch['grid'][:4], batch['mask'][:4],
                batch['size'][:4])
    rngs = {'label_dropout': jax.random.PRNGKey(21)}
    coll = {
        'quant_calib': calibrate_quant_scales(m_q, ema, [cal_args],
                                              rngs=rngs),
        'quant_weights': prequantize_weights(m_q, ema, cal_args, rngs=rngs),
    }
    out_q = jax.jit(lambda p, z: m_q.apply(
        {'params': p, **coll}, z, y, 8, method=m_q.sample))(ema, z0)
    r_q = max(rel_l2(out_q[i], target) for i in range(4))
    drift = rel_l2(out_q, out)
    assert r_q < 0.25, r_q
    assert drift < 0.1, drift
