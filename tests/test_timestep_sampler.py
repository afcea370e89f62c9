"""IDDPM schedule samplers: uniform, loss-second-moment importance."""

import numpy as np
import pytest

from fitv2_tpu.sched import (
    LossSecondMomentResampler, UniformSampler, create_named_schedule_sampler,
)


def test_uniform_sampler_unit_weights():
    s = UniformSampler(100)
    rng = np.random.default_rng(0)
    t, w = s.sample(64, rng)
    assert t.shape == (64,) and w.shape == (64,)
    assert ((0 <= t) & (t < 100)).all()
    np.testing.assert_allclose(w, 1.0)


def test_factory():
    assert isinstance(create_named_schedule_sampler('uniform', 10),
                      UniformSampler)
    assert isinstance(
        create_named_schedule_sampler('loss-second-moment', 10),
        LossSecondMomentResampler)
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler('nope', 10)


def test_resampler_uniform_until_warm():
    s = LossSecondMomentResampler(10, history_per_term=3)
    np.testing.assert_allclose(s.weights(), 1.0)
    # warm every term except t=9 -> still uniform
    for _ in range(3):
        s.update_with_all_losses(np.arange(9), np.ones(9))
    np.testing.assert_allclose(s.weights(), 1.0)
    for _ in range(3):
        s.update_with_all_losses(np.array([9]), np.array([1.0]))
    assert not np.allclose(s.weights(), 1.0)  # now a distribution


def test_resampler_prefers_high_loss_timesteps():
    s = LossSecondMomentResampler(4, history_per_term=2, uniform_prob=0.0)
    # t=0 has loss 10, others loss 1
    for _ in range(2):
        s.update_with_all_losses(np.arange(4),
                                 np.array([10.0, 1.0, 1.0, 1.0]))
    w = s.weights()
    np.testing.assert_allclose(w.sum(), 1.0)
    np.testing.assert_allclose(w[0] / w[1], 10.0, rtol=1e-6)

    rng = np.random.default_rng(0)
    t, iw = s.sample(4000, rng)
    frac0 = (t == 0).mean()
    assert 0.7 < frac0 < 0.85  # p(0) = 10/13 ~ 0.769
    # importance weights keep the estimator unbiased: w_t = 1/(T p_t)
    np.testing.assert_allclose(iw[t == 0], 1.0 / (4 * w[0]), rtol=1e-6)


def test_resampler_ring_buffer_drops_oldest():
    s = LossSecondMomentResampler(2, history_per_term=2, uniform_prob=0.0)
    s.update_with_all_losses(np.array([0, 0]), np.array([100.0, 100.0]))
    s.update_with_all_losses(np.array([1, 1]), np.array([1.0, 1.0]))
    # overwrite t=0's history with small losses -> weights even out
    s.update_with_all_losses(np.array([0, 0]), np.array([1.0, 1.0]))
    w = s.weights()
    np.testing.assert_allclose(w[0], w[1])


def test_ddpm_step_accepts_importance_batch():
    import jax
    import jax.numpy as jnp
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.sched import create_diffusion
    from fitv2_tpu.train.ddpm_train_step import make_ddpm_train_step
    from fitv2_tpu.train.train_step import (
        OptimizerConfig, create_train_state, make_optimizer)

    model = FiT(context_size=16, patch_size=2, in_channels=4, hidden_size=32,
                depth=2, num_heads=2, num_classes=10, learn_sigma=True,
                use_sit=False, use_swiglu=False, max_cached_len=8)
    diffusion = create_diffusion(learn_sigma=True, diffusion_steps=50)
    B = 4
    grid, mask, size = make_grid_mask_size(B, 4, 4, 16)
    sampler = LossSecondMomentResampler(50, history_per_term=2)
    rng = np.random.default_rng(0)
    t_np, w_np = sampler.sample(B, rng)
    batch = {
        'feature': jax.random.normal(jax.random.PRNGKey(0), (B, 16, 16)),
        'grid': grid, 'mask': mask,
        'label': (jnp.arange(B) % 10).astype(jnp.int32), 'size': size,
        't': jnp.asarray(t_np), 't_weight': jnp.asarray(w_np),
    }
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        batch['feature'][:1], jnp.zeros((1,)), batch['label'][:1],
        grid[:1], mask[:1], size[:1], train=True)['params']
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3))
    state = create_train_state(params, tx)
    step = jax.jit(make_ddpm_train_step(model, diffusion, tx))
    state, m = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m['loss']))
    np.testing.assert_array_equal(np.asarray(m['t']), t_np)
    # feed the realized per-timestep losses back into the resampler
    sampler.update_with_all_losses(np.asarray(m['t']),
                                   np.asarray(m['per_t_loss']))
    assert sampler._counts.sum() == B
