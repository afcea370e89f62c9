"""Scheduler tests: flow-match sigma ladders + IDDPM round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitv2_tpu.sched import (
    FlowMatchEulerConfig, GaussianDiffusion, create_diffusion, euler_step,
    get_named_beta_schedule, linear_sigmas, set_timesteps, space_timesteps,
)
from fitv2_tpu.sched.gaussian_diffusion import ModelMeanType, ModelVarType


# -- flow match ----------------------------------------------------------------

def test_invert_sigmas_ascending_ladder():
    """FiTv2 sampling convention: t runs 0 -> 1 (sample_fitv2_ddp.py:115)."""
    cfg = FlowMatchEulerConfig(invert_sigmas=True)
    ts, sig = set_timesteps(cfg, 250)
    assert sig.shape == (251,)
    assert sig[0] == 0.0 and sig[-1] == 1.0
    assert (np.diff(sig) > 0).all()


def test_default_ladder_descending():
    cfg = FlowMatchEulerConfig()
    ts, sig = set_timesteps(cfg, 50)
    assert sig[-1] == 0.0
    assert (np.diff(sig) < 0).all()
    assert ts.shape == (50,)


def test_shift_changes_midpoint():
    cfg1 = FlowMatchEulerConfig(shift=1.0)
    cfg3 = FlowMatchEulerConfig(shift=3.0)
    _, s1 = set_timesteps(cfg1, 10)
    _, s3 = set_timesteps(cfg3, 10)
    # shift>1 pushes sigmas towards 1 (more time at high noise)
    assert s3[5] > s1[5]


def test_karras_ladder_monotone():
    cfg = FlowMatchEulerConfig(use_karras_sigmas=True)
    _, sig = set_timesteps(cfg, 30)
    assert (np.diff(sig[:-1]) < 0).all()


def test_euler_step_deterministic():
    x = jnp.ones((2, 4))
    v = jnp.full((2, 4), 2.0)
    out = euler_step(x, v, jnp.float32(0.2), jnp.float32(0.3))
    np.testing.assert_allclose(np.asarray(out), 1.0 + 0.1 * 2.0, rtol=1e-6)


def test_euler_step_stochastic():
    import jax
    x = jnp.zeros((2, 4))
    v = jnp.ones((2, 4))
    out = euler_step(x, v, jnp.float32(0.3), jnp.float32(0.4),
                     stochastic=True, rng=jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # deterministic given the key
    out2 = euler_step(x, v, jnp.float32(0.3), jnp.float32(0.4),
                      stochastic=True, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_calculate_shift_and_time_shift():
    from fitv2_tpu.sched import calculate_shift, time_shift
    mu_base = calculate_shift(256)
    mu_max = calculate_shift(4096)
    np.testing.assert_allclose(mu_base, 0.5, rtol=1e-6)
    np.testing.assert_allclose(mu_max, 1.15, rtol=1e-6)
    # time_shift(0-mu) is identity-like at mu=0: exp(0)/(exp(0)+(1/t-1))
    t = np.array([0.25, 0.5, 0.75])
    np.testing.assert_allclose(time_shift(0.0, 1.0, t), t, rtol=1e-6)
    # positive mu pushes sigmas toward 1
    assert (time_shift(1.0, 1.0, t) > t).all()


def test_linear_sigmas():
    s = linear_sigmas(250)
    assert s.shape == (251,)
    assert s[0] == 0.0 and s[-1] == 1.0


# -- IDDPM ----------------------------------------------------------------------

def test_space_timesteps_ddim():
    s = space_timesteps(1000, 'ddim50')
    assert len(s) == 50
    s = space_timesteps(1000, '100')
    assert len(s) == 100


def test_beta_schedules():
    for name in ('linear', 'squaredcos_cap_v2'):
        b = get_named_beta_schedule(name, 1000)
        assert b.shape == (1000,)
        assert (b > 0).all() and (b <= 1).all()


def test_q_sample_snr_endpoints():
    diff = create_diffusion(learn_sigma=False, diffusion_steps=100)
    x = jnp.ones((2, 8, 4))
    noise = jnp.zeros_like(x)
    # at t=0 x_t ~ x_start (minimal noise mixed in)
    xt0 = diff.q_sample(None, x, jnp.zeros((2,), jnp.int32), noise=noise)
    np.testing.assert_allclose(np.asarray(xt0), np.asarray(x), rtol=1e-2)
    # at t=T-1 the signal coefficient is tiny
    xtT = diff.q_sample(None, x, jnp.full((2,), 99, jnp.int32), noise=noise)
    assert np.abs(np.asarray(xtT)).max() < 0.2


def test_eps_xstart_roundtrip():
    diff = create_diffusion(learn_sigma=False, diffusion_steps=100)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    t = jnp.array([10, 70])
    xt = diff.q_sample(None, x0, t, noise=eps)
    x0_rec = diff._predict_xstart_from_eps(xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                               rtol=1e-4, atol=1e-4)
    eps_rec = diff._predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps),
                               rtol=1e-4, atol=1e-4)


def test_training_losses_perfect_eps_model():
    diff = create_diffusion(learn_sigma=False, diffusion_steps=100)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 4))
    t = jnp.array([3, 30, 60, 99])
    model_fn = lambda x, tt: eps  # the exact noise
    out = diff.training_losses(rng, model_fn, x0, t, noise=eps)
    np.testing.assert_allclose(np.asarray(out['loss']), np.zeros(4),
                               atol=1e-10)


def test_learned_sigma_channel_split():
    diff = create_diffusion(learn_sigma=True, diffusion_steps=50)
    assert diff.model_var_type == ModelVarType.LEARNED_RANGE
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))
    model_fn = lambda z, t: jnp.concatenate([jnp.zeros_like(z),
                                             jnp.zeros_like(z)], -1)
    out = diff.p_mean_variance(model_fn, x, jnp.array([5, 20]))
    assert out['mean'].shape == x.shape
    assert out['pred_xstart'].shape == x.shape


def test_respaced_ddim_loop_runs():
    diff = create_diffusion(timestep_respacing='ddim10', learn_sigma=False,
                            diffusion_steps=100)
    assert diff.num_timesteps == 10
    assert diff.timestep_map is not None
    seen_ts = []
    def model_fn(z, t):
        return jnp.zeros_like(z)
    out = diff.ddim_sample_loop(jax.random.PRNGKey(0), model_fn, (2, 8, 4))
    assert out.shape == (2, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_p_sample_loop_variance_contracts():
    """Sampling with eps=0 predictions pulls x towards posterior means.

    diffusion_steps must keep beta_T < 1 (the scaled-linear schedule hits
    beta_T=1.0 at 20 steps, which makes 1/alpha_cumprod inf — true of the
    reference too)."""
    diff = create_diffusion(learn_sigma=False, diffusion_steps=100)
    model_fn = lambda z, t: jnp.zeros_like(z)
    out = diff.p_sample_loop(jax.random.PRNGKey(0), model_fn, (4, 16, 4))
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-5  # clip_denoised
