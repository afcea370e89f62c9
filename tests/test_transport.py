"""Transport / path parity vs reference goldens + sampler correctness."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitv2_tpu.flow import (
    GVPCPlan, ICPlan, VPCPlan, Sampler, cfg_model_fn, create_transport,
    euler_sample, masked_loss_ratio, mean_flat, ode_dopri5, ode_euler,
    ode_heun,
)
from fitv2_tpu.flow.transport import ModelType, PathType, SNRType

GOLD = np.load(os.path.join(os.path.dirname(__file__), 'goldens',
                            'transport.npz'))

PLANS = {'linear': ICPlan(), 'gvp': GVPCPlan(), 'vp': VPCPlan()}


@pytest.mark.parametrize('name', ['linear', 'gvp', 'vp'])
def test_plan_matches_reference(name):
    plan = PLANS[name]
    t = jnp.asarray(GOLD['t'])
    x0 = jnp.asarray(GOLD['x0'])
    x1 = jnp.asarray(GOLD['x1'])
    _, xt, ut = plan.plan(t, x0, x1)
    # vp's d_sigma involves exp() chains; fp32 ulp differences vs torch
    tol = 1e-5 if name != 'vp' else 5e-4
    np.testing.assert_allclose(np.asarray(xt), GOLD[f'xt_{name}'],
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(ut), GOLD[f'ut_{name}'],
                               rtol=tol, atol=tol)


@pytest.mark.parametrize('name', ['linear', 'gvp', 'vp'])
def test_masked_velocity_loss_matches_reference(name):
    plan = PLANS[name]
    t = jnp.asarray(GOLD['t'])
    _, _, ut = plan.plan(t, jnp.asarray(GOLD['x0']), jnp.asarray(GOLD['x1']))
    pred = jnp.asarray(GOLD['pred'])
    mask = jnp.asarray(GOLD['mask'])
    mask_b, ratio = masked_loss_ratio(mask, pred)
    loss = mean_flat(((pred - ut) * mask_b) ** 2) * ratio
    np.testing.assert_allclose(np.asarray(loss), GOLD[f'loss_{name}'],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('name', ['linear', 'gvp', 'vp'])
def test_score_from_velocity_matches_reference(name):
    plan = PLANS[name]
    sc = plan.get_score_from_velocity(
        jnp.asarray(GOLD['pred']), jnp.asarray(GOLD[f'xt_{name}']),
        jnp.asarray(GOLD['t']))
    np.testing.assert_allclose(np.asarray(sc), GOLD[f'score_from_v_{name}'],
                               rtol=1e-4, atol=1e-4)


def test_create_transport_defaults():
    tr = create_transport('Linear', 'velocity', snr_type='lognorm')
    assert tr.model_type == ModelType.VELOCITY
    assert tr.path_type == PathType.LINEAR
    assert tr.snr_type == SNRType.LOGNORM
    assert tr.train_eps == 0.0 and tr.sample_eps == 0.0
    tr_vp = create_transport('VP', 'velocity')
    assert tr_vp.train_eps == 1e-5 and tr_vp.sample_eps == 1e-3


def test_training_losses_velocity_known_model():
    """With a model that predicts exactly ut, the loss must be ~0."""
    tr = create_transport('Linear', 'velocity', snr_type='uniform')
    rng = jax.random.PRNGKey(0)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 4))

    captured = {}

    def perfect_model(xt, t):
        # invert: for linear path ut = x1 - x0 and xt = t x1 + (1-t) x0
        # => ut = (x1 - xt) / (1 - t)
        captured['t'] = t
        te = t.reshape(-1, 1, 1)
        return (x1 - xt) / (1 - te)

    out = tr.training_losses(rng, perfect_model, x1)
    assert out['loss'].shape == (4,)
    np.testing.assert_allclose(np.asarray(out['loss']),
                               np.zeros(4), atol=1e-7)


def test_training_losses_lognorm_t_in_range():
    tr = create_transport('Linear', 'velocity', snr_type='lognorm')
    t, x0, x1 = tr.sample(jax.random.PRNGKey(0),
                          jnp.zeros((512, 4, 4)))
    t = np.asarray(t)
    assert (t > 0).all() and (t < 1).all()
    # lognorm(0,1) median is 0.5; crude distribution check
    assert 0.4 < np.median(t) < 0.6


def test_euler_sample_linear_ode_exact():
    """dx/dt = c integrates exactly under Euler."""
    c = 3.0
    model = lambda x, t: jnp.full_like(x, c)
    x0 = jnp.zeros((2, 4))
    sig = jnp.linspace(0.0, 1.0, 11)
    out = euler_sample(model, x0, sig)
    np.testing.assert_allclose(np.asarray(out), np.full((2, 4), c), rtol=1e-6)


def test_ode_heun_quadratic():
    """dx/dt = t: Heun integrates polynomials of degree<=1 in f exactly."""
    model = lambda x, t: jnp.broadcast_to(t.reshape(-1, 1), x.shape)
    x0 = jnp.zeros((3, 5))
    out = ode_heun(model, x0, jnp.linspace(0., 1., 21))
    np.testing.assert_allclose(np.asarray(out), np.full((3, 5), 0.5),
                               rtol=1e-5)


def test_ode_dopri5_exponential():
    """dx/dt = x from x(0)=1 -> e at t=1, adaptive solver."""
    model = lambda x, t: x
    x0 = jnp.ones((2, 3))
    out = ode_dopri5(model, x0, 0.0, 1.0, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out), np.full((2, 3), np.e),
                               rtol=1e-4)


def test_adaptive_tableaus_consistent():
    """Butcher-tableau typo guards: A row sums = c; order conditions on
    both weight rows (catches any misremembered dopri8 numerator)."""
    from fitv2_tpu.flow.samplers import ADAPTIVE_TABLEAUS, check_tableau
    assert set(ADAPTIVE_TABLEAUS) == {'dopri8', 'bosh3', 'adaptive_heun'}
    for tab in ADAPTIVE_TABLEAUS.values():
        check_tableau(tab)


@pytest.mark.parametrize('method', ['dopri8', 'bosh3', 'adaptive_heun'])
def test_ode_adaptive_nonlinear(method):
    """dx/dt = x^2 from x(0)=0.5 has x(t) = 1/(2-t); every adaptive method
    must hit the analytic endpoint within its tolerance."""
    from fitv2_tpu.flow import ode_adaptive
    model = lambda x, t: x * x
    x0 = jnp.full((2, 3), 0.5)
    out = ode_adaptive(model, x0, 0.0, 1.0, method=method,
                       rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out), np.full((2, 3), 1.0),
                               rtol=5e-4)


def test_ode_adaptive_tolerance_scaling():
    """Tightening rtol must reduce the endpoint error (step control is
    live, not a fixed-step fallback)."""
    from fitv2_tpu.flow import ode_adaptive
    model = lambda x, t: jnp.sin(3.0 * x) + 1.0
    x0 = jnp.full((1, 4), 0.1)
    ref = ode_adaptive(model, x0, 0.0, 1.0, method='dopri8',
                       rtol=1e-9, atol=1e-12)
    errs = [float(jnp.max(jnp.abs(
        ode_adaptive(model, x0, 0.0, 1.0, method='bosh3',
                     rtol=r, atol=r * 1e-3) - ref)))
        for r in (1e-2, 1e-4, 1e-6)]
    assert errs[1] < errs[0] and errs[2] < errs[1], errs
    assert errs[2] < 1e-5, errs


@pytest.mark.parametrize('method,order', [('midpoint', 2), ('rk4', 4)])
def test_fixed_step_convergence_order(method, order):
    """Halving the step must shrink the error by ~2^order (measured order
    within 0.4 of nominal on a smooth nonlinear ODE)."""
    from fitv2_tpu.flow import ode_midpoint, ode_rk4
    fn = {'midpoint': ode_midpoint, 'rk4': ode_rk4}[method]
    model = lambda x, t: x * x  # x(t) = 1/(2-t) from x(0)=0.5
    x0 = jnp.full((1, 1), 0.5)
    errs = []
    # rk4 on finer grids bottoms out in fp32 rounding; keep errors >> eps
    for n in ((8, 16, 32) if method == 'midpoint' else (2, 4, 8)):
        out = fn(model, x0, jnp.linspace(0.0, 1.0, n + 1).astype(
            jnp.float64 if jax.config.jax_enable_x64 else jnp.float32))
        errs.append(abs(float(out[0, 0]) - 1.0))
    measured = np.log2(errs[0] / errs[2]) / 2.0
    assert abs(measured - order) < 0.4, (measured, errs)


def test_sample_ode_method_dispatch():
    """Sampler.sample_ode accepts the reference's torchdiffeq method list
    (integrators.py:109-116): adaptive + fixed-step names all run."""
    tr = create_transport('Linear', 'velocity')
    s = Sampler(tr)
    model = lambda x, t: jnp.ones_like(x)
    for method in ('dopri5', 'dopri8', 'bosh3', 'adaptive_heun', 'euler',
                   'heun', 'midpoint', 'rk4'):
        fn = s.sample_ode(sampling_method=method, num_steps=5)
        out = fn(jnp.zeros((2, 4)), model)
        np.testing.assert_allclose(np.asarray(out), np.ones((2, 4)),
                                   rtol=1e-4, err_msg=method)


def test_cfg_model_fn_mixing():
    def doubled(x, t):
        B = x.shape[0] // 2
        cond = jnp.ones_like(x[:B]) * 2.0
        uncond = jnp.ones_like(x[:B]) * 1.0
        return jnp.concatenate([cond, uncond], axis=0)

    fn = cfg_model_fn(doubled, cfg_scale=1.5)
    out = fn(jnp.zeros((2, 4, 4)), jnp.zeros((2,)))
    # uncond + 1.5 (cond - uncond) = 1 + 1.5 = 2.5
    np.testing.assert_allclose(np.asarray(out), np.full((2, 4, 4), 2.5))


def test_sampler_ode_sde_api():
    tr = create_transport('Linear', 'velocity')
    s = Sampler(tr)
    model = lambda x, t: jnp.ones_like(x)

    ode_fn = s.sample_ode(sampling_method='euler', num_steps=5)
    out = ode_fn(jnp.zeros((2, 4)), model)
    np.testing.assert_allclose(np.asarray(out), np.ones((2, 4)), rtol=1e-6)

    # SDE with SBDM diffusion needs eps>0 at t=0 (alpha ratio is 1/t; the
    # reference has the same constraint — transport.py:96-99 uses eps only
    # when it is nonzero, so SDE callers pass sample_eps explicitly)
    tr_sde = create_transport('Linear', 'velocity', sample_eps=1e-3)
    s_sde = Sampler(tr_sde)
    sde_fn = s_sde.sample_sde(sampling_method='Euler', num_steps=8,
                              last_step='Mean', last_step_size=0.04)
    out = sde_fn(jax.random.PRNGKey(0), jnp.zeros((2, 4)), model)
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_likelihood_gaussian():
    """For drift=0 (model predicts score that makes drift 0) the likelihood
    of the standard normal should be close to the analytic prior."""
    tr = create_transport('Linear', 'velocity')
    s = Sampler(tr)
    # velocity=0 => probability-flow drift 0 => z = x, logp = prior_logp(x)
    model = lambda x, t: jnp.zeros_like(x)
    fn = s.sample_ode_likelihood(num_steps=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6))
    logp, z = fn(jax.random.PRNGKey(1), x, model)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-5)
    expect = np.asarray(tr.prior_logp(x))
    np.testing.assert_allclose(np.asarray(logp), expect, rtol=1e-4)


def test_euler_extrapolated_beats_half_budget_euler():
    """euler_sample_extrapolated (training-free NFE reduction, PAPERS.md
    velocity-extrapolation family): with eval_every=2 it makes HALF the
    model calls of dense Euler but must land closer to the dense-Euler
    endpoint than plain Euler on the half-size ladder (the same model-call
    budget). Velocity field: a nonlinear t-dependent drift where linear
    extrapolation genuinely helps."""
    from fitv2_tpu.flow.samplers import euler_sample, euler_sample_extrapolated

    A = jax.random.normal(jax.random.PRNGKey(0), (6, 6)) * 0.4

    def model(x, t):
        tt = t.reshape(-1, *([1] * (x.ndim - 1)))
        return jnp.tanh(x @ A) * (1.0 + tt) + 0.3 * jnp.sin(3.0 * tt)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (3, 6))
    dense = euler_sample(model, x0, jnp.linspace(0.0, 1.0, 65))  # 64 evals
    ref = euler_sample(model, x0, jnp.linspace(0.0, 1.0, 513))   # near-exact

    extr = euler_sample_extrapolated(model, x0,
                                     jnp.linspace(0.0, 1.0, 65),
                                     eval_every=2)                # 32 evals
    half = euler_sample(model, x0, jnp.linspace(0.0, 1.0, 33))    # 32 evals

    def rel(a, b):
        return float(np.linalg.norm(np.asarray(a) - np.asarray(b))
                     / np.linalg.norm(np.asarray(b)))

    err_extr, err_half, err_dense = rel(extr, ref), rel(half, ref), rel(dense, ref)
    print(f'endpoint rel-L2 vs 512-step: dense64 {err_dense:.2e}, '
          f'extrapolated32 {err_extr:.2e}, euler32 {err_half:.2e}')
    assert np.isfinite(np.asarray(extr)).all()
    # same model-call budget: the extrapolated sampler must be strictly
    # more accurate than the coarse Euler ladder
    assert err_extr < err_half, (err_extr, err_half)
    # and within a small factor of the full-budget dense Euler
    assert err_extr < 4 * err_dense, (err_extr, err_dense)


def test_euler_extrapolated_eval_every_one_is_euler():
    """eval_every=1 degenerates to exact dense Euler (bitwise-close)."""
    from fitv2_tpu.flow.samplers import euler_sample, euler_sample_extrapolated

    def model(x, t):
        return -x * (0.5 + t.reshape(-1, 1))

    x0 = jax.random.normal(jax.random.PRNGKey(2), (2, 5))
    sig = jnp.linspace(0.0, 1.0, 17)
    a = euler_sample(model, x0, sig)
    b = euler_sample_extrapolated(model, x0, sig, eval_every=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_euler_extrapolated_descending_ladder():
    """Regression: on a monotonically DECREASING ladder (sigmas 1 -> 0),
    the extrapolation slope 1/dt must keep dt's sign — a signed clamp
    max(dt, 1e-8) turned negative dt into 1e-8 and amplified the velocity
    difference by ~1e8 (garbage latents, no error)."""
    from fitv2_tpu.flow.samplers import euler_sample, euler_sample_extrapolated

    def model(x, t):
        return -x * (0.5 + t.reshape(-1, 1))

    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 5))
    sig = jnp.linspace(1.0, 0.0, 65)
    dense = euler_sample(model, x0, sig)
    extr = euler_sample_extrapolated(model, x0, sig, eval_every=2)
    assert np.isfinite(np.asarray(extr)).all()
    rel = (np.linalg.norm(np.asarray(extr) - np.asarray(dense))
           / np.linalg.norm(np.asarray(dense)))
    assert rel < 0.05, rel


def test_euler_extrapolated_order2_beats_order1_on_curved_field():
    """order=2 (Newton quadratic through the last three eval velocities)
    must beat linear extrapolation on a field with genuine curvature in t,
    at the same model-call budget (eval_every=4), and still degenerate to
    dense Euler at eval_every=1."""
    from fitv2_tpu.flow.samplers import euler_sample, euler_sample_extrapolated

    A = jax.random.normal(jax.random.PRNGKey(0), (6, 6)) * 0.4

    def model(x, t):
        tt = t.reshape(-1, *([1] * (x.ndim - 1)))
        # quadratic + oscillatory t-dependence: linear-in-t extrapolation
        # has an O(dt^2) floor here, the quadratic does not
        return jnp.tanh(x @ A) * (1.0 + tt * tt) + 0.5 * jnp.cos(4.0 * tt)

    x0 = jax.random.normal(jax.random.PRNGKey(1), (3, 6))
    sig = jnp.linspace(0.0, 1.0, 65)
    ref = euler_sample(model, x0, jnp.linspace(0.0, 1.0, 513))

    def rel(a):
        return float(np.linalg.norm(np.asarray(a) - np.asarray(ref))
                     / np.linalg.norm(np.asarray(ref)))

    e1 = rel(euler_sample_extrapolated(model, x0, sig, eval_every=4,
                                       order=1))
    e2 = rel(euler_sample_extrapolated(model, x0, sig, eval_every=4,
                                       order=2))
    print(f'rel-L2 vs 512-step: order1 {e1:.2e}, order2 {e2:.2e}')
    assert e2 < e1, (e2, e1)

    # eval_every=1 degenerates to dense Euler regardless of order
    a = euler_sample(model, x0, jnp.linspace(0.0, 1.0, 17))
    b = euler_sample_extrapolated(model, x0, jnp.linspace(0.0, 1.0, 17),
                                  eval_every=1, order=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
