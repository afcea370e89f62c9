"""Respaced improved-diffusion golden: sched/gaussian_diffusion.py vs a
fully independent float64 numpy implementation (tools/gen_goldens.py
gen_ddpm) of the IDDPM math — linear schedule, subsequence betas,
learned-range variance, eps->x0, eta=0 DDIM update. Anchors the FiTv1
sampling path (reference sample_fit_ddp.py:160-183 via respace.py) to
something that shares no code with the implementation under test.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from fitv2_tpu.sched.gaussian_diffusion import create_diffusion

GOLD = os.path.join(os.path.dirname(__file__), 'goldens', 'ddpm.npz')


def _analytic_model(T):
    """Identical formula to tools/gen_goldens._ddpm_analytic_model."""
    def model_fn(x, t_orig):
        tt = (t_orig.astype(jnp.float32) / T)[:, None, None]
        lin = jnp.linspace(-1.0, 1.0, x.shape[-1])
        eps = 0.1 * x * jnp.cos(3.0 * tt) + 0.05 * jnp.sin(5.0 * tt + lin)
        var_raw = jnp.tanh(0.1 * x + lin * tt)
        return jnp.concatenate([eps, var_raw], axis=-1)
    return model_fn


def _diffusion(g):
    return create_diffusion(timestep_respacing=str(int(g['n_resp'])),
                            noise_schedule='linear', learn_sigma=True,
                            diffusion_steps=int(g['T']))


def test_respacing_map_matches_independent_selection():
    g = np.load(GOLD)
    d = _diffusion(g)
    np.testing.assert_array_equal(np.asarray(d.timestep_map),
                                  g['tmap'].astype(np.int32))


def test_ddim_rollout_matches_numpy_golden():
    g = np.load(GOLD)
    d = _diffusion(g)
    model_fn = _analytic_model(int(g['T']))
    x_init = jnp.asarray(g['x_init'], jnp.float32)
    out = jax.jit(lambda z: d.ddim_sample_loop(
        jax.random.PRNGKey(0), model_fn, z.shape, noise=z,
        clip_denoised=False))(x_init)
    np.testing.assert_allclose(np.asarray(out), g['x_final'],
                               rtol=2e-4, atol=2e-5)


def test_p_mean_variance_matches_numpy_golden():
    g = np.load(GOLD)
    d = _diffusion(g)
    model_fn = _analytic_model(int(g['T']))
    x = jnp.asarray(g['x_init'], jnp.float32)
    t = jnp.full((x.shape[0],), int(g['pmv_t']), jnp.int32)
    out = d.p_mean_variance(model_fn, x, t, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(out['mean']), g['pmv_mean'],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out['log_variance']),
                               g['pmv_logvar'], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out['pred_xstart']),
                               g['pmv_pred_xstart'], rtol=2e-4, atol=2e-5)
