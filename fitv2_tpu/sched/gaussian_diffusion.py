"""Gaussian diffusion (IDDPM) for the FiTv1 epsilon-prediction path.

TPU-native reimplementation of the reference improved-diffusion stack
(/root/reference/fit/scheduler/improved_diffusion/gaussian_diffusion.py:144-860,
respace.py:65-130, timestep_sampler.py:27-149, __init__.py:10-47).

Design:
  - ``GaussianDiffusion`` holds precomputed numpy coefficient ladders
    (hashable via id; it is created once, outside jit) and exposes pure jnp
    methods that take explicit PRNG keys.
  - Sampling loops (``p_sample_loop`` / ``ddim_sample_loop``) are single
    ``lax.scan``s over the timestep ladder — one compiled step, no host sync.
  - Respacing (DDIM-style subsequences, "ddimN"/"N" strings) happens at
    ladder-construction time, mirroring SpacedDiffusion.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Callable, Dict, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]  # (x, t_int) -> model output


class ModelMeanType(enum.Enum):
    PREVIOUS_X = enum.auto()
    START_X = enum.auto()
    EPSILON = enum.auto()


class ModelVarType(enum.Enum):
    LEARNED = enum.auto()
    FIXED_SMALL = enum.auto()
    FIXED_LARGE = enum.auto()
    LEARNED_RANGE = enum.auto()


class LossType(enum.Enum):
    MSE = enum.auto()
    RESCALED_MSE = enum.auto()
    KL = enum.auto()
    RESCALED_KL = enum.auto()

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """'linear' (scaled DDPM) and 'squaredcos_cap_v2' cosine schedules."""
    if name == 'linear':
        scale = 1000 / num_steps
        return np.linspace(scale * 0.0001, scale * 0.02, num_steps,
                           dtype=np.float64)
    if name in ('cosine', 'squaredcos_cap_v2'):
        def acb(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = []
        for i in range(num_steps):
            betas.append(min(1 - acb((i + 1) / num_steps) / acb(i / num_steps),
                             0.999))
        return np.array(betas, dtype=np.float64)
    raise NotImplementedError(f'unknown beta schedule: {name}')


def space_timesteps(num_timesteps: int, section_counts) -> Set[int]:
    """Subsequence selection (reference respace.py:9-62 semantics).

    'ddimN' -> evenly strided N steps; 'N' or [n1,n2,...] -> per-section
    even spacing.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith('ddim'):
            desired = int(section_counts[len('ddim'):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f'cannot create exactly {desired} steps with '
                             'an integer stride')
        section_counts = [int(x) for x in section_counts.split(',')]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start = 0
    all_steps = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f'cannot divide section of {size} steps into '
                             f'{count}')
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        taken = []
        for _ in range(count):
            taken.append(start + round(cur))
            cur += stride
        all_steps += taken
        start += size
    return set(all_steps)


def _ext(arr: np.ndarray, t: Array, ndim: int) -> Array:
    """Gather coefficient ladder at integer t and broadcast to data rank."""
    out = jnp.asarray(arr, jnp.float32)[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi)
                                 * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of images discretized to [-1,1] 255-bin grid."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, 1e-12))))


def mean_flat(x: Array) -> Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


@dataclasses.dataclass(frozen=True, eq=False)
class GaussianDiffusion:
    """Coefficient ladders + pure sampling/training math.

    ``timestep_map`` is non-empty when the ladder was respaced; model calls
    remap the compact index to the original training timestep (respace.py's
    _WrappedModel equivalent).
    """
    betas: np.ndarray
    model_mean_type: ModelMeanType = ModelMeanType.EPSILON
    model_var_type: ModelVarType = ModelVarType.LEARNED_RANGE
    loss_type: LossType = LossType.MSE
    timestep_map: Optional[np.ndarray] = None
    original_num_steps: Optional[int] = None

    def __post_init__(self):
        betas = np.asarray(self.betas, np.float64)
        assert (betas > 0).all() and (betas <= 1).all()
        n = betas.shape[0]
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        ac_next = np.append(ac[1:], 0.0)
        post_var = betas * (1.0 - ac_prev) / (1.0 - ac)
        object.__setattr__(self, 'num_timesteps', n)
        c = {
            'alphas_cumprod': ac,
            'alphas_cumprod_prev': ac_prev,
            'alphas_cumprod_next': ac_next,
            'sqrt_alphas_cumprod': np.sqrt(ac),
            'sqrt_one_minus_alphas_cumprod': np.sqrt(1.0 - ac),
            'log_one_minus_alphas_cumprod': np.log(1.0 - ac),
            'sqrt_recip_alphas_cumprod': np.sqrt(1.0 / ac),
            'sqrt_recipm1_alphas_cumprod': np.sqrt(1.0 / ac - 1),
            'posterior_variance': post_var,
            'posterior_log_variance_clipped': np.log(
                np.append(post_var[1], post_var[1:])),
            'posterior_mean_coef1': betas * np.sqrt(ac_prev) / (1.0 - ac),
            'posterior_mean_coef2': (1.0 - ac_prev) * np.sqrt(alphas)
                                    / (1.0 - ac),
            'betas64': betas,
        }
        object.__setattr__(self, '_c', c)

    # -- model-call indirection for respaced ladders -------------------------
    def _model_t(self, t: Array) -> Array:
        if self.timestep_map is None:
            return t
        return jnp.asarray(self.timestep_map, jnp.int32)[t]

    # -- forward process -----------------------------------------------------
    def q_mean_variance(self, x_start, t):
        c = self._c
        mean = _ext(c['sqrt_alphas_cumprod'], t, x_start.ndim) * x_start
        var = _ext(1.0 - c['alphas_cumprod'], t, x_start.ndim)
        logvar = _ext(c['log_one_minus_alphas_cumprod'], t, x_start.ndim)
        return mean, var, logvar

    def q_sample(self, rng, x_start, t, noise=None):
        if noise is None:
            noise = jax.random.normal(rng, x_start.shape, x_start.dtype)
        c = self._c
        return (_ext(c['sqrt_alphas_cumprod'], t, x_start.ndim) * x_start
                + _ext(c['sqrt_one_minus_alphas_cumprod'], t, x_start.ndim)
                * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        c = self._c
        mean = (_ext(c['posterior_mean_coef1'], t, x_t.ndim) * x_start
                + _ext(c['posterior_mean_coef2'], t, x_t.ndim) * x_t)
        var = _ext(c['posterior_variance'], t, x_t.ndim)
        logvar = _ext(c['posterior_log_variance_clipped'], t, x_t.ndim)
        return mean, var, logvar

    # -- x0 / eps conversions --------------------------------------------------
    def _predict_xstart_from_eps(self, x_t, t, eps):
        c = self._c
        return (_ext(c['sqrt_recip_alphas_cumprod'], t, x_t.ndim) * x_t
                - _ext(c['sqrt_recipm1_alphas_cumprod'], t, x_t.ndim) * eps)

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        c = self._c
        c1 = _ext(1.0 / c['posterior_mean_coef1'], t, x_t.ndim)
        c2 = _ext(c['posterior_mean_coef2'] / c['posterior_mean_coef1'], t,
                  x_t.ndim)
        return c1 * xprev - c2 * x_t

    def _predict_eps_from_xstart(self, x_t, t, pred_xstart):
        c = self._c
        return ((_ext(c['sqrt_recip_alphas_cumprod'], t, x_t.ndim) * x_t
                 - pred_xstart)
                / _ext(c['sqrt_recipm1_alphas_cumprod'], t, x_t.ndim))

    # -- reverse process --------------------------------------------------------
    def p_mean_variance(self, model_fn: ModelFn, x, t, clip_denoised=True,
                        denoised_fn=None) -> Dict[str, Array]:
        c = self._c
        B = x.shape[0]
        model_output = model_fn(x, self._model_t(t))

        if self.model_var_type in (ModelVarType.LEARNED,
                                   ModelVarType.LEARNED_RANGE):
            C = x.shape[-1]
            assert model_output.shape[-1] == 2 * C, (
                f'learned-sigma model must output 2C channels, got '
                f'{model_output.shape}')
            model_output, model_var_values = jnp.split(model_output, 2, -1)
            if self.model_var_type == ModelVarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = _ext(c['posterior_log_variance_clipped'], t, x.ndim)
                max_log = _ext(np.log(c['betas64']), t, x.ndim)
                frac = (model_var_values + 1) / 2
                model_log_variance = frac * max_log + (1 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        else:
            if self.model_var_type == ModelVarType.FIXED_LARGE:
                var = np.append(c['posterior_variance'][1], c['betas64'][1:])
                logvar = np.log(var)
            else:
                var = c['posterior_variance']
                logvar = c['posterior_log_variance_clipped']
            model_variance = _ext(var, t, x.ndim)
            model_log_variance = _ext(logvar, t, x.ndim)

        def process_xstart(xs):
            if denoised_fn is not None:
                xs = denoised_fn(xs)
            if clip_denoised:
                xs = jnp.clip(xs, -1, 1)
            return xs

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            pred_xstart = process_xstart(
                self._predict_xstart_from_xprev(x, t, model_output))
            model_mean = model_output
        elif self.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        else:  # EPSILON
            pred_xstart = process_xstart(
                self._predict_xstart_from_eps(x, t, model_output))
            model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)

        return {'mean': model_mean, 'variance': model_variance,
                'log_variance': model_log_variance,
                'pred_xstart': pred_xstart}

    def p_sample(self, rng, model_fn, x, t, clip_denoised=True,
                 denoised_fn=None):
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t != 0).astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        sample = out['mean'] + nonzero * jnp.exp(
            0.5 * out['log_variance']) * noise
        return {'sample': sample, 'pred_xstart': out['pred_xstart']}

    def p_sample_loop(self, rng, model_fn, shape, noise=None,
                      clip_denoised=True, denoised_fn=None) -> Array:
        """Ancestral sampling as one lax.scan over descending t."""
        k_init, k_loop = jax.random.split(rng)
        x = noise if noise is not None else jax.random.normal(
            k_init, shape, jnp.float32)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(k_loop, self.num_timesteps)

        def step(z, inp):
            t_i, key = inp
            t_vec = jnp.full((shape[0],), t_i, jnp.int32)
            out = self.p_sample(key, model_fn, z, t_vec, clip_denoised,
                                denoised_fn)
            return out['sample'], None

        x, _ = jax.lax.scan(step, x, (ts, keys))
        return x

    def ddim_sample(self, rng, model_fn, x, t, clip_denoised=True,
                    denoised_fn=None, eta=0.0):
        c = self._c
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn)
        eps = self._predict_eps_from_xstart(x, t, out['pred_xstart'])
        alpha_bar = _ext(c['alphas_cumprod'], t, x.ndim)
        alpha_bar_prev = _ext(c['alphas_cumprod_prev'], t, x.ndim)
        sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                 * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
        noise = jax.random.normal(rng, x.shape, x.dtype)
        mean_pred = (out['pred_xstart'] * jnp.sqrt(alpha_bar_prev)
                     + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps)
        nonzero = (t != 0).astype(x.dtype).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        sample = mean_pred + nonzero * sigma * noise
        return {'sample': sample, 'pred_xstart': out['pred_xstart']}

    def ddim_sample_loop(self, rng, model_fn, shape, noise=None,
                         clip_denoised=True, denoised_fn=None,
                         eta=0.0) -> Array:
        k_init, k_loop = jax.random.split(rng)
        x = noise if noise is not None else jax.random.normal(
            k_init, shape, jnp.float32)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(k_loop, self.num_timesteps)

        def step(z, inp):
            t_i, key = inp
            t_vec = jnp.full((shape[0],), t_i, jnp.int32)
            out = self.ddim_sample(key, model_fn, z, t_vec, clip_denoised,
                                   denoised_fn, eta)
            return out['sample'], None

        x, _ = jax.lax.scan(step, x, (ts, keys))
        return x

    # -- training -----------------------------------------------------------------
    def _vb_terms_bpd(self, model_fn, x_start, x_t, t, clip_denoised=True):
        true_mean, _, true_logvar = self.q_posterior_mean_variance(
            x_start, x_t, t)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised)
        kl = normal_kl(true_mean, true_logvar, out['mean'],
                       out['log_variance'])
        kl = mean_flat(kl) / math.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out['mean'], log_scales=0.5 * out['log_variance'])
        decoder_nll = mean_flat(decoder_nll) / math.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {'output': output, 'pred_xstart': out['pred_xstart']}

    def training_losses(self, rng, model_fn: ModelFn, x_start, t,
                        mask: Optional[Array] = None,
                        noise: Optional[Array] = None) -> Dict[str, Array]:
        """MSE / VB losses at integer timesteps t.

        Supports the padded-token mask reweight used by the FiT trainer
        (mask (B, N); loss scaled by N/nnz as in transport/utils.py:41-60).
        """
        k_noise, _ = jax.random.split(rng)
        if noise is None:
            noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_t = self.q_sample(None, x_start, t, noise=noise)

        if mask is not None:
            mask_b = mask[..., None].astype(x_start.dtype)
            ratio = mask.shape[-1] / jnp.count_nonzero(
                mask, axis=-1).astype(jnp.float32)
        else:
            mask_b, ratio = 1.0, 1.0

        terms: Dict[str, Array] = {}
        if self.loss_type.is_vb():
            terms['loss'] = self._vb_terms_bpd(model_fn, x_start, x_t, t,
                                               clip_denoised=False)['output']
            if self.loss_type == LossType.RESCALED_KL:
                terms['loss'] = terms['loss'] * self.num_timesteps
        else:
            model_output = model_fn(x_t, self._model_t(t))
            if self.model_var_type in (ModelVarType.LEARNED,
                                       ModelVarType.LEARNED_RANGE):
                C = x_t.shape[-1]
                model_output, model_var_values = jnp.split(model_output, 2, -1)
                # vb on variance with frozen mean (stop_gradient)
                frozen_out = jnp.concatenate(
                    [jax.lax.stop_gradient(model_output), model_var_values],
                    axis=-1)
                terms['vb'] = self._vb_terms_bpd(
                    lambda *a: frozen_out, x_start, x_t, t,
                    clip_denoised=False)['output']
                if self.loss_type == LossType.RESCALED_MSE:
                    terms['vb'] = terms['vb'] * self.num_timesteps / 1000.0
            target = {
                ModelMeanType.PREVIOUS_X: self.q_posterior_mean_variance(
                    x_start, x_t, t)[0],
                ModelMeanType.START_X: x_start,
                ModelMeanType.EPSILON: noise,
            }[self.model_mean_type]
            terms['mse'] = mean_flat(
                ((target - model_output) * mask_b) ** 2) * ratio
            terms['loss'] = terms['mse'] + terms.get('vb', 0.0)
        return terms


def create_diffusion(timestep_respacing: str = '',
                     noise_schedule: str = 'linear',
                     use_kl: bool = False,
                     sigma_small: bool = False,
                     predict_xstart: bool = False,
                     learn_sigma: bool = True,
                     rescale_learned_sigmas: bool = False,
                     diffusion_steps: int = 1000) -> GaussianDiffusion:
    """Factory with reference defaults (improved_diffusion/__init__.py:10-47)."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if not timestep_respacing:
        timestep_respacing = [diffusion_steps]

    use_steps = sorted(space_timesteps(diffusion_steps, timestep_respacing))
    if len(use_steps) == diffusion_steps:
        timestep_map = None
        new_betas = betas
    else:
        # recompute betas for the subsequence (respace.py:81-97 semantics)
        ac = np.cumprod(1.0 - betas)
        last = 1.0
        new_betas, tmap = [], []
        for i, a in enumerate(ac):
            if i in use_steps:
                new_betas.append(1 - a / last)
                last = a
                tmap.append(i)
        new_betas = np.array(new_betas)
        timestep_map = np.array(tmap, np.int32)

    return GaussianDiffusion(
        betas=new_betas,
        model_mean_type=(ModelMeanType.EPSILON if not predict_xstart
                         else ModelMeanType.START_X),
        model_var_type=(
            (ModelVarType.FIXED_LARGE if not sigma_small
             else ModelVarType.FIXED_SMALL)
            if not learn_sigma else ModelVarType.LEARNED_RANGE),
        loss_type=loss_type,
        timestep_map=timestep_map,
        original_num_steps=diffusion_steps)
