"""Flow-matching transport: training losses + drift/score wrappers.

TPU-native reimplementation of the SiT transport layer
(/root/reference/fit/scheduler/transport/transport.py:44-233). Differences by
design:
  - ``Transport`` is a frozen dataclass of static config, hashable, safe to
    close over inside jit. All randomness flows through explicit PRNG keys.
  - ``training_losses(rng, model_fn, x1, mask=...)`` is pure: the model is a
    callable ``model_fn(xt, t) -> pred`` closure (params bound by the caller's
    train step), so the same Transport serves any model family.
  - The masked / pad-ratio loss (reference transport.py:152-157,
    utils.py:41-60) is computed in fp32.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fitv2_tpu.flow import path as path_lib
from fitv2_tpu.flow.path import expand_t_like_x

Array = jax.Array


class ModelType(enum.Enum):
    NOISE = enum.auto()
    SCORE = enum.auto()
    VELOCITY = enum.auto()


class PathType(enum.Enum):
    LINEAR = enum.auto()
    GVP = enum.auto()
    VP = enum.auto()


class WeightType(enum.Enum):
    NONE = enum.auto()
    VELOCITY = enum.auto()
    LIKELIHOOD = enum.auto()


class SNRType(enum.Enum):
    UNIFORM = enum.auto()
    LOGNORM = enum.auto()


_PATHS = {
    PathType.LINEAR: path_lib.ICPlan,
    PathType.GVP: path_lib.GVPCPlan,
    PathType.VP: path_lib.VPCPlan,
}


def mean_flat(x: Array) -> Array:
    """Mean over all non-batch dims (reference transport/utils.py:12-16)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def masked_loss_ratio(mask: Optional[Array], x: Array
                      ) -> Tuple[Array, Array]:
    """Pad-mask and N/nnz reweight (reference transport/utils.py:41-60).

    mask: (B, N) 0/1 over tokens or None. Returns (mask_b, ratio) where
    mask_b broadcasts against x (B, N, C) and ratio is (B,).
    """
    if mask is None:
        return jnp.ones((), x.dtype), jnp.ones((x.shape[0],), jnp.float32)
    ratio = mask.shape[-1] / jnp.count_nonzero(mask, axis=-1).astype(jnp.float32)
    return mask[..., None].astype(x.dtype), ratio


@dataclasses.dataclass(frozen=True)
class Transport:
    """Static flow-matching config (reference transport.py:44-110)."""
    model_type: ModelType = ModelType.VELOCITY
    path_type: PathType = PathType.LINEAR
    loss_type: WeightType = WeightType.NONE
    train_eps: float = 0.0
    sample_eps: float = 0.0
    snr_type: SNRType = SNRType.UNIFORM

    @property
    def path_sampler(self) -> path_lib.ICPlan:
        return _PATHS[self.path_type]()

    # -- integration interval (reference transport.py:81-106) ---------------
    def check_interval(self, train_eps: float, sample_eps: float, *,
                       diffusion_form: str = 'SBDM', sde: bool = False,
                       reverse: bool = False, eval: bool = False,
                       last_step_size: float = 0.0) -> Tuple[float, float]:
        t0, t1 = 0.0, 1.0
        eps = train_eps if not eval else sample_eps
        if self.path_type == PathType.VP:
            t1 = 1 - eps if (not sde or last_step_size == 0) else 1 - last_step_size
        elif self.model_type != ModelType.VELOCITY or sde:
            t0 = eps if (diffusion_form == 'SBDM' and sde) \
                or self.model_type != ModelType.VELOCITY else 0
            t1 = 1 - eps if (not sde or last_step_size == 0) else 1 - last_step_size
        if reverse:
            t0, t1 = 1 - t0, 1 - t1
        return t0, t1

    # -- t / x0 sampling (reference transport.py:108-130) -------------------
    def sample(self, rng: jax.Array, x1: Array) -> Tuple[Array, Array, Array]:
        k_t, k_x0 = jax.random.split(rng)
        x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
        t0, t1 = self.check_interval(self.train_eps, self.sample_eps)
        if self.snr_type == SNRType.UNIFORM:
            t = jax.random.uniform(k_t, (x1.shape[0],)) * (t1 - t0) + t0
        elif self.snr_type == SNRType.LOGNORM:
            u = jax.random.normal(k_t, (x1.shape[0],))
            t = jax.nn.sigmoid(u) * (t1 - t0) + t0
        else:
            raise ValueError(f'Unknown snr type: {self.snr_type}')
        return t.astype(x1.dtype), x0, x1

    # -- training loss (reference transport.py:132-175) ---------------------
    def training_losses(self, rng: jax.Array,
                        model_fn: Callable[[Array, Array], Array],
                        x1: Array, mask: Optional[Array] = None,
                        ) -> Dict[str, Array]:
        """Masked flow-matching loss.

        model_fn: (xt, t) -> prediction closure with all conditioning bound.
        mask: (B, N) token-validity mask for padded sequences or None.
        Returns {'loss': (B,), 'pred': model output, 't': t}.
        """
        plan = self.path_sampler
        t, x0, x1 = self.sample(rng, x1)
        t, xt, ut = plan.plan(t, x0, x1)
        pred = model_fn(xt, t)
        assert pred.shape == xt.shape, (pred.shape, xt.shape)
        mask_b, ratio = masked_loss_ratio(mask, x1)

        p32 = pred.astype(jnp.float32)
        if self.model_type == ModelType.VELOCITY:
            err = (p32 - ut.astype(jnp.float32)) * mask_b
            loss = mean_flat(err ** 2) * ratio
        else:
            _, drift_var = plan.compute_drift(xt, t)
            sigma_t, _ = plan.compute_sigma_t(expand_t_like_x(t, xt))
            if self.loss_type == WeightType.VELOCITY:
                weight = (drift_var / sigma_t) ** 2
            elif self.loss_type == WeightType.LIKELIHOOD:
                weight = drift_var / (sigma_t ** 2)
            else:
                weight = 1.0
            if self.model_type == ModelType.NOISE:
                err = (p32 - x0.astype(jnp.float32)) * mask_b
            else:  # SCORE
                err = (p32 * sigma_t + x0.astype(jnp.float32)) * mask_b
            loss = mean_flat(weight * err ** 2) * ratio
        return {'loss': loss, 'pred': pred, 't': t}

    # -- drift / score wrappers (reference transport.py:178-227) ------------
    def get_drift(self) -> Callable:
        """Probability-flow-ODE drift: (x, t, model_fn) -> dx/dt."""
        plan = self.path_sampler

        def score_ode(x, t, model_fn):
            drift_mean, drift_var = plan.compute_drift(x, t)
            return -drift_mean + drift_var * model_fn(x, t)

        def noise_ode(x, t, model_fn):
            drift_mean, drift_var = plan.compute_drift(x, t)
            sigma_t, _ = plan.compute_sigma_t(expand_t_like_x(t, x))
            score = model_fn(x, t) / -sigma_t
            return -drift_mean + drift_var * score

        def velocity_ode(x, t, model_fn):
            return model_fn(x, t)

        return {ModelType.NOISE: noise_ode, ModelType.SCORE: score_ode,
                ModelType.VELOCITY: velocity_ode}[self.model_type]

    def get_score(self) -> Callable:
        """Score of x_t: (x, t, model_fn) -> grad log p_t(x)."""
        plan = self.path_sampler
        if self.model_type == ModelType.NOISE:
            return lambda x, t, m: m(x, t) / -plan.compute_sigma_t(
                expand_t_like_x(t, x))[0]
        if self.model_type == ModelType.SCORE:
            return lambda x, t, m: m(x, t)
        return lambda x, t, m: plan.get_score_from_velocity(m(x, t), x, t)

    def prior_logp(self, z: Array) -> Array:
        """log N(z; 0, I) per sample (reference transport.py:69-76)."""
        import numpy as np
        shape = z.shape
        n = float(np.prod(shape[1:]))
        z32 = z.astype(jnp.float32).reshape(shape[0], -1)
        return -n / 2.0 * jnp.log(2 * jnp.pi) - jnp.sum(z32 ** 2, -1) / 2.0


def create_transport(path_type: str = 'Linear', prediction: str = 'velocity',
                     loss_weight: Optional[str] = None,
                     train_eps: Optional[float] = None,
                     sample_eps: Optional[float] = None,
                     snr_type: str = 'uniform') -> Transport:
    """Reference-API factory (reference transport/__init__.py:3-72)."""
    model_type = {'noise': ModelType.NOISE, 'score': ModelType.SCORE}.get(
        prediction, ModelType.VELOCITY)
    loss_type = {'velocity': WeightType.VELOCITY,
                 'likelihood': WeightType.LIKELIHOOD}.get(
        loss_weight, WeightType.NONE)
    if snr_type not in ('lognorm', 'uniform'):
        raise ValueError(f'Invalid snr type {snr_type}')
    snr = SNRType.LOGNORM if snr_type == 'lognorm' else SNRType.UNIFORM
    ptype = {'Linear': PathType.LINEAR, 'GVP': PathType.GVP,
             'VP': PathType.VP}[path_type]

    if ptype == PathType.VP:
        train_eps = 1e-5 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    elif model_type != ModelType.VELOCITY:
        train_eps = 1e-3 if train_eps is None else train_eps
        sample_eps = 1e-3 if sample_eps is None else sample_eps
    else:
        train_eps = 0.0 if train_eps is None else train_eps
        sample_eps = 0.0 if sample_eps is None else sample_eps

    return Transport(model_type=model_type, path_type=ptype,
                     loss_type=loss_type, train_eps=train_eps,
                     sample_eps=sample_eps, snr_type=snr)
