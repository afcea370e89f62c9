"""Coupling-path plans for flow matching (ICPlan / GVP / VP).

TPU-native reimplementation of the reference path algebra
(/root/reference/fit/scheduler/transport/path.py:18-192): alpha_t / sigma_t
coefficients and their derivatives along the probability path
x_t = alpha_t * x1 + sigma_t * x0, plus drift/diffusion for the SDE view and
velocity <-> score <-> noise conversions.

Design: each plan is a frozen dataclass of scalars with pure-jnp methods, so
a plan object is hashable and can be closed over by jitted functions freely
(no tensors are held on the object).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def expand_t_like_x(t: Array, x: Array) -> Array:
    """Reshape (B,) time to broadcast against (B, ...) data."""
    return jnp.reshape(t, t.shape[:1] + (1,) * (x.ndim - 1))


@dataclasses.dataclass(frozen=True)
class ICPlan:
    """Linear coupling: alpha_t = t, sigma_t = 1 - t (reference path.py:18-136)."""
    sigma: float = 0.0

    # --- coefficients ------------------------------------------------------
    def compute_alpha_t(self, t: Array) -> Tuple[Array, Array]:
        return t, jnp.ones_like(t)

    def compute_sigma_t(self, t: Array) -> Tuple[Array, Array]:
        return 1.0 - t, -jnp.ones_like(t)

    def compute_d_alpha_alpha_ratio_t(self, t: Array) -> Array:
        return 1.0 / t

    # --- SDE view ----------------------------------------------------------
    def compute_drift(self, x: Array, t: Array) -> Tuple[Array, Array]:
        """Score-parametrized SDE drift: returns (-drift_mean, drift_var)."""
        t = expand_t_like_x(t, x)
        alpha_ratio = self.compute_d_alpha_alpha_ratio_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        drift = alpha_ratio * x
        diffusion = alpha_ratio * (sigma_t ** 2) - sigma_t * d_sigma_t
        return -drift, diffusion

    def compute_diffusion(self, x: Array, t: Array, form: str = 'constant',
                          norm: float = 1.0) -> Array:
        t = expand_t_like_x(t, x)
        if form == 'constant':
            return jnp.asarray(norm, x.dtype) * jnp.ones_like(t)
        if form == 'SBDM':
            return norm * self.compute_drift(x, t)[1]
        if form == 'sigma':
            return norm * self.compute_sigma_t(t)[0]
        if form == 'linear':
            return norm * (1.0 - t)
        if form == 'decreasing':
            return 0.25 * (norm * jnp.cos(jnp.pi * t) + 1.0) ** 2
        if form == 'increasing-decreasing':
            return norm * jnp.sin(jnp.pi * t) ** 2
        raise NotImplementedError(f'Diffusion form {form!r} not implemented')

    # --- prediction-type conversions ----------------------------------------
    def get_score_from_velocity(self, velocity: Array, x: Array, t: Array) -> Array:
        t = expand_t_like_x(t, x)
        alpha_t, d_alpha_t = self.compute_alpha_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = sigma_t ** 2 - reverse_alpha_ratio * d_sigma_t * sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def get_noise_from_velocity(self, velocity: Array, x: Array, t: Array) -> Array:
        t = expand_t_like_x(t, x)
        alpha_t, d_alpha_t = self.compute_alpha_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = reverse_alpha_ratio * d_sigma_t - sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def get_velocity_from_score(self, score: Array, x: Array, t: Array) -> Array:
        drift, var = self.compute_drift(x, t)
        return var * score - drift

    # --- path construction ---------------------------------------------------
    def compute_mu_t(self, t: Array, x0: Array, x1: Array) -> Array:
        t = expand_t_like_x(t, x1)
        alpha_t, _ = self.compute_alpha_t(t)
        sigma_t, _ = self.compute_sigma_t(t)
        return alpha_t * x1 + sigma_t * x0

    def compute_xt(self, t: Array, x0: Array, x1: Array) -> Array:
        return self.compute_mu_t(t, x0, x1)

    def compute_ut(self, t: Array, x0: Array, x1: Array, xt: Array) -> Array:
        t = expand_t_like_x(t, x1)
        _, d_alpha_t = self.compute_alpha_t(t)
        _, d_sigma_t = self.compute_sigma_t(t)
        return d_alpha_t * x1 + d_sigma_t * x0

    def plan(self, t: Array, x0: Array, x1: Array):
        xt = self.compute_xt(t, x0, x1)
        ut = self.compute_ut(t, x0, x1, xt)
        return t, xt, ut


@dataclasses.dataclass(frozen=True)
class VPCPlan(ICPlan):
    """Variance-preserving path (reference path.py:139-171)."""
    sigma_min: float = 0.1
    sigma_max: float = 20.0

    def log_mean_coeff(self, t: Array) -> Array:
        return (-0.25 * ((1 - t) ** 2) * (self.sigma_max - self.sigma_min)
                - 0.5 * (1 - t) * self.sigma_min)

    def d_log_mean_coeff(self, t: Array) -> Array:
        return (0.5 * (1 - t) * (self.sigma_max - self.sigma_min)
                + 0.5 * self.sigma_min)

    def compute_alpha_t(self, t):
        alpha_t = jnp.exp(self.log_mean_coeff(t))
        return alpha_t, alpha_t * self.d_log_mean_coeff(t)

    def compute_sigma_t(self, t):
        p_sigma_t = 2 * self.log_mean_coeff(t)
        sigma_t = jnp.sqrt(1 - jnp.exp(p_sigma_t))
        d_sigma_t = jnp.exp(p_sigma_t) * (2 * self.d_log_mean_coeff(t)) / (-2 * sigma_t)
        return sigma_t, d_sigma_t

    def compute_d_alpha_alpha_ratio_t(self, t):
        return self.d_log_mean_coeff(t)

    def compute_drift(self, x, t):
        t = expand_t_like_x(t, x)
        beta_t = self.sigma_min + (1 - t) * (self.sigma_max - self.sigma_min)
        return -0.5 * beta_t * x, beta_t / 2


@dataclasses.dataclass(frozen=True)
class GVPCPlan(ICPlan):
    """Generalized VP: trig path (reference path.py:174-192)."""

    def compute_alpha_t(self, t):
        return jnp.sin(t * math.pi / 2), math.pi / 2 * jnp.cos(t * math.pi / 2)

    def compute_sigma_t(self, t):
        return jnp.cos(t * math.pi / 2), -math.pi / 2 * jnp.sin(t * math.pi / 2)

    def compute_d_alpha_alpha_ratio_t(self, t):
        return math.pi / (2 * jnp.tan(t * math.pi / 2))
