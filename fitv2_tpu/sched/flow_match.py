"""Flow-matching Euler discrete scheduler: sigma ladders + step rule.

TPU-native equivalent of the vendored diffusers FlowMatchEulerDiscreteScheduler
(/root/reference/flow_match_scheduler.py:47-477). The reference object is a
stateful torch scheduler; here it is a pure function library plus a small
frozen config — ladders are built host-side with numpy once per sampling run
(shapes are static), and the Euler step is a pure jnp function usable inside
``lax.scan``.

Supports: dynamic time shifting (time_shift, :213), base shift (`shift`),
``use_karras_sigmas`` / ``use_exponential_sigmas`` / ``use_beta_sigmas``
ladders (:276-300 equivalents), ``invert_sigmas`` (:305-312 — used by
sample_fitv2_ddp.py:115 to get an ascending 0->1 ladder), and
``stochastic_sampling`` in the step rule (:360-380).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerConfig:
    num_train_timesteps: int = 1000
    shift: float = 1.0
    use_dynamic_shifting: bool = False
    base_shift: float = 0.5
    max_shift: float = 1.15
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096
    invert_sigmas: bool = False
    shift_terminal: Optional[float] = None
    use_karras_sigmas: bool = False
    use_exponential_sigmas: bool = False
    use_beta_sigmas: bool = False
    stochastic_sampling: bool = False


def time_shift(mu: float, sigma: float, t: np.ndarray) -> np.ndarray:
    """Dynamic shifting: exp(mu) / (exp(mu) + (1/t - 1)^sigma) (ref :213-215)."""
    return math.exp(mu) / (math.exp(mu) + (1 / t - 1) ** sigma)


def calculate_shift(image_seq_len: int, base_seq_len: int = 256,
                    max_seq_len: int = 4096, base_shift: float = 0.5,
                    max_shift: float = 1.15) -> float:
    """Resolution-dependent mu for dynamic shifting (diffusers convention)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def _stretch_shift_to_terminal(sigmas: np.ndarray, terminal: float) -> np.ndarray:
    """Stretch so the last sigma hits ``terminal`` (ref shift_terminal logic)."""
    one_minus = 1 - sigmas
    scale = one_minus[-1] / (1 - terminal)
    return 1 - one_minus / scale


def karras_sigmas(sigmas: np.ndarray, num_steps: int, rho: float = 7.0
                  ) -> np.ndarray:
    sigma_min, sigma_max = float(sigmas[-1]), float(sigmas[0])
    ramp = np.linspace(0, 1, num_steps)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho


def exponential_sigmas(sigmas: np.ndarray, num_steps: int) -> np.ndarray:
    sigma_min, sigma_max = float(sigmas[-1]), float(sigmas[0])
    return np.exp(np.linspace(math.log(sigma_max), math.log(sigma_min),
                              num_steps))


def beta_sigmas(sigmas: np.ndarray, num_steps: int, alpha: float = 0.6,
                beta: float = 0.6) -> np.ndarray:
    """Beta-distribution-spaced ladder (arXiv 2407.12173 convention)."""
    try:
        import scipy.stats
    except ImportError as e:  # pragma: no cover
        raise ImportError('use_beta_sigmas requires scipy') from e
    sigma_min, sigma_max = float(sigmas[-1]), float(sigmas[0])
    ppfs = scipy.stats.beta.ppf(1 - np.linspace(0, 1, num_steps), alpha, beta)
    return np.array([sigma_min + p * (sigma_max - sigma_min) for p in ppfs])


def set_timesteps(cfg: FlowMatchEulerConfig, num_inference_steps: int,
                  mu: Optional[float] = None,
                  sigmas: Optional[np.ndarray] = None,
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Build (timesteps, sigmas) ladders; sigmas has a trailing terminal entry.

    Mirrors reference set_timesteps (:237-319): descending 1->~0 by default,
    or ascending when ``invert_sigmas`` (FiTv2's convention — t runs 0->1 and
    the model consumes t directly).
    """
    if cfg.use_dynamic_shifting and mu is None:
        raise ValueError('dynamic shifting requires mu')
    if sigmas is None:
        sigmas = np.linspace(1.0, 1.0 / cfg.num_train_timesteps,
                             num_inference_steps)
    if cfg.use_dynamic_shifting:
        sigmas = time_shift(mu, 1.0, sigmas)
    else:
        sigmas = cfg.shift * sigmas / (1 + (cfg.shift - 1) * sigmas)
    if cfg.shift_terminal is not None:
        sigmas = _stretch_shift_to_terminal(sigmas, cfg.shift_terminal)
    if cfg.use_karras_sigmas:
        sigmas = karras_sigmas(sigmas, num_inference_steps)
    elif cfg.use_exponential_sigmas:
        sigmas = exponential_sigmas(sigmas, num_inference_steps)
    elif cfg.use_beta_sigmas:
        sigmas = beta_sigmas(sigmas, num_inference_steps)

    timesteps = sigmas * cfg.num_train_timesteps
    if cfg.invert_sigmas:
        sigmas = 1.0 - sigmas
        timesteps = sigmas * cfg.num_train_timesteps
        sigmas = np.concatenate([sigmas, [1.0]])
    else:
        sigmas = np.concatenate([sigmas, [0.0]])
    return timesteps.astype(np.float32), sigmas.astype(np.float32)


def euler_step(x: Array, model_output: Array, sigma: Array, sigma_next: Array,
               *, stochastic: bool = False,
               rng: Optional[jax.Array] = None) -> Array:
    """One flow-match Euler update (reference step :321-392).

    Deterministic: x + (sigma_next - sigma) * v.
    Stochastic variant renoises to the next sigma level via x0-prediction.
    """
    x32 = x.astype(jnp.float32)
    v = model_output.astype(jnp.float32)
    if stochastic:
        assert rng is not None, 'stochastic sampling needs rng'
        noise = jax.random.normal(rng, x.shape, jnp.float32)
        x0_pred = x32 + (1.0 - sigma) * v  # terminal prediction at sigma=1
        out = sigma_next * noise + (1.0 - sigma_next) * x0_pred
        # NOTE: with invert_sigmas (t: 0->1) "noise level" is 1 - sigma.
    else:
        out = x32 + (sigma_next - sigma) * v
    return out.astype(x.dtype)


def linear_sigmas(num_steps: int) -> np.ndarray:
    """The sample_fitv2_ddp.py:263 ladder: linspace(0, 1, steps+1)."""
    return np.linspace(0.0, 1.0, num_steps + 1, dtype=np.float32)
