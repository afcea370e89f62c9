"""Fused bias + activation (+gain, clamp) — StyleGAN bias_act parity.

TPU-native equivalent of the reference CUDA plugin
(/root/reference/torch_utils/ops/bias_act.{cpp,cu} + bias_act.py:23-212).
The 9-activation table (bias_act.py:23-33) with default alpha/gain is
reproduced; the op is a single jnp expression that XLA fuses into one
elementwise kernel (the CUDA plugin existed to do exactly that fusion by
hand), fully differentiable to any order via JAX autodiff — the reference's
hand-written 2nd-order grads (bias_act.cu) are unnecessary here.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_SQRT2 = math.sqrt(2.0)

# name -> (fn(x, alpha), default_alpha, default_gain)
ACTIVATION_FUNCS = {
    'linear':   (lambda x, a: x,                          0.0, 1.0),
    'relu':     (lambda x, a: jax.nn.relu(x),             0.0, _SQRT2),
    'lrelu':    (lambda x, a: jax.nn.leaky_relu(x, a),    0.2, _SQRT2),
    'tanh':     (lambda x, a: jnp.tanh(x),                0.0, 1.0),
    'sigmoid':  (lambda x, a: jax.nn.sigmoid(x),          0.0, 1.0),
    'elu':      (lambda x, a: jax.nn.elu(x),              0.0, 1.0),
    'selu':     (lambda x, a: jax.nn.selu(x),             0.0, 1.0),
    'softplus': (lambda x, a: jax.nn.softplus(x),         0.0, 1.0),
    'swish':    (lambda x, a: jax.nn.silu(x),             0.0, _SQRT2),
}


def bias_act(x: Array, b: Optional[Array] = None, *, dim: int = 1,
             act: str = 'linear', alpha: Optional[float] = None,
             gain: Optional[float] = None,
             clamp: Optional[float] = None) -> Array:
    """y = clamp(gain * act(x + b), +-clamp) (reference bias_act.py:57-120).

    b broadcasts along ``dim`` (channel axis). clamp<0 means no clamp
    (reference convention); clamp=None likewise.
    """
    if act not in ACTIVATION_FUNCS:
        raise ValueError(f'unknown activation {act!r}')
    fn, def_alpha, def_gain = ACTIVATION_FUNCS[act]
    alpha = def_alpha if alpha is None else float(alpha)
    gain = def_gain if gain is None else float(gain)

    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[dim], (b.shape, x.shape)
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape)
    y = fn(x, alpha)
    if gain != 1.0:
        y = y * gain
    if clamp is not None and clamp >= 0:
        y = jnp.clip(y, -clamp, clamp)
    return y
