"""CAME optimizer (Confidence-guided Adaptive Memory-Efficient optimization).

The reference optionally trains with came_pytorch's CAME
(/root/reference/train_fitv2.py:43, 351-356; betas (0.9, 0.999, 0.9999),
eps (1e-30, 1e-16)). This is an optax implementation matching the
came_pytorch update step-for-step (Luo et al., ACL 2023):

  v_t  = b2 v_{t-1} + (1-b2) (g^2 + eps1)   (factored row/col, Adafactor-style)
  u_t  = g * rsqrt_approx(v_t)
  u_t  = u_t / max(1, RMS(u_t) / clip)       (RMS clipping of the update)
  m_t  = b1 m_{t-1} + (1-b1) u_t             (EMA of the CLIPPED update)
  res  = (u_t - m_t)^2 + eps2                (instability after the m update)
  s_t  = b3 s_{t-1} + (1-b3) res             (factored)
  step = rsqrt_approx(s_t) * m_t             (confidence-guided; factored only)
  step = m_t                                 (<2D params: plain momentum)
  p   -= lr * step + lr * wd * p             (weight decay scaled by lr)

For 2D+ parameters second moments are factored (row/col means); 1D
parameters use an unfactored accumulator and skip the confidence scaling,
exactly as came_pytorch does.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class _CameFactorState(NamedTuple):
    m: Any       # EMA of the clipped normalized update
    r_row: Any   # factored second moment of g^2 (rows)
    r_col: Any
    s_row: Any   # factored instability (rows); unused for <2D
    s_col: Any
    r_full: Any  # unfactored second moment for <2D params


def _factored(shape) -> bool:
    return len(shape) >= 2


def _approx_rsqrt(row, col, ):
    """came_pytorch _approx_sq_grad: rank-1 approximation of 1/sqrt(v)."""
    r_factor = jax.lax.rsqrt(
        row / jnp.mean(row, axis=-1, keepdims=True))[..., :, None]
    c_factor = jax.lax.rsqrt(col)[..., None, :]
    return r_factor * c_factor


def scale_by_came(b1: float = 0.9, b2: float = 0.999, b3: float = 0.9999,
                  eps1: float = 1e-30, eps2: float = 1e-16,
                  clip_threshold: float = 1.0) -> optax.GradientTransformation:
    """Core CAME statistics; emits updates in gradient sense (un-negated)."""

    def init_fn(params):
        def per_leaf(p):
            if _factored(p.shape):
                return _CameFactorState(
                    m=jnp.zeros_like(p, jnp.float32),
                    r_row=jnp.zeros(p.shape[:-1], jnp.float32),
                    r_col=jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
                    s_row=jnp.zeros(p.shape[:-1], jnp.float32),
                    s_col=jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
                    r_full=jnp.zeros((), jnp.float32))
            return _CameFactorState(
                m=jnp.zeros_like(p, jnp.float32),
                r_row=jnp.zeros((), jnp.float32),
                r_col=jnp.zeros((), jnp.float32),
                s_row=jnp.zeros((), jnp.float32),
                s_col=jnp.zeros((), jnp.float32),
                r_full=jnp.zeros_like(p, jnp.float32))
        return jax.tree_util.tree_map(per_leaf, params)

    def update_fn(grads, state, params=None):
        del params

        def per_leaf(g, s: _CameFactorState):
            g32 = g.astype(jnp.float32)
            gsq = g32 * g32 + eps1
            if _factored(g.shape):
                r_row = b2 * s.r_row + (1 - b2) * jnp.mean(gsq, axis=-1)
                r_col = b2 * s.r_col + (1 - b2) * jnp.mean(gsq, axis=-2)
                u = _approx_rsqrt(r_row, r_col) * g32
                r_full = s.r_full
            else:
                r_full = b2 * s.r_full + (1 - b2) * gsq
                u = g32 * jax.lax.rsqrt(r_full)
                r_row, r_col = s.r_row, s.r_col
            # RMS clipping of the normalized update (came_pytorch _rms)
            rms = jnp.sqrt(jnp.mean(u * u))
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            # momentum of the clipped update, THEN instability vs it
            m = b1 * s.m + (1 - b1) * u
            if _factored(g.shape):
                res = (u - m) ** 2 + eps2
                s_row = b3 * s.s_row + (1 - b3) * jnp.mean(res, axis=-1)
                s_col = b3 * s.s_col + (1 - b3) * jnp.mean(res, axis=-2)
                update = _approx_rsqrt(s_row, s_col) * m
            else:
                s_row, s_col = s.s_row, s.s_col
                update = m  # came_pytorch uses plain exp_avg for <2D params
            new_state = _CameFactorState(m=m, r_row=r_row, r_col=r_col,
                                         s_row=s_row, s_col=s_col,
                                         r_full=r_full)
            return update.astype(g.dtype), new_state

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat_s = tdef.flatten_up_to(state)
        outs = [per_leaf(g, s) for g, s in zip(flat_g, flat_s)]
        updates = tdef.unflatten([o[0] for o in outs])
        new_state = tdef.unflatten([o[1] for o in outs])
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def came(learning_rate, b1: float = 0.9, b2: float = 0.999,
         b3: float = 0.9999, eps1: float = 1e-30, eps2: float = 1e-16,
         weight_decay: float = 0.0,
         clip_threshold: float = 1.0) -> optax.GradientTransformation:
    """CAME with lr scaling and lr-scaled weight decay (came_pytorch order)."""
    chain = [scale_by_came(b1, b2, b3, eps1, eps2, clip_threshold)]
    if weight_decay > 0:
        # decayed weights join the update BEFORE lr scaling -> effective
        # decay is lr*wd, matching came_pytorch p.add_(p, alpha=-wd*lr)
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
