"""CAME optimizer (Confidence-guided Adaptive Memory-Efficient optimization).

The reference optionally trains with came_pytorch's CAME
(/root/reference/train_fitv2.py:43, 351-356; config comments reference
betas (0.9, 0.999, 0.9999), eps (1e-30, 1e-16)). This is an optax
implementation of the published algorithm (Luo et al., ACL 2023):

  m_t   = b1 m_{t-1} + (1-b1) g
  r_t   = b2 r_{t-1} + (1-b2) (g^2 + eps1)   (factored row/col like Adafactor)
  u_t   = m_t / sqrt(r_t)
  U_t   = (m_t - u_t... ) -> instability matrix s_t factored with b3
  update = m_t / sqrt(s_t) scaled by 1/sqrt(r_t)  (confidence-guided)

For 2D+ parameters second moments are factored (row/col means) for memory
efficiency; 1D parameters fall back to unfactored accumulators.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class _CameFactorState(NamedTuple):
    m: Any
    r_row: Any
    r_col: Any
    s_row: Any
    s_col: Any
    r_full: Any  # used for <2D params (factored entries are None-like zeros)
    s_full: Any
    count: Any


def _factored(shape) -> bool:
    return len(shape) >= 2


def came(learning_rate, b1: float = 0.9, b2: float = 0.999,
         b3: float = 0.9999, eps1: float = 1e-30, eps2: float = 1e-16,
         weight_decay: float = 0.0,
         clip_threshold: float = 1.0) -> optax.GradientTransformation:
    """CAME as an optax transformation."""

    def init_fn(params):
        def per_leaf(p):
            if _factored(p.shape):
                row = jnp.zeros(p.shape[:-1], jnp.float32)
                col = jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
                return _CameFactorState(
                    m=jnp.zeros_like(p, jnp.float32), r_row=row, r_col=col,
                    s_row=jnp.zeros_like(row), s_col=jnp.zeros_like(col),
                    r_full=jnp.zeros((), jnp.float32),
                    s_full=jnp.zeros((), jnp.float32),
                    count=jnp.zeros((), jnp.int32))
            return _CameFactorState(
                m=jnp.zeros_like(p, jnp.float32),
                r_row=jnp.zeros((), jnp.float32),
                r_col=jnp.zeros((), jnp.float32),
                s_row=jnp.zeros((), jnp.float32),
                s_col=jnp.zeros((), jnp.float32),
                r_full=jnp.zeros_like(p, jnp.float32),
                s_full=jnp.zeros_like(p, jnp.float32),
                count=jnp.zeros((), jnp.int32))
        return jax.tree_util.tree_map(per_leaf, params)

    def _approx_from_factors(row, col, eps):
        # Adafactor rank-1 reconstruction: R C / mean(R)
        r = row[..., :, None]
        c = col[..., None, :]
        denom = jnp.clip(jnp.mean(row, axis=-1, keepdims=True)[..., None],
                         eps, None)
        return (r * c) / denom

    def update_fn(grads, state, params=None):
        del params
        lr = learning_rate if not callable(learning_rate) else None

        def per_leaf(g, s: _CameFactorState):
            g32 = g.astype(jnp.float32)
            m = b1 * s.m + (1 - b1) * g32
            gsq = g32 * g32 + eps1
            if _factored(g.shape):
                r_row = b2 * s.r_row + (1 - b2) * jnp.mean(gsq, axis=-1)
                r_col = b2 * s.r_col + (1 - b2) * jnp.mean(gsq, axis=-2)
                v = _approx_from_factors(r_row, r_col, eps1)
                u = g32 / jnp.sqrt(v + eps1)
            else:
                r_full = b2 * s.r_full + (1 - b2) * gsq
                u = g32 / jnp.sqrt(r_full + eps1)
                r_row, r_col = s.r_row, s.r_col
                r_full_new = r_full
            # RMS clipping (Adafactor-style)
            rms = jnp.sqrt(jnp.mean(u * u) + 1e-30)
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            # confidence: instability between m and u
            inst = (u - m) ** 2 + eps2
            if _factored(g.shape):
                s_row = b3 * s.s_row + (1 - b3) * jnp.mean(inst, axis=-1)
                s_col = b3 * s.s_col + (1 - b3) * jnp.mean(inst, axis=-2)
                s_hat = _approx_from_factors(s_row, s_col, eps2)
                update = m / jnp.sqrt(s_hat + eps2)
                new_state = _CameFactorState(
                    m=m, r_row=r_row, r_col=r_col, s_row=s_row, s_col=s_col,
                    r_full=s.r_full, s_full=s.s_full, count=s.count + 1)
            else:
                s_full = b3 * s.s_full + (1 - b3) * inst
                update = m / jnp.sqrt(s_full + eps2)
                new_state = _CameFactorState(
                    m=m, r_row=s.r_row, r_col=s.r_col, s_row=s.s_row,
                    s_col=s.s_col, r_full=r_full_new, s_full=s_full,
                    count=s.count + 1)
            return update.astype(g.dtype), new_state

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat_s = tdef.flatten_up_to(state)
        outs = [per_leaf(g, s) for g, s in zip(flat_g, flat_s)]
        updates = tdef.unflatten([o[0] for o in outs])
        new_state = tdef.unflatten([o[1] for o in outs])

        count = jax.tree_util.tree_leaves(new_state)[0]
        step = None
        for leaf in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda s: s.count, new_state,
                                       is_leaf=lambda x: isinstance(
                                           x, _CameFactorState))):
            step = leaf
            break
        lr_t = learning_rate(step) if callable(learning_rate) else lr

        def scale(u, g):
            out = -lr_t * u
            return out.astype(g.dtype)

        updates = jax.tree_util.tree_map(scale, updates, grads)
        return updates, new_state

    tx = optax.GradientTransformation(init_fn, update_fn)
    if weight_decay > 0:
        tx = optax.chain(tx, optax.add_decayed_weights(-weight_decay))
    return tx
