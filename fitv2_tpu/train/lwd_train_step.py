"""LwD/BFM segment-flow training step (reflow targets + REPA alignment).

TPU-native equivalent of the reference segment training loop
(/root/reference/train.py:328-385 and train_fitv2_lwd.py:680-790):

  per inner repeat (reference for_loop=3):
    x0 ~ N(0, I)
    segment k: endpoints xt_in = lerp(x0, x1, sigma_k),
               xt = lerp(x0, x1, sigma_{k+1})
    r ~ U[0,1); t = sigma_k + r (sigma_{k+1}-sigma_k)
    x_input = lerp(xt_in, xt, r)
    target = (xt - xt_in) / (sigma_{k+1}-sigma_k)
    loss = MSE(model.forward_run_layer(x_input, t, y, k), target)
    (+ 0.5 * REPA cosine alignment when a representation head exists)

The segment index must be static for the per-segment parameter stacks, so
one compiled step exists per segment; the caller draws k on the host
(numpy RNG) and dispatches — matching the reference's host-side
random.randint (train.py:335).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from fitv2_tpu.train.train_step import TrainState, update_ema

Array = jax.Array


def make_lwd_train_step(model, tx: optax.GradientTransformation,
                        ema_decay: float = 0.9999,
                        repa_weight: float = 0.5,
                        ) -> Callable:
    """Returns train_step(state, batch, rng, segment_idx) with static
    segment_idx. batch: feature (B,N,C), grid, mask, label, size, and
    optionally 'repa_target' (B,N,Drepa) frozen-encoder features."""
    sigmas = model.sigmas  # numpy (K+1,)

    def loss_fn(params, batch, rng, segment_idx: int):
        k_x0, k_r, k_drop = jax.random.split(rng, 3)
        x1 = batch['feature']
        x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
        s_cur = float(sigmas[segment_idx])
        s_next = float(sigmas[segment_idx + 1])
        xt_in = x0 * (1 - s_cur) + x1 * s_cur
        xt = x0 * (1 - s_next) + x1 * s_next
        r = jax.random.uniform(k_r, (x1.shape[0],), x1.dtype)
        t_input = s_cur + r * (s_next - s_cur)
        rb = r.reshape((-1,) + (1,) * (x1.ndim - 1))
        x_input = xt_in * (1 - rb) + xt * rb
        target = (xt - xt_in) / (s_next - s_cur)

        pred, repr_proj = model.apply(
            {'params': params}, x_input, t_input, batch['label'],
            segment_idx, batch['grid'], batch['mask'], batch.get('size'),
            True, rngs={'label_dropout': k_drop},
            method=model.forward_run_layer)

        mask_b = batch['mask'][..., None].astype(jnp.float32)
        err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) * mask_b
        flow_loss = jnp.mean(jnp.mean(err ** 2, axis=(1, 2)))

        proj_loss = jnp.zeros((), jnp.float32)
        if repr_proj is not None and 'repa_target' in batch:
            from fitv2_tpu.models.fit_lwd import repa_alignment_loss
            proj_loss = jnp.mean(repa_alignment_loss(
                repr_proj.astype(jnp.float32),
                batch['repa_target'].astype(jnp.float32), batch['mask']))

        total = flow_loss + repa_weight * proj_loss
        return total, {'flow_loss': flow_loss, 'proj_loss': proj_loss}

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array,
                   segment_idx: int) -> Tuple[TrainState, Dict[str, Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng, segment_idx)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            ema_params=update_ema(state.ema_params, new_params, ema_decay),
            opt_state=new_opt)
        return new_state, {'loss': loss, 'grad_norm': grad_norm, **aux}

    return train_step


class SegmentSampler:
    """Host-side deterministic segment-index stream (train.py:335)."""

    def __init__(self, number_of_perflow: int, seed: int = 0):
        self.k = number_of_perflow
        self.rng = np.random.Generator(np.random.PCG64(seed))

    def __call__(self) -> int:
        return int(self.rng.integers(self.k))


def make_lwd_distill_step(student, teacher_apply: Callable,
                          tx: optax.GradientTransformation,
                          solver_steps: int = 8,
                          ema_decay: float = 0.9999) -> Callable:
    """Teacher-trajectory distillation (reference train_fitv2_lwd.py
    --distillation, :414-417 + the reflow loop :700-790 with teacher
    endpoints): the segment's end state xt comes from rolling the FROZEN
    teacher's velocity field with ``solver_steps`` Euler sub-steps from
    xt_in, instead of the data interpolant. The student's target is
    (teacher_xt - xt_in) / dsigma.

    teacher_apply(x, t, batch) -> velocity, a closure over frozen teacher
    params (e.g. a pretrained FiTv2 via model.apply).
    """
    sigmas = student.sigmas

    def loss_fn(params, batch, rng, segment_idx: int):
        k_x0, k_r, k_drop = jax.random.split(rng, 3)
        x1 = batch['feature']
        x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
        s_cur = float(sigmas[segment_idx])
        s_next = float(sigmas[segment_idx + 1])
        xt_in = x0 * (1 - s_cur) + x1 * s_cur

        # roll the teacher across the segment (no gradient)
        sub = np.linspace(s_cur, s_next, solver_steps + 1)
        xt = xt_in
        for i in range(solver_steps):
            tv = jnp.full((x1.shape[0],), float(sub[i]), x1.dtype)
            v = teacher_apply(xt, tv, batch)
            xt = xt + float(sub[i + 1] - sub[i]) * v
        xt = jax.lax.stop_gradient(xt)

        r = jax.random.uniform(k_r, (x1.shape[0],), x1.dtype)
        t_input = s_cur + r * (s_next - s_cur)
        rb = r.reshape((-1,) + (1,) * (x1.ndim - 1))
        x_input = xt_in * (1 - rb) + xt * rb
        target = (xt - xt_in) / (s_next - s_cur)

        pred, _ = student.apply(
            {'params': params}, x_input, t_input, batch['label'],
            segment_idx, batch['grid'], batch['mask'], batch.get('size'),
            True, rngs={'label_dropout': k_drop},
            method=student.forward_run_layer)
        mask_b = batch['mask'][..., None].astype(jnp.float32)
        err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) * mask_b
        return jnp.mean(jnp.mean(err ** 2, axis=(1, 2))), {}

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array,
                   segment_idx: int) -> Tuple[TrainState, Dict[str, Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng, segment_idx)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            ema_params=update_ema(state.ema_params, new_params, ema_decay),
            opt_state=new_opt)
        return new_state, {'loss': loss, 'grad_norm': grad_norm}

    return train_step
