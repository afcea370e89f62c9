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


def _apply_updates(state: TrainState, tx, grads, loss, aux,
                   ema_decay: float) -> Tuple[TrainState, Dict[str, Array]]:
    grad_norm = optax.global_norm(grads)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = TrainState(
        step=state.step + 1, params=new_params,
        ema_params=update_ema(state.ema_params, new_params, ema_decay),
        opt_state=new_opt)
    return new_state, {'loss': loss, 'grad_norm': grad_norm, **aux}


def make_lwd_finetune_step(model, tx: optax.GradientTransformation,
                           ema_decay: float = 0.9999,
                           mode: str = 'replace',
                           rep_weight: float = 0.0) -> Callable:
    """Mid-block representation-forecaster finetuning (reference
    train_fitv2_lwd_finetune.py:649-741): the trunk is frozen inside
    ``forward_run_layer_finetune`` (stop_gradient); the forecaster learns to
    predict the frozen encoder's representation taken at the SEGMENT START
    (t_next = sigma_current, xt_next = segment-start interpolant,
    finetune.py:705). Loss = MSE(x_pred, sg(x_target)) (+ optional cosine
    rep alignment, which the reference computes but leaves disabled at
    :721 — default rep_weight 0).

    mode: 'replace' | 'residual' | 'blend' (forward_run_layer_finetune{,2,3}).
    """
    sigmas = model.sigmas

    def loss_fn(params, batch, rng, segment_idx: int):
        k_x0, k_r, k_drop = jax.random.split(rng, 3)
        x1 = batch['feature']
        x0 = jax.random.normal(k_x0, x1.shape, x1.dtype)
        s_cur = float(sigmas[segment_idx])
        s_next = float(sigmas[segment_idx + 1])
        xt_in = x0 * (1 - s_cur) + x1 * s_cur
        r = jax.random.uniform(k_r, (x1.shape[0],), x1.dtype)
        t_input = s_cur + r * (s_next - s_cur)
        rb = r.reshape((-1,) + (1,) * (x1.ndim - 1))
        xt = x0 * (1 - s_next) + x1 * s_next
        x_input = xt_in * (1 - rb) + xt * rb
        t_next = jnp.full((x1.shape[0],), s_cur, x1.dtype)

        out = model.apply(
            {'params': params}, x_input, t_input, batch['label'],
            segment_idx, batch['grid'], batch['mask'], t_next, xt_in,
            batch.get('size'), mode,
            rngs={'label_dropout': k_drop},
            method=model.forward_run_layer_finetune)
        mask_b = batch['mask'][..., None].astype(jnp.float32)
        err = (out['x_pred'].astype(jnp.float32)
               - jax.lax.stop_gradient(out['x_target']).astype(jnp.float32))
        mse = jnp.mean(jnp.mean((err * mask_b) ** 2, axis=(1, 2)))
        aux = {'mse': mse}
        loss = mse
        if rep_weight > 0.0:
            from fitv2_tpu.models.fit_lwd import repa_alignment_loss
            rep = jnp.mean(repa_alignment_loss(
                out['rep_pred'].astype(jnp.float32),
                jax.lax.stop_gradient(out['rep_target']).astype(jnp.float32),
                batch['mask']))
            aux['rep_loss'] = rep
            loss = loss + rep_weight * rep
        return loss, aux

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array,
                   segment_idx: int) -> Tuple[TrainState, Dict[str, Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng, segment_idx)
        return _apply_updates(state, tx, grads, loss, aux, ema_decay)

    return train_step


def _tier_of(segment_idx: int, multi_scale_indices) -> int:
    tier = 0
    for b in multi_scale_indices:
        if segment_idx >= b:
            tier += 1
    return tier


def _corrected_sigma(s: float, gamma: float = 1.0 / 3.0) -> float:
    """Reference renoising correction (train_fitv2_lwd_ms.py:755-757)."""
    return (1.0 / (np.sqrt(1.0 + 1.0 / gamma) * (1.0 - s) + s)) * s


def make_lwd_multiscale_train_step(model, tx: optax.GradientTransformation,
                                   ema_decay: float = 0.9999,
                                   multi_scale_indices=(2, 7),
                                   gamma: float = 1.0 / 3.0) -> Callable:
    """Multi-scale LwD segment training (reference
    train_fitv2_lwd_ms.py:682-886): segments are grouped into resolution
    tiers by ``multi_scale_indices``; tier k (0-based, T tiers total) trains
    at 1/2^(T-1-k) resolution on bilinear-downsampled data/noise (noise
    scaled x2 per halving to keep unit variance, :700), against a coarse
    sigma ladder linspace(0, 1, T+1) (:433) with the renoising-corrected
    start sigma (:755-757). The tier's x_start blends the (downsampled)
    previous-tier image via nearest upsampling (:778-779).

    Trains on full square grids (the LwD family drops the padding mask,
    reference modules_lwd.py:172-175) — batch features must be unpadded
    n_patch_h*n_patch_w token grids.
    """
    K = model.number_of_perflow
    bounds = [0] + list(multi_scale_indices) + [K]
    n_tiers = len(bounds) - 1
    coarse = np.linspace(0.0, 1.0, n_tiers + 1)
    p = model.patch_size
    c_lat = model.in_channels
    H = model.n_patch_h * p
    W = model.n_patch_w * p

    def tokens_to_img(xt):
        b = xt.shape[0]
        gh, gw = H // p, W // p
        x = xt.reshape(b, gh, gw, c_lat, p, p)
        x = jnp.einsum('bhwcpq->bhpwqc', x)
        return x.reshape(b, H, W, c_lat)  # NHWC

    def img_to_tokens(img):
        b, h, w, _ = img.shape
        gh, gw = h // p, w // p
        x = img.reshape(b, gh, p, gw, p, c_lat)
        x = jnp.einsum('bhpwqc->bhwcpq', x)
        return x.reshape(b, gh * gw, p * p * c_lat)

    def resize(img, h, w, method, scale=1.0):
        out = jax.image.resize(img, (img.shape[0], h, w, img.shape[-1]),
                               method=method, antialias=False)
        return out * scale if scale != 1.0 else out

    def loss_fn(params, batch, rng, segment_idx: int):
        k_x0, k_r, k_drop = jax.random.split(rng, 3)
        x1_img = tokens_to_img(batch['feature'])
        x0_img = jax.random.normal(k_x0, x1_img.shape, x1_img.dtype)
        tier = _tier_of(segment_idx, multi_scale_indices)
        halvings = n_tiers - 1 - tier
        hx, wx = H >> halvings, W >> halvings
        # downsample data/noise to the tier resolution (noise x2/halving)
        x = resize(x1_img, hx, wx, 'bilinear')
        x0 = resize(x0_img, hx, wx, 'bilinear', scale=2.0 ** halvings)
        s_start = float(coarse[tier])
        s_end = float(coarse[tier + 1]) if tier < n_tiers - 1 \
            else float(coarse[-1])
        if tier == 0:
            x_start = x0
        else:
            # previous tier's image, nearest-upsampled into this tier
            prev_h = H >> (halvings + 1)
            x_past = resize(x1_img, prev_h, prev_h * W // H, 'bilinear')
            x_past = resize(x_past, hx, wx, 'nearest')
            s_start = _corrected_sigma(s_start, gamma)
            x_start = x0 * (1.0 - s_start) + x_past * s_start
        if tier == n_tiers - 1:
            x_end = x
        else:
            x_end = x0 * (1.0 - s_end) + x * s_end

        # sub-segment position within the tier
        lo, hi = bounds[tier], bounds[tier + 1]
        j = segment_idx - lo
        tier_len = hi - lo
        mod, mod_next = j / tier_len, (j + 1) / tier_len
        xt_in = x_start * (1 - mod) + x_end * mod
        xt = x_start * (1 - mod_next) + x_end * mod_next
        sig_cur = s_start + (s_end - s_start) * mod
        sig_next = s_start + (s_end - s_start) * mod_next

        r = jax.random.uniform(k_r, (x.shape[0],), x.dtype)
        t_input = sig_cur + r * (sig_next - sig_cur)
        rb = r[:, None, None, None]
        x_input = img_to_tokens(xt_in * (1 - rb) + xt * rb)
        target = img_to_tokens((xt - xt_in) / (sig_next - sig_cur))

        from fitv2_tpu.models.grid_utils import make_grid_mask_size
        grid, mask, size = make_grid_mask_size(
            x.shape[0], hx // p, wx // p, (hx // p) * (wx // p))
        pred, _ = model.apply(
            {'params': params}, x_input, t_input, batch['label'],
            segment_idx, grid, mask, size, True,
            rngs={'label_dropout': k_drop},
            method=model.forward_run_layer)
        err = pred.astype(jnp.float32) - target.astype(jnp.float32)
        loss = jnp.mean(jnp.mean(err ** 2, axis=(1, 2)))
        return loss, {'tier': jnp.asarray(tier, jnp.float32)}

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array,
                   segment_idx: int) -> Tuple[TrainState, Dict[str, Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng, segment_idx)
        return _apply_updates(state, tx, grads, loss, aux, ema_decay)

    return train_step
