"""FiTv1 (IDDPM epsilon-prediction) train step.

TPU-native equivalent of the reference FiTv1 trainer loop body
(/root/reference/train_fit.py, same shape as train_fitv2.py but with
``create_diffusion`` losses instead of transport): uniform timestep
sampling, masked MSE(+vb) via GaussianDiffusion.training_losses, AdamW,
EMA — one jitted function.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from fitv2_tpu.sched.gaussian_diffusion import GaussianDiffusion
from fitv2_tpu.train.train_step import TrainState, update_ema

Array = jax.Array


def make_ddpm_train_step(model, diffusion: GaussianDiffusion,
                         tx: optax.GradientTransformation,
                         ema_decay: float = 0.9999) -> Callable:
    """batch: feature (B,N,C_tok), grid, mask, label, size. The model is a
    FiT with learn_sigma=True (2C output channels for LEARNED_RANGE).

    Importance sampling (reference schedule_sampler, train_fit.py): pass
    host-sampled ``t`` (B,) int32 and ``t_weight`` (B,) float in the batch
    (from sched.timestep_sampler.LossSecondMomentResampler.sample) and the
    step uses them — the returned ``per_t_loss`` (B,) feeds
    update_with_all_losses. Absent those keys, t is uniform in-step."""

    def loss_fn(params, batch, rng):
        k_t, k_noise, k_drop = jax.random.split(rng, 3)
        x = batch['feature']
        if 't' in batch:
            t = batch['t'].astype(jnp.int32)
        else:
            t = jax.random.randint(k_t, (x.shape[0],), 0,
                                   diffusion.num_timesteps)

        def model_fn(xt, t_int):
            return model.apply(
                {'params': params}, xt,
                t_int.astype(jnp.float32), batch['label'], batch['grid'],
                batch['mask'], batch.get('size'), train=True,
                rngs={'label_dropout': k_drop})

        terms = diffusion.training_losses(k_noise, model_fn, x, t,
                                          mask=batch['mask'])
        per_t = terms['loss']
        if 't_weight' in batch:
            per_t = per_t * batch['t_weight']
        terms = dict(terms, per_t_loss=terms['loss'], t=t)
        return jnp.mean(per_t), terms

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            ema_params=update_ema(state.ema_params, new_params, ema_decay),
            opt_state=new_opt)
        metrics = {'loss': loss, 'grad_norm': grad_norm,
                   'mse': jnp.mean(terms.get('mse', loss)),
                   'per_t_loss': terms['per_t_loss'], 't': terms['t']}
        return new_state, metrics

    return train_step
