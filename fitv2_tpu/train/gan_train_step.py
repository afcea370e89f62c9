"""GAN-guided LwD training: generator + PatchGAN discriminator steps.

TPU-native equivalent of the reference CIFAR GAN trainer
(/root/reference/train_fitv2_lwd_cifar_gan.py:428-441 + fit/losses/
perceptual.py): alternating generator (flow loss + adversarial term with
adaptive weighting) and discriminator (hinge/vanilla) updates. The
reference's StyleGAN bias_act/upfirdn2d CUDA ops used by its discriminator
path map to fitv2_tpu.ops (SURVEY.md §2.8).

Functional: two TrainStates (generator = any LwD/FiT state; discriminator =
params + batch_stats + opt_state), explicit rngs, one jitted fn per side.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fitv2_tpu.losses.perceptual import (
    LPIPSWithDiscriminator2D, hinge_d_loss, vanilla_d_loss)
from fitv2_tpu.train.train_step import TrainState, update_ema

Array = jax.Array


class DiscState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_disc_state(disc, tx: optax.GradientTransformation, rng: Array,
                      example_image: Array) -> DiscState:
    variables = disc.init(rng, example_image, train=True)
    return DiscState(step=jnp.zeros((), jnp.int32),
                     params=variables['params'],
                     batch_stats=variables.get('batch_stats', {}),
                     opt_state=tx.init(variables['params']))


def make_gan_steps(generator_loss_fn: Callable, disc,
                   gen_tx: optax.GradientTransformation,
                   disc_tx: optax.GradientTransformation,
                   loss_cfg: Optional[LPIPSWithDiscriminator2D] = None,
                   ema_decay: float = 0.9999,
                   ) -> Tuple[Callable, Callable]:
    """(gen_step, disc_step).

    generator_loss_fn(params, batch, rng) -> (base_loss (scalar), fake
    images (B,H,W,C) in [-1,1]) — the task-specific flow/recon loss plus
    the sample the discriminator judges.
    """
    loss_cfg = loss_cfg or LPIPSWithDiscriminator2D()

    def gen_step(state: TrainState, disc_state: DiscState,
                 batch: Dict[str, Array], rng: Array):
        def total_loss(params):
            base, fake = generator_loss_fn(params, batch, rng)
            logits_fake, _ = disc.apply(
                {'params': disc_state.params,
                 'batch_stats': disc_state.batch_stats},
                fake, train=True, mutable=['batch_stats'])
            g_loss = -jnp.mean(logits_fake)
            factor = jnp.where(state.step >= loss_cfg.disc_start,
                               loss_cfg.disc_factor, 0.0)
            return base + loss_cfg.disc_weight * factor * g_loss, (base,
                                                                   g_loss)

        (loss, (base, g_loss)), grads = jax.value_and_grad(
            total_loss, has_aux=True)(state.params)
        updates, new_opt = gen_tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            ema_params=update_ema(state.ema_params, new_params, ema_decay),
            opt_state=new_opt)
        return new_state, {'loss': loss, 'base_loss': base, 'g_loss': g_loss}

    def disc_step(disc_state: DiscState, real: Array, fake: Array,
                  global_step: Array):
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(params):
            logits_real, mut = disc.apply(
                {'params': params, 'batch_stats': disc_state.batch_stats},
                real, train=True, mutable=['batch_stats'])
            logits_fake, mut = disc.apply(
                {'params': params, 'batch_stats': mut['batch_stats']},
                fake, train=True, mutable=['batch_stats'])
            fn = (hinge_d_loss if loss_cfg.disc_loss == 'hinge'
                  else vanilla_d_loss)
            factor = jnp.where(global_step >= loss_cfg.disc_start,
                               loss_cfg.disc_factor, 0.0)
            return factor * fn(logits_real, logits_fake), mut['batch_stats']

        (d_loss, new_bs), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(disc_state.params)
        updates, new_opt = disc_tx.update(grads, disc_state.opt_state,
                                          disc_state.params)
        new_params = optax.apply_updates(disc_state.params, updates)
        new_state = DiscState(step=disc_state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt)
        return new_state, {'d_loss': d_loss}

    return gen_step, disc_step
