"""DDPM (FiTv1) train step + GAN generator/discriminator steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fitv2_tpu.losses import LPIPSWithDiscriminator2D, NLayerDiscriminator
from fitv2_tpu.models.fit import FiT
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.sched import create_diffusion
from fitv2_tpu.train import (
    OptimizerConfig, create_train_state, make_optimizer,
)
from fitv2_tpu.train.ddpm_train_step import make_ddpm_train_step
from fitv2_tpu.train.gan_train_step import (
    create_disc_state, make_gan_steps,
)


def test_ddpm_train_step_fitv1():
    """FiTv1: learn_sigma=True, epsilon prediction, 2C output channels."""
    model = FiT(context_size=16, patch_size=2, in_channels=4, hidden_size=32,
                depth=2, num_heads=2, num_classes=10, learn_sigma=True,
                use_sit=False, use_swiglu=False, max_cached_len=8)
    diffusion = create_diffusion(learn_sigma=True, diffusion_steps=100)
    B = 4
    grid, mask, size = make_grid_mask_size(B, 4, 4, 16)
    batch = {
        'feature': jax.random.normal(jax.random.PRNGKey(0), (B, 16, 16)),
        'grid': grid, 'mask': mask,
        'label': (jnp.arange(B) % 10).astype(jnp.int32), 'size': size,
    }
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        batch['feature'][:1], jnp.zeros((1,)), batch['label'][:1],
        grid[:1], mask[:1], size[:1], train=True)['params']
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3))
    state = create_train_state(params, tx)
    step = jax.jit(make_ddpm_train_step(model, diffusion, tx))
    losses = []
    for _ in range(10):
        state, m = step(state, batch, jax.random.PRNGKey(3))
        losses.append(float(m['loss']))
    assert np.isfinite(losses).all()
    assert int(state.step) == 10


def test_gan_steps():
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    gen_tx = make_optimizer(OptimizerConfig(learning_rate=1e-3))
    disc_tx = optax.adam(1e-3)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((2, 32, 32, 3))
    disc_state = create_disc_state(disc, disc_tx, rng, img)

    # toy generator: params are the image itself
    gen_params = {'img': jnp.zeros((2, 32, 32, 3))}

    def gen_loss_fn(params, batch, rng):
        fake = jnp.tanh(params['img'])
        base = jnp.mean((fake - batch['real']) ** 2)
        return base, fake

    loss_cfg = LPIPSWithDiscriminator2D(disc_start=0, disc_factor=1.0,
                                        disc_weight=0.1)
    gen_step, disc_step = make_gan_steps(gen_loss_fn, disc, gen_tx, disc_tx,
                                         loss_cfg)
    state = create_train_state(gen_params, gen_tx)
    batch = {'real': jax.random.normal(jax.random.PRNGKey(1),
                                       (2, 32, 32, 3)) * 0.5}

    gen_step = jax.jit(gen_step)
    disc_step = jax.jit(disc_step)
    for i in range(5):
        state, gm = gen_step(state, disc_state, batch, jax.random.PRNGKey(i))
        fake = jnp.tanh(state.params['img'])
        disc_state, dm = disc_step(disc_state, batch['real'], fake,
                                   state.step)
    assert np.isfinite(float(gm['loss']))
    assert np.isfinite(float(dm['d_loss']))
    assert int(disc_state.step) == 5
