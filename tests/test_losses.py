"""GAN/perceptual losses: d-losses, adaptive weight, discriminator, LPIPS."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.losses import (
    LPIPS, LPIPSWithDiscriminator2D, NLayerDiscriminator, adopt_weight,
    calculate_adaptive_weight, hinge_d_loss, vanilla_d_loss,
)


def test_hinge_d_loss_values():
    real = jnp.array([2.0, 2.0])   # confident real -> no loss
    fake = jnp.array([-2.0, -2.0])  # confident fake -> no loss
    np.testing.assert_allclose(float(hinge_d_loss(real, fake)), 0.0)
    # uncertain logits incur loss
    assert float(hinge_d_loss(jnp.zeros(2), jnp.zeros(2))) == 1.0


def test_vanilla_d_loss_matches_bce():
    real = jnp.array([0.3, -0.2])
    fake = jnp.array([0.1, 0.7])
    expect = 0.5 * (np.mean(np.log1p(np.exp(-np.asarray(real))))
                    + np.mean(np.log1p(np.exp(np.asarray(fake)))))
    np.testing.assert_allclose(float(vanilla_d_loss(real, fake)), expect,
                               rtol=1e-6)


def test_adopt_weight_threshold():
    assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(15), threshold=10)) == 1.0


def test_adaptive_weight_ratio():
    nll_g = jnp.ones((4,)) * 2.0   # norm 4
    g_g = jnp.ones((4,)) * 1.0     # norm 2
    w = calculate_adaptive_weight(nll_g, g_g)
    np.testing.assert_allclose(float(w), 2.0, rtol=1e-3)


def test_discriminator_shapes_and_grads():
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = disc.init(jax.random.PRNGKey(1), x, train=True)
    logits, mutated = disc.apply(variables, x, train=True,
                                 mutable=['batch_stats'])
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    # generator gradient flows through the discriminator
    def g_loss(x):
        out, _ = disc.apply(variables, x, train=True,
                            mutable=['batch_stats'])
        return -jnp.mean(out)
    g = jax.grad(g_loss)(x)
    assert np.abs(np.asarray(g)).max() > 0


def test_lpips_zero_for_identical_inputs():
    lp = LPIPS()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = lp.init(jax.random.PRNGKey(1), x, x)['params']
    d = lp.apply({'params': params}, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    y = x + 0.5
    d2 = lp.apply({'params': params}, x, y)
    assert np.abs(np.asarray(d2)).max() > 0


def test_combined_loss_facade():
    loss = LPIPSWithDiscriminator2D(disc_start=10, disc_factor=1.0)
    nll = jnp.asarray([0.5, 0.7])
    logits_fake = jnp.asarray([0.2, -0.1])
    g_before = loss.generator_loss(logits_fake, nll,
                                   jnp.asarray(1.0), jnp.asarray(5))
    # before disc_start the GAN term is off
    np.testing.assert_allclose(float(g_before), float(jnp.mean(nll)),
                               rtol=1e-6)
    g_after = loss.generator_loss(logits_fake, nll,
                                  jnp.asarray(1.0), jnp.asarray(20))
    assert abs(float(g_after) - float(jnp.mean(nll))) > 1e-6
    d = loss.discriminator_loss(jnp.asarray([1.5]), jnp.asarray([-1.5]),
                                jnp.asarray(20))
    assert float(d) >= 0
