"""LwD auxiliary modules."""

import numpy as np

import jax
import jax.numpy as jnp

from fitv2_tpu.models.modules_lwd import (
    FinalLayerNoModulation, SRN, TimestepDependentCoefficient,
)


def test_timestep_coefficient_range_and_init():
    mod = TimestepDependentCoefficient(embedding_dim=32)
    t_emb = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
    params = mod.init(jax.random.PRNGKey(1), t_emb)['params']
    out = mod.apply({'params': params}, t_emb)
    assert out.shape == (4, 1)
    arr = np.asarray(out)
    assert (arr > 0).all() and (arr < 1).all()
    # zero-init final kernel + bias -4.6 -> sigmoid(-4.6) ~ 0.01
    np.testing.assert_allclose(arr, 1 / (1 + np.exp(4.6)), rtol=1e-4)


def test_final_layer_nomodulation():
    mod = FinalLayerNoModulation(hidden_size=32, patch_size=2,
                                 out_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
    params = mod.init(jax.random.PRNGKey(1), x)['params']
    out = mod.apply({'params': params}, x)
    assert out.shape == (2, 8, 16)


def test_srn_bounded_and_pertoken_cond():
    mod = SRN(hidden_size=32, patch_size=2, out_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    params = mod.init(jax.random.PRNGKey(2), x, c)['params']
    out = mod.apply({'params': params}, x, c)
    assert out.shape == (2, 8, 4)
    arr = np.asarray(out)
    assert (arr > 0).all() and (arr < 1).all()
    # per-token conditioning also works
    c_tok = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 32))
    out2 = mod.apply({'params': params}, x, c_tok)
    assert out2.shape == (2, 8, 4)
