"""Single-block VMEM attention kernel vs the XLA reference chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from fitv2_tpu.ops.block_attention import _reference, block_masked_attention


def _inputs(b=2, n=64, h=4, dh=72, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, n, h * dh), dtype)
    k = jax.random.normal(ks[1], (b, n, h * dh), dtype)
    v = jax.random.normal(ks[2], (b, n, h * dh), dtype)
    return q, k, v


@pytest.mark.parametrize('with_mask', [False, True])
def test_block_attention_matches_reference(with_mask):
    q, k, v = _inputs()
    mask = None
    if with_mask:
        mask = jnp.ones((q.shape[0], q.shape[1]))
        mask = mask.at[:, 48:].set(0.0)
    with pltpu.force_tpu_interpret_mode():
        out = block_masked_attention(q, k, v, mask, 4)
    ref = _reference(q, k, v, mask, 4)
    valid = 48 if with_mask else q.shape[1]
    np.testing.assert_allclose(np.asarray(out[:, :valid]),
                               np.asarray(ref[:, :valid]),
                               rtol=2e-5, atol=2e-5)


def test_block_attention_gradients_match():
    q, k, v = _inputs(b=1, n=32, h=2, dh=16)
    mask = jnp.ones((1, 32)).at[:, 24:].set(0.0)

    def loss_f(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            o = block_masked_attention(q, k, v, mask, 2)
        return jnp.sum((o * mask[..., None]) ** 2)

    def loss_r(q, k, v):
        o = _reference(q, k, v, mask, 2)
        return jnp.sum((o * mask[..., None]) ** 2)

    g1 = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
