"""CAME optimizer: convergence on a quadratic + state factoring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.train.came import came


def test_came_converges_quadratic():
    target = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, 16)).astype(np.float32))
    params = {'w': jnp.zeros((8, 16)), 'b': jnp.zeros((16,))}

    def loss(p):
        return jnp.mean((p['w'] - target) ** 2) + jnp.mean(p['b'] ** 2)

    tx = came(learning_rate=0.05)
    state = tx.init(params)
    l0 = float(loss(params))

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state)
        import optax
        return optax.apply_updates(params, updates), state

    for _ in range(200):
        params, state = step(params, state)
    assert float(loss(params)) < l0 * 0.05


def test_came_factored_state_memory():
    """2D params use factored (row+col) second moments, not full."""
    params = {'w': jnp.zeros((64, 128))}
    tx = came(learning_rate=1e-3)
    state = tx.init(params)
    s = state['w']
    assert s.r_row.shape == (64,)
    assert s.r_col.shape == (128,)
    assert s.r_full.shape == ()  # unused scalar placeholder
