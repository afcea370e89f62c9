"""CAME optimizer: came_pytorch step parity, convergence, state factoring."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.train.came import came, scale_by_came


def _came_pytorch_step(p, g, st, lr, b1=0.9, b2=0.999, b3=0.9999,
                       eps1=1e-30, eps2=1e-16, wd=0.0, clip=1.0):
    """Numpy transcription of the published CAME update (Luo et al. 2023),
    the algorithm came_pytorch implements: normalize -> RMS-clip -> momentum
    of the clipped update -> confidence scaling (factored params only) ->
    lr-scaled weight decay."""
    g = g.astype(np.float64)
    gsq = g * g + eps1
    factored = g.ndim >= 2
    if factored:
        st['r_row'] = b2 * st['r_row'] + (1 - b2) * gsq.mean(-1)
        st['r_col'] = b2 * st['r_col'] + (1 - b2) * gsq.mean(-2)
        r = 1.0 / np.sqrt(st['r_row'] / st['r_row'].mean(-1, keepdims=True))
        c = 1.0 / np.sqrt(st['r_col'])
        u = g * r[..., :, None] * c[..., None, :]
    else:
        st['r_full'] = b2 * st['r_full'] + (1 - b2) * gsq
        u = g / np.sqrt(st['r_full'])
    rms = np.sqrt(np.mean(u * u))
    u = u / max(1.0, rms / clip)
    st['m'] = b1 * st['m'] + (1 - b1) * u
    if factored:
        res = (u - st['m']) ** 2 + eps2
        st['s_row'] = b3 * st['s_row'] + (1 - b3) * res.mean(-1)
        st['s_col'] = b3 * st['s_col'] + (1 - b3) * res.mean(-2)
        r = 1.0 / np.sqrt(st['s_row'] / st['s_row'].mean(-1, keepdims=True))
        c = 1.0 / np.sqrt(st['s_col'])
        update = st['m'] * r[..., :, None] * c[..., None, :]
    else:
        update = st['m']
    return p - lr * update - lr * wd * p


@pytest.mark.parametrize('shape,wd', [((8, 16), 0.0), ((8, 16), 0.01),
                                      ((16,), 0.0)])
def test_step_parity_with_came_pytorch_algorithm(shape, wd):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal(shape).astype(np.float32)
    lr = 1e-2
    tx = came(learning_rate=lr, weight_decay=wd)
    state = tx.init({'p': jnp.asarray(p0)})

    p_ref = p0.astype(np.float64)
    st = {'m': np.zeros(shape), 'r_full': np.zeros(shape),
          'r_row': np.zeros(shape[:-1]),
          'r_col': np.zeros(shape[:-2] + shape[-1:]),
          's_row': np.zeros(shape[:-1]),
          's_col': np.zeros(shape[:-2] + shape[-1:])}
    p_jax = {'p': jnp.asarray(p0)}
    for i in range(5):
        g = rng.standard_normal(shape).astype(np.float32)
        updates, state = tx.update({'p': jnp.asarray(g)}, state, p_jax)
        p_jax = optax.apply_updates(p_jax, updates)
        p_ref = _came_pytorch_step(p_ref, g, st, lr, wd=wd)
        np.testing.assert_allclose(np.asarray(p_jax['p']), p_ref,
                                   rtol=2e-5, atol=2e-6)


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
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(200):
        params, state = step(params, state)
    assert float(loss(params)) < l0 * 0.05


def test_came_factored_state_memory():
    """2D params use factored (row+col) second moments, not full."""
    params = {'w': jnp.zeros((64, 128))}
    tx = scale_by_came()
    state = tx.init(params)
    s = state['w']
    assert s.r_row.shape == (64,)
    assert s.r_col.shape == (128,)
    assert s.r_full.shape == ()  # unused scalar placeholder


def test_came_lr_schedule():
    sched = optax.linear_schedule(0.1, 0.0, 10)
    tx = came(learning_rate=sched)
    params = {'w': jnp.ones((4, 4))}
    state = tx.init(params)
    g = {'w': jnp.ones((4, 4))}
    u1, state = tx.update(g, state, params)
    for _ in range(9):
        u, state = tx.update(g, state, params)
    # lr decayed -> later updates smaller
    assert float(jnp.abs(u['w']).mean()) < float(jnp.abs(u1['w']).mean())
