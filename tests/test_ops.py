"""bias_act + upfirdn2d parity vs torch reference math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.ops.bias_act import ACTIVATION_FUNCS, bias_act
from fitv2_tpu.ops.upfirdn2d import (
    downsample2d, filter2d, setup_filter, upfirdn2d, upsample2d,
)


@pytest.mark.parametrize('act', sorted(ACTIVATION_FUNCS))
def test_bias_act_matches_torch(act):
    torch = pytest.importorskip('torch')
    import torch.nn.functional as F
    tfn = {
        'linear': lambda x, a: x, 'relu': lambda x, a: F.relu(x),
        'lrelu': lambda x, a: F.leaky_relu(x, a),
        'tanh': lambda x, a: torch.tanh(x),
        'sigmoid': lambda x, a: torch.sigmoid(x),
        'elu': lambda x, a: F.elu(x), 'selu': lambda x, a: F.selu(x),
        'softplus': lambda x, a: F.softplus(x),
        'swish': lambda x, a: torch.sigmoid(x) * x,
    }[act]
    _, def_alpha, def_gain = ACTIVATION_FUNCS[act]
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 4, 4)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)

    out = bias_act(jnp.asarray(x), jnp.asarray(b), act=act, clamp=0.5)
    with torch.no_grad():
        xt = torch.from_numpy(x) + torch.from_numpy(b).reshape(1, -1, 1, 1)
        expect = torch.clamp(tfn(xt, def_alpha) * def_gain, -0.5, 0.5)
    np.testing.assert_allclose(np.asarray(out), expect.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_bias_act_second_order_grad():
    f = lambda x: jnp.sum(bias_act(x, act='swish') ** 2)
    x = jnp.ones((4,))
    g2 = jax.hessian(f)(x)
    assert np.isfinite(np.asarray(g2)).all()


def test_upfirdn2d_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 2, 8, 8)).astype(np.float32))
    out = upfirdn2d(x, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_upfirdn2d_matches_manual_upsample():
    """up=2 with box filter vs manual zero-insertion + conv."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 4, 4)).astype(np.float32)
    f = setup_filter([1., 1.])  # 2x2 box, normalized
    out = upsample2d(jnp.asarray(x), f, up=2)
    assert out.shape == (1, 1, 8, 8)
    # nearest-like: each input pixel spreads into a 2x2 block scaled by
    # filter * gain(=4) * norm(1/4) = 1
    expect = np.repeat(np.repeat(x, 2, 2), 2, 3)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)


def test_downsample2d_box_is_average_pool():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1, 8, 8)).astype(np.float32)
    f = setup_filter([1., 1.])
    out = downsample2d(jnp.asarray(x), f, down=2)
    assert out.shape == (1, 1, 4, 4)
    expect = x.reshape(1, 1, 4, 2, 4, 2).mean(axis=(3, 5))
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-6)


def test_filter2d_shape_preserved():
    x = jnp.zeros((1, 3, 16, 16))
    f = setup_filter([1., 3., 3., 1.])
    out = filter2d(x, f)
    assert out.shape == x.shape


def test_upfirdn2d_gradient_flows():
    f = setup_filter([1., 2., 1.])
    def loss(x):
        return jnp.sum(upsample2d(x, f, up=2) ** 2)
    g = jax.grad(loss)(jnp.ones((1, 1, 4, 4)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
