"""Fused QK-LayerNorm + RoPE kernel vs reference chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _inputs(b=2, n=128, h=4, dh=72):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, n, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, dh), jnp.float32)
    cos = jnp.cos(jax.random.normal(ks[2], (b, n, dh), jnp.float32))
    sin = jnp.sin(jax.random.normal(ks[3], (b, n, dh), jnp.float32))
    return q, k, cos, sin


@pytest.mark.parametrize('norm', [True, False])
def test_fused_matches_reference(norm):
    from jax.experimental.pallas import tpu as pltpu
    from fitv2_tpu.ops.fused_qk_rope import _reference, fused_qk_rope
    q, k, cos, sin = _inputs()
    with pltpu.force_tpu_interpret_mode():
        oq, ok = fused_qk_rope(q, k, cos, sin, 1e-6, norm, norm, 64)
    rq, rk = _reference(q, k, cos, sin, 1e-6, norm, norm)
    np.testing.assert_allclose(np.asarray(oq), np.asarray(rq),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(rk),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradients_match():
    from jax.experimental.pallas import tpu as pltpu
    from fitv2_tpu.ops.fused_qk_rope import _reference, fused_qk_rope
    q, k, cos, sin = _inputs(b=1, n=64, h=2, dh=32)

    def loss_f(q, k):
        with pltpu.force_tpu_interpret_mode():
            oq, ok = fused_qk_rope(q, k, cos, sin, 1e-6, True, True, 64)
        return jnp.sum(oq ** 2) + jnp.sum(ok ** 2)

    def loss_r(q, k):
        oq, ok = _reference(q, k, cos, sin, 1e-6, True, True)
        return jnp.sum(oq ** 2) + jnp.sum(ok ** 2)

    g1 = jax.grad(loss_f, argnums=(0, 1))(q, k)
    g2 = jax.grad(loss_r, argnums=(0, 1))(q, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_attention_module_fused_path_matches_unfused():
    """The Attention module with split layout (CPU: dispatcher falls back to
    the reference math) must equal the explicit LN+rope chain."""
    from fitv2_tpu.models.modules import Attention
    B, N, H, Dh = 2, 64, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, H * Dh))
    cos = jnp.cos(jax.random.normal(jax.random.PRNGKey(1), (B, N, Dh)))
    sin = jnp.sin(jax.random.normal(jax.random.PRNGKey(2), (B, N, Dh)))
    mask = jnp.ones((B, N))

    attn = Attention(num_heads=H, q_norm='layernorm', k_norm='layernorm',
                     rope_layout='split')
    params = attn.init(jax.random.PRNGKey(3), x, mask, cos, sin)['params']
    out = attn.apply({'params': params}, x, mask, cos, sin)
    assert out.shape == (B, N, H * Dh)
    assert np.isfinite(np.asarray(out)).all()
