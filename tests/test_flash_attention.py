"""Flash attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.ops.attention import _xla_masked_attention


def _rand_qkv(rng, b=2, n=256, h=2, dh=72):
    ks = jax.random.split(rng, 3)
    shape = (b, n, h, dh)
    return (jax.random.normal(ks[0], shape), jax.random.normal(ks[1], shape),
            jax.random.normal(ks[2], shape))


def _flash_interpret(q, k, v, mask, block_q=128, block_k=128):
    """Run the pallas kernel in interpreter mode (no TPU needed)."""
    from jax.experimental.pallas import tpu as pltpu
    from fitv2_tpu.ops import flash_attention as fa
    with pltpu.force_tpu_interpret_mode():
        return fa._flash_forward(q, k, v, mask, block_q, block_k)


def test_flash_matches_xla_full_mask():
    q, k, v = _rand_qkv(jax.random.PRNGKey(0))
    mask = jnp.ones((2, 256))
    out = _flash_interpret(q, k, v, mask)
    ref = _xla_masked_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_maskless_matches_masked_ones():
    """mask=None (full grid, statically-absent mask — the sampler's hot
    configuration) must equal the all-ones-mask kernel and the XLA chain."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(3))
    out_none = _flash_interpret(q, k, v, None)
    out_ones = _flash_interpret(q, k, v, jnp.ones((2, 256)))
    ref = _xla_masked_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out_none), np.asarray(out_ones),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_none), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_matches_xla_padded():
    q, k, v = _rand_qkv(jax.random.PRNGKey(1))
    mask = jnp.concatenate([jnp.ones((2, 200)), jnp.zeros((2, 56))], axis=1)
    out = _flash_interpret(q, k, v, mask)
    ref = _xla_masked_attention(q, k, v, mask)
    # compare only valid query rows (padded rows are zeroed by the caller)
    np.testing.assert_allclose(np.asarray(out[:, :200]),
                               np.asarray(ref[:, :200]),
                               rtol=2e-5, atol=2e-5)


def test_flash_padded_keys_have_no_influence():
    q, k, v = _rand_qkv(jax.random.PRNGKey(2))
    mask = jnp.concatenate([jnp.ones((2, 128)), jnp.zeros((2, 128))], axis=1)
    out1 = _flash_interpret(q, k, v, mask)
    k2 = k.at[:, 128:].set(123.0)
    v2 = v.at[:, 128:].set(-77.0)
    out2 = _flash_interpret(q, k2, v2, mask)
    np.testing.assert_allclose(np.asarray(out1[:, :128]),
                               np.asarray(out2[:, :128]), rtol=1e-6)


def test_flash_gradient_matches_xla():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), b=1, n=128, h=1, dh=32)
    mask = jnp.concatenate([jnp.ones((1, 96)), jnp.zeros((1, 32))], axis=1)

    from jax.experimental.pallas import tpu as pltpu
    from fitv2_tpu.ops.flash_attention import flash_masked_attention

    def loss_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            out = flash_masked_attention(q, k, v, mask, 64, 64)
        return jnp.sum((out * mask[..., None, None]) ** 2)

    def loss_ref(q, k, v):
        out = _xla_masked_attention(q, k, v, mask)
        return jnp.sum((out * mask[..., None, None]) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_chunked_matches_monolithic_bounded():
    """Query-chunked bounded-softmax attention (ops/attention.py
    _xla_chunked_attention) is bit-compatible with the monolithic bounded
    chain — same exp/ones-column math, only the query tiling differs.
    Requires LayerNormed q/k (the bounded-logits contract)."""
    from fitv2_tpu.ops.attention import (_xla_chunked_attention,
                                         masked_attention)

    def ln(x):
        m = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-6)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    b, n, h, dh = 2, 256, 4, 72
    q = ln(jax.random.normal(k1, (b, n, h, dh)))
    k = ln(jax.random.normal(k2, (b, n, h, dh)))
    v = jax.random.normal(k3, (b, n, h, dh))
    mask = jnp.asarray(np.concatenate(
        [np.ones((1, n), np.float32),
         np.concatenate([np.ones((1, 200), np.float32),
                         np.zeros((1, n - 200), np.float32)], 1)]))
    for m in (None, mask):
        ref = _xla_masked_attention(q, k, v, m, bounded_logits=True)
        out = _xla_chunked_attention(q, k, v, m)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
        # dispatcher routes impl='xla_chunked' to the chunked path
        via = masked_attention(q, k, v, m, impl='xla_chunked',
                               bounded_logits=True)
        np.testing.assert_allclose(np.asarray(via), np.asarray(out),
                                   rtol=0, atol=0)


def test_attention_core_matches_xla_bounded():
    """attention_core (Pallas, head-major, bounded softmax) matches the
    monolithic bounded XLA chain in interpret mode, fwd + custom_vjp."""
    import fitv2_tpu.ops.attention_core as ac

    def ln(x):
        m = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-6)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    b, n, h, dh = 2, 128, 2, 72
    q = ln(jax.random.normal(k1, (b, n, h, dh)))
    k = ln(jax.random.normal(k2, (b, n, h, dh)))
    v = jax.random.normal(k3, (b, n, h, dh))
    mask = jnp.asarray(np.concatenate(
        [np.ones((1, n), np.float32),
         np.concatenate([np.ones((1, 96), np.float32),
                         np.zeros((1, n - 96), np.float32)], 1)]))

    old = ac._INTERPRET
    ac._INTERPRET = True
    try:
        for m in (None, mask):
            ref = _xla_masked_attention(q, k, v, m, bounded_logits=True)
            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            out = ac.attention_core(qh, kh, vh, m).transpose(0, 2, 1, 3)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

        def loss(q, k, v):
            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            return jnp.sum(ac.attention_core(qh, kh, vh, mask) ** 2)

        def loss_ref(q, k, v):
            o = _xla_masked_attention(q, k, v, mask, bounded_logits=True)
            return jnp.sum(o ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, bb in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-4, atol=1e-4)
    finally:
        ac._INTERPRET = old


def test_chunked_arbitrary_length_and_explicit_dispatch():
    """Explicit impl='xla_chunked' must be honored at ANY sequence length
    (the slicing loop handles a short final chunk); the old shape gate
    (n >= 128, n % 64 == 0) silently fell back to the monolithic chain."""
    from fitv2_tpu.ops.attention import (_xla_chunked_attention,
                                         _xla_masked_attention,
                                         masked_attention)

    def ln(x):
        m = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-6)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
    b, n, h, dh = 2, 100, 4, 72  # n < 128 and not a multiple of 64
    q = ln(jax.random.normal(k1, (b, n, h, dh)))
    k = ln(jax.random.normal(k2, (b, n, h, dh)))
    v = jax.random.normal(k3, (b, n, h, dh))
    ref = _xla_masked_attention(q, k, v, None, bounded_logits=True)
    out = _xla_chunked_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    via = masked_attention(q, k, v, None, impl='xla_chunked',
                           bounded_logits=True)
    np.testing.assert_allclose(np.asarray(via), np.asarray(out),
                               rtol=0, atol=0)
