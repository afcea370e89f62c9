"""Fused LayerNorm+modulate kernel vs reference chain."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _inputs(b=2, n=256, d=256):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (b, n, d), jnp.float32) * 2 + 0.5
    shift = jax.random.normal(ks[1], (b, d), jnp.float32)
    scale = jax.random.normal(ks[2], (b, d), jnp.float32) * 0.1
    return x, shift, scale


def test_fused_matches_reference():
    from jax.experimental.pallas import tpu as pltpu
    from fitv2_tpu.ops.fused_adaln import _reference, fused_adaln_norm
    x, shift, scale = _inputs()
    with pltpu.force_tpu_interpret_mode():
        out = fused_adaln_norm(x, shift, scale)
    ref = _reference(x, shift, scale, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_bf16_dtype():
    from jax.experimental.pallas import tpu as pltpu
    from fitv2_tpu.ops.fused_adaln import _reference, fused_adaln_norm
    x, shift, scale = _inputs()
    x = x.astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = fused_adaln_norm(x, shift, scale)
    assert out.dtype == jnp.bfloat16
    ref = _reference(x, shift, scale, 1e-6)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_fused_gradients_match_reference():
    from jax.experimental.pallas import tpu as pltpu
    from fitv2_tpu.ops.fused_adaln import _reference, fused_adaln_norm
    x, shift, scale = _inputs(b=1, n=128, d=128)

    def loss_fused(x, sh, sc):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_adaln_norm(x, sh, sc, 1e-6, 128) ** 2)

    def loss_ref(x, sh, sc):
        return jnp.sum(_reference(x, sh, sc, 1e-6) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, shift, scale)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, shift, scale)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_dispatcher_cpu_fallback():
    from fitv2_tpu.ops.fused_adaln import _reference, adaln_norm
    x, shift, scale = _inputs(b=1, n=64, d=128)
    out = adaln_norm(x, shift, scale)  # CPU -> reference path
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_reference(x, shift, scale, 1e-6)),
                               rtol=1e-6)


def test_reference_large_common_offset():
    """A large COMMON offset across channels (|mean| >> std) is where the
    raw one-pass E[x^2]-E[x]^2 variance cancels catastrophically in fp32
    (rel. var error ~ (mean^2/var) * 2^-24 — ~13% at offset 3000). The
    shifted one-pass (moments of x - x[..., :1]) must stay accurate;
    float64 numpy is the oracle."""
    from fitv2_tpu.ops.fused_adaln import _reference
    x, shift, scale = _inputs()
    x = x + 3000.0
    out = np.asarray(_reference(x, shift, scale, 1e-6))
    x64 = np.asarray(x, np.float64)
    m = x64.mean(-1, keepdims=True)
    v = x64.var(-1, keepdims=True)
    sh = np.asarray(shift, np.float64)[:, None, :]
    sc = np.asarray(scale, np.float64)[:, None, :]
    ref = ((x64 - m) / np.sqrt(v + 1e-6)) * (1.0 + sc) + sh
    err = np.max(np.abs(out - ref))
    assert err < 5e-3, err
