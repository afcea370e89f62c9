"""Fused qk-LN + RoPE + attention megakernel vs the unfused XLA chain.

Runs the Pallas kernel in interpret mode on the CPU test mesh; on-chip
timing lives in tools/perf_probe_r2.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitv2_tpu.ops import fused_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fa, '_INTERPRET', True)


def _inputs(b=2, n=32, h=4, dh=6, dtype=jnp.float32, masked=True):
    c = h * dh
    k = jax.random.PRNGKey(0)
    qkv = jax.random.normal(k, (b, n, 3 * c), dtype)
    cos = jnp.cos(jax.random.normal(jax.random.PRNGKey(1), (b, n, dh), dtype))
    sin = jnp.sin(jax.random.normal(jax.random.PRNGKey(2), (b, n, dh), dtype))
    if masked:
        mask = (jnp.arange(n)[None, :] < jnp.array([[n], [n - 7]])[:, 0:1])
        mask = mask.astype(jnp.float32)
    else:
        mask = None
    return qkv, cos, sin, mask, h


@pytest.mark.parametrize('masked', [True, False])
@pytest.mark.parametrize('norm', [(True, True), (False, False)])
def test_matches_reference_chain(masked, norm):
    qkv, cos, sin, mask, h = _inputs(masked=masked)
    nq, nk = norm
    ref = fa._reference_chain(qkv, cos, sin, mask, h, 1e-6, nq, nk)
    out = fa.fused_qkln_rope_attention(qkv, cos, sin, mask, h,
                                       norm_q=nq, norm_k=nk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_padded_queries_zeroed():
    qkv, cos, sin, mask, h = _inputs(masked=True)
    out = fa.fused_qkln_rope_attention(qkv, cos, sin, mask, h)
    pad = np.asarray(out)[np.asarray(mask) == 0]
    assert np.all(pad == 0)


def test_grad_flows_through_vjp():
    qkv, cos, sin, mask, h = _inputs(masked=True)

    def loss(a):
        return jnp.sum(fa.fused_qkln_rope_attention(a, cos, sin, mask, h) ** 2)

    def loss_ref(a):
        return jnp.sum(fa._reference_chain(a, cos, sin, mask, h, 1e-6,
                                           True, True) ** 2)

    g = jax.grad(loss)(qkv)
    g_ref = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_supports_gates_cpu():
    # on the CPU test backend the fused path must be off in 'auto' dispatch
    assert not fa.supports(256, 1152, 16, 'split', 'layernorm', 'layernorm',
                           False, False, False)


def test_explicit_alt_impl_requires_bounded_logits():
    """An explicitly requested pallas_core/xla_chunked dispatch without the
    bounded-logits guarantee must raise, not silently run the XLA chain
    (a benchmark 'of the alternative' would measure the wrong code)."""
    from fitv2_tpu.ops.attention import masked_attention
    q = jnp.zeros((1, 8, 2, 16), jnp.float32)
    for impl in ('pallas_core', 'xla_chunked'):
        with pytest.raises(ValueError, match='bounded_logits'):
            masked_attention(q, q, q, None, impl=impl, bounded_logits=False)
