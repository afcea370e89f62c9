"""Int8 W8A8 GEMM path (ops/quant.py): numerics + model-level opt-in.

The reference has no quantized path (pure torch bf16/fp32); this is the
TPU-native double-rate MXU mode (v5e: 394 TOP/s int8 vs 197 TFLOP/s bf16)
exposed as FiT(gemm_precision='int8').
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_quantize_roundtrip_error_bound():
    from fitv2_tpu.ops.quant import quantize_symmetric
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    q, s = quantize_symmetric(w, axis=0)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # absmax symmetric: error <= scale/2 = absmax/254 per element
    bound = np.abs(w).max(axis=0, keepdims=True) / 254.0 + 1e-9
    assert np.all(np.abs(np.asarray(deq - w)) <= bound)


def test_int8_matmul_close_to_dense():
    from fitv2_tpu.ops.quant import int8_matmul, quantize_symmetric
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 16, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.01, jnp.float32)
    wq, ws = quantize_symmetric(w, axis=0)
    y = int8_matmul(x, wq, ws.reshape(1, -1), b, out_dtype=jnp.float32)
    ref = x @ w + b
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel  # ~0.4% typical for W8A8 dynamic symmetric


def test_int8dense_param_tree_matches_dense():
    """Int8Dense must keep nn.Dense's param names/shapes so checkpoints and
    the torch importer work unchanged."""
    from fitv2_tpu.models.modules import Dense
    from fitv2_tpu.ops.quant import Int8Dense
    x = jnp.zeros((2, 8))
    p1 = Dense(12).init(jax.random.PRNGKey(0), x)['params']
    p2 = Int8Dense(12).init(jax.random.PRNGKey(0), x)['params']
    assert jax.tree_util.tree_structure(p1) == \
        jax.tree_util.tree_structure(p2)
    assert all(a.shape == b.shape for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)))


def test_fit_int8_forward_close_to_bf16():
    """FiT(gemm_precision='int8') runs with the SAME params as the default
    model and stays directionally faithful (cosine > 0.99 on the velocity
    field) — the property that keeps the ODE trajectory on-distribution."""
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.models.grid_utils import make_grid_mask_size

    kw = dict(context_size=16, patch_size=2, in_channels=4, hidden_size=64,
              depth=2, num_heads=4, num_classes=10, learn_sigma=False,
              use_sit=True, use_swiglu=True, q_norm='layernorm',
              k_norm='layernorm', adaln_type='lora', adaln_lora_dim=16,
              max_cached_len=8)
    m_ref = FiT(**kw)
    m_q = FiT(**kw, gemm_precision='int8')
    grid, mask, size = make_grid_mask_size(2, 4, 4, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16), jnp.float32)
    t = jnp.full((2,), 0.4, jnp.float32)
    y = jnp.asarray([1, 2], jnp.int32)
    params = m_ref.init(jax.random.PRNGKey(0), x, t, y, grid, mask, size)[
        'params']
    # zero-init heads (reference fit_model.py:117-157) make the init output
    # identically zero — randomize every leaf so the comparison is real
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(keys, leaves)])
    o_ref = m_ref.apply({'params': params}, x, t, y, grid, mask, size)
    o_q = m_q.apply({'params': params}, x, t, y, grid, mask, size)
    a = np.asarray(o_ref, np.float64).ravel()
    b = np.asarray(o_q, np.float64).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos
