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


def test_calibrated_static_scales():
    """calibrate_quant_scales records per-site absmax; the calibrated apply
    matches the dynamic path closely and skips the absmax reduce."""
    from fitv2_tpu.ops.quant import Int8Dense, calibrate_quant_scales
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((4, 32)) * 2.0, jnp.float32)
    d = Int8Dense(16, dtype=jnp.float32)
    params = d.init(jax.random.PRNGKey(0), x1)['params']
    calib = calibrate_quant_scales(d, params, [(x1,), (x2,)])
    assert float(calib['act_absmax']) > 0
    y_dyn = d.apply({'params': params}, x2)
    y_cal = d.apply({'params': params, 'quant_calib': calib}, x2)
    rel = float(jnp.linalg.norm(y_cal - y_dyn) /
                (jnp.linalg.norm(y_dyn) + 1e-12))
    assert rel < 0.05, rel


def test_fit_int8_calibrated_forward():
    """model-level: calibrate on one batch, serve with static scales."""
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.ops.quant import calibrate_quant_scales

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
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(keys, leaves)])
    calib = calibrate_quant_scales(m_q, params,
                                   [(x, t, y, grid, mask, size)])
    # scan-stacked sites carry a per-block leading axis
    o_ref = m_ref.apply({'params': params}, x, t, y, grid, mask, size)
    o_cal = m_q.apply({'params': params, 'quant_calib': calib},
                      x, t, y, grid, mask, size)
    a = np.asarray(o_ref, np.float64).ravel()
    b = np.asarray(o_cal, np.float64).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.99, cos


def test_build_sampler_int8_serving(tmp_path):
    """build_sampler auto-calibrates + prequantizes for an int8 model and
    produces finite latents end to end."""
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.sample.pipeline import SamplingConfig, build_sampler

    model = FiT(context_size=16, patch_size=2, in_channels=4,
                hidden_size=64, depth=2, num_heads=4, num_classes=10,
                learn_sigma=False, use_sit=True, use_swiglu=True,
                q_norm='layernorm', k_norm='layernorm', adaln_type='lora',
                adaln_lora_dim=16, max_cached_len=8, dtype=jnp.float32,
                gemm_precision='int8')
    rng = jax.random.PRNGKey(0)
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    grid, mask, size = make_grid_mask_size(1, 4, 4, 16)
    params = model.init(rng, jnp.zeros((1, 16, 16)), jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32), grid, mask, size)[
        'params']
    cfg = SamplingConfig(image_height=32, image_width=32,
                         num_sampling_steps=4, num_classes=10,
                         per_device_batch=2, dtype=jnp.float32)
    fn = build_sampler(model, params, cfg)
    out = fn(jax.random.PRNGKey(1), jnp.asarray([0, 1], jnp.int32))
    assert out.shape == (2, 4, 4, 4)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_prequantized_weights_match_dynamic():
    """prequantize_weights stores int8 kernels once; bound apply is
    bit-identical to quantize-at-apply (same math, hoisted)."""
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.ops.quant import prequantize_weights

    kw = dict(context_size=16, patch_size=2, in_channels=4, hidden_size=64,
              depth=2, num_heads=4, num_classes=10, learn_sigma=False,
              use_sit=True, use_swiglu=True, q_norm='layernorm',
              k_norm='layernorm', adaln_type='lora', adaln_lora_dim=16,
              max_cached_len=8, gemm_precision='int8')
    m = FiT(**kw)
    grid, mask, size = make_grid_mask_size(2, 4, 4, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16), jnp.float32)
    t = jnp.full((2,), 0.4, jnp.float32)
    y = jnp.asarray([1, 2], jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, t, y, grid, mask, size)[
        'params']
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(keys, leaves)])
    args = (x, t, y, grid, mask, size)
    qw = prequantize_weights(m, params, args)
    kq = jax.tree_util.tree_leaves(qw)
    assert any(l.dtype == jnp.int8 for l in kq)
    o_dyn = m.apply({'params': params}, *args)
    o_pre = m.apply({'params': params, 'quant_weights': qw}, *args)
    np.testing.assert_array_equal(np.asarray(o_dyn), np.asarray(o_pre))


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


def test_fitlwd_int8_sampler_runs():
    """gemm_precision='int8' threads into the LwD family's block stacks."""
    from fitv2_tpu.models.fit_lwd import FiTLwD
    model = FiTLwD(context_size=16, patch_size=2, in_channels=4,
                   hidden_size=32, depth=4, num_heads=2, num_classes=10,
                   number_of_perflow=2, n_patch_h=4, n_patch_w=4,
                   q_norm='layernorm', k_norm='layernorm',
                   adaln_type='lora', adaln_lora_dim=8, max_cached_len=8,
                   gemm_precision='int8')
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16), jnp.float32)
    y = jnp.asarray([0, 1], jnp.int32)
    params = model.init({'params': rng, 'label_dropout': rng}, x, y,
                        method=model.sample)['params']
    out = model.apply({'params': params}, x, y, method=model.sample)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
