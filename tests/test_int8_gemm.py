"""Fused int8 GEMM kernels (ops/int8_gemm.py) vs the XLA path in
ops/quant.py — bit-compatibility in interpret mode (CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

import fitv2_tpu.ops.int8_gemm as ig
from fitv2_tpu.ops.quant import int8_matmul, quantize_symmetric


@pytest.fixture(autouse=True)
def _interpret():
    old = ig._INTERPRET
    ig._INTERPRET = True
    yield
    ig._INTERPRET = old


def _quant_inputs(m=512, k=160, n=256, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (m, k), jnp.float32)
    w = jax.random.normal(k2, (k, n), jnp.float32) * 0.05
    bias = jax.random.normal(k3, (n,), jnp.float32)
    wq, ws = quantize_symmetric(w, axis=0)
    act_scale = jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0)
    xq = jnp.clip(jnp.round(x / act_scale), -127, 127).astype(jnp.int8)
    return x, xq, act_scale, wq, ws, bias


def test_supports_gates():
    assert ig.supports(4096, 1152, 3456)
    assert ig.supports(4096, 3072, 1152)
    assert not ig.supports(4000, 1152, 1152)   # M not tile-aligned
    assert not ig.supports(4096, 1150, 1152)   # K not sublane-aligned
    assert not ig.supports(4096, 1152, 1000)   # N not lane-aligned
    assert ig.supports_swiglu(4096, 1152, 6144)
    assert not ig.supports_swiglu(4096, 1152, 6145)


def test_bias_kernel_matches_xla_path():
    x, xq, act_scale, wq, ws, bias = _quant_inputs()
    combined = (act_scale * ws.reshape(-1)).astype(jnp.float32)
    out = ig.int8_gemm_bias(xq, wq, combined, bias, out_dtype=jnp.bfloat16)
    ref = int8_matmul(x, wq, ws.reshape(1, -1), bias,
                      out_dtype=jnp.bfloat16, act_scale=act_scale)
    assert out.dtype == jnp.bfloat16
    # scale*acc+bias may contract to an FMA in either path -> up to 1 ulp
    # of f32 before the bf16 round; compare at bf16 resolution
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=8e-3, atol=1e-6)


def test_bias_kernel_no_bias_f32_out():
    x, xq, act_scale, wq, ws, _ = _quant_inputs(m=1024, k=96, n=384, seed=1)
    combined = (act_scale * ws.reshape(-1)).astype(jnp.float32)
    out = ig.int8_gemm_bias(xq, wq, combined, None, out_dtype=jnp.float32)
    ref = int8_matmul(x, wq, ws.reshape(1, -1), None,
                      out_dtype=jnp.float32, act_scale=act_scale)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_bias_kernel_multi_tile_n():
    # N wide enough to exercise several N tiles and the scale/bias j-maps
    x, xq, act_scale, wq, ws, bias = _quant_inputs(m=512, k=64, n=3072,
                                                   seed=2)
    combined = (act_scale * ws.reshape(-1)).astype(jnp.float32)
    out = ig.int8_gemm_bias(xq, wq, combined, bias)
    ref = int8_matmul(x, wq, ws.reshape(1, -1), bias,
                      out_dtype=jnp.bfloat16, act_scale=act_scale)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=8e-3, atol=1e-6)


def test_swiglu_kernel_matches_reference_chain():
    m, k, two_h = 512, 96, 512
    h = two_h // 2
    x, xq, act_scale, wq, ws, bias = _quant_inputs(m=m, k=k, n=two_h, seed=3)
    combined = (act_scale * ws.reshape(-1)).astype(jnp.float32)
    fc2_scale = jnp.float32(0.037)

    out = ig.int8_gemm_swiglu_quant(xq, wq, combined, bias,
                                    1.0 / fc2_scale)
    assert out.dtype == jnp.int8 and out.shape == (m, h)

    # reference: XLA int8 GEMM -> f32 dequant+bias -> silu(g)*v -> requant
    y = int8_matmul(x, wq, ws.reshape(1, -1), bias, out_dtype=jnp.float32,
                    act_scale=act_scale)
    g, v = y[:, :h], y[:, h:]
    hmid = (jax.nn.silu(g) * v).astype(jnp.float32)
    ref = jnp.clip(jnp.round(hmid / fc2_scale), -127, 127).astype(jnp.int8)
    a, b = np.asarray(out, np.int32), np.asarray(ref, np.int32)
    # silu in f32 may differ by 1 ulp across implementations -> allow the
    # quantized grid to disagree by at most 1 level on a tiny fraction
    diff = np.abs(a - b)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01, (diff > 0).mean()


def test_swiglu_module_fused_matches_reference_chain():
    """SwiGLU module with use_fused_kernels: same calibrated serving
    numerics as the XLA chain (up to f32-vs-bf16 mid rounding)."""
    from flax import linen as nn
    from fitv2_tpu.models.modules import SwiGLU
    from fitv2_tpu.ops import quant
    from fitv2_tpu.ops.quant import calibrate_quant_scales, \
        prequantize_weights

    mod = SwiGLU(hidden_features=256, out_features=128, dtype=jnp.float32,
                 quantized=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 128), jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)['params']
    calib = calibrate_quant_scales(mod, params, [(x,)])
    qw = prequantize_weights(mod, params, (x,))
    variables = {'params': params, 'quant_calib': calib, 'quant_weights': qw}

    ref = np.asarray(mod.apply(variables, x))
    old = quant.use_fused_kernels
    calls = []
    orig = ig.int8_gemm_swiglu_quant
    ig.int8_gemm_swiglu_quant = \
        lambda *a, **k: calls.append(1) or orig(*a, **k)
    quant.set_fused_kernels(True)
    try:
        fused = np.asarray(mod.apply(variables, x))
    finally:
        quant.set_fused_kernels(old)
        ig.int8_gemm_swiglu_quant = orig
    assert calls, 'fused SwiGLU path did not engage'
    rel = np.linalg.norm(fused - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 0.02, rel


def test_fit_fused_serving_matches_xla_serving():
    """Whole-model serving forward: fused kernels on vs off at an
    alignment-qualifying geometry (M=2*256=512, hidden 128)."""
    from fitv2_tpu.models.fit import FiT
    from fitv2_tpu.models.grid_utils import make_grid_mask_size
    from fitv2_tpu.ops import quant
    from fitv2_tpu.ops.quant import calibrate_quant_scales, \
        prequantize_weights

    kw = dict(context_size=256, patch_size=2, in_channels=4,
              hidden_size=128, depth=2, num_heads=4, num_classes=10,
              learn_sigma=False, use_sit=True, use_swiglu=True,
              use_swiglu_large=True, q_norm='layernorm', k_norm='layernorm',
              adaln_type='lora', adaln_lora_dim=32, max_cached_len=256)
    m_q = FiT(**kw, gemm_precision='int8')
    grid, mask, size = make_grid_mask_size(2, 16, 16, 256)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 16), jnp.float32)
    t = jnp.full((2,), 0.4, jnp.float32)
    y = jnp.asarray([1, 2], jnp.int32)
    params = m_q.init(jax.random.PRNGKey(0), x, t, y, grid, mask, size)[
        'params']
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(keys, leaves)])
    args = (x, t, y, grid, mask, size)
    calib = calibrate_quant_scales(m_q, params, [args])
    qw = prequantize_weights(m_q, params, args)
    variables = {'params': params, 'quant_calib': calib,
                 'quant_weights': qw}

    ref = np.asarray(m_q.apply(variables, *args), np.float64)
    old = quant.use_fused_kernels
    calls = {'bias': 0, 'swiglu': 0}
    ob, osw = ig.int8_gemm_bias, ig.int8_gemm_swiglu_quant
    ig.int8_gemm_bias = \
        lambda *a, **k: calls.__setitem__('bias', calls['bias'] + 1) \
        or ob(*a, **k)
    ig.int8_gemm_swiglu_quant = \
        lambda *a, **k: calls.__setitem__('swiglu', calls['swiglu'] + 1) \
        or osw(*a, **k)
    quant.set_fused_kernels(True)
    try:
        fused = np.asarray(m_q.apply(variables, *args), np.float64)
    finally:
        quant.set_fused_kernels(old)
        ig.int8_gemm_bias, ig.int8_gemm_swiglu_quant = ob, osw
    # scanned blocks trace once: qkv + proj + fc2 = 3 bias kernels, 1 swiglu
    assert calls['bias'] >= 3 and calls['swiglu'] >= 1, calls
    rel = np.linalg.norm(fused - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 0.02, rel


def test_unsupported_shapes_raise():
    """Misaligned shapes must error, not silently drop tail rows: the grid
    covers floor(M/TM) tiles, so an un-gated M=*odd* call would leave the
    remainder rows unwritten."""
    xq = jnp.zeros((100, 160), jnp.int8)   # M=100 not %512
    wq = jnp.zeros((160, 256), jnp.int8)
    s = jnp.ones((256,), jnp.float32)
    with pytest.raises(ValueError, match='unsupported shape'):
        ig.int8_gemm_bias(xq, wq, s, None)
    wg = jnp.zeros((160, 512), jnp.int8)
    with pytest.raises(ValueError, match='unsupported shape'):
        ig.int8_gemm_swiglu_quant(xq, wg, jnp.ones((512,), jnp.float32),
                                  None, jnp.float32(1.0))
