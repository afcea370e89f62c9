"""Pallas TPU fused int8 GEMM kernels (W8A8 serving-path epilogue fusion).

Why: at XL serving shapes (M=4096 tokens, K/N = 1152..6144) the int8 step
spends ~6.6 ms/step in the four MXU GEMMs and ~9.7 ms/step in the SERIAL
elementwise passes between them (quantize ~3.0, dequantize ~2.8, SwiGLU
~2.4 — tools/ablate_probe.py wall-clock decomposition, PARITY.md round 3).
XLA emits the int8 dot and its dequant/activation consumers as separate
kernels: each epilogue is a full extra pass over the (M, N) int32 GEMM
output. These kernels compute the epilogue on the accumulator TILE while it
is still register/VMEM-resident — the int32 output is never materialized,
and the VPU epilogue of tile (i, j) can overlap the MXU/DMA work of tile
(i, j+1) under Mosaic's pipeline.

Two fusions cover the serving hot path (ops/quant.py int8_matmul sites):
  - ``int8_gemm_bias``: xq @ wq -> int32 -> * combined_scale + bias -> bf16
    (qkv / proj / fc2 epilogue; also fc1 in the non-SwiGLU Mlp).
  - ``int8_gemm_swiglu_quant``: the SwiGLU FFN mid-section — fc1 GEMM,
    dequant, silu(g) * v, and REQUANTIZATION to the fc2 input int8, all on
    the tile. The (M, 2*hidden) fc1 output and the (M, hidden) activation
    never touch memory; the kernel's only output is the int8 fc2 input.

Semantics match the XLA path in ops/quant.py (same operation order:
int32 -> f32, one multiply by the pre-combined row*col scale vector, f32
bias add, round to out dtype) up to f32 FMA contraction — the int32
accumulator itself is exact, so outputs agree to 1 ulp of the epilogue.

These are opt-in serving kernels (ops/quant.py dispatches on
``use_fused_kernels``); the calibrated-scale mode is required — dynamic
per-row activation scales keep the XLA path. The reference has no int8
path at all (pure torch bf16/fp32); this is TPU-native capability, cited
against the GEMM sites it accelerates: /root/reference/fit/model/
modules.py:118-131 (qkv/proj) and :247-251 (SwiGLU fc1/fc2).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INTERPRET = False  # set True in CPU tests (tests/test_int8_gemm.py)

# Tile sizes. M tiles of 512 keep the (TM, K<=3072) int8 input block and the
# (TM, TN) f32 accumulator comfortably inside VMEM with double buffering;
# TN is chosen per-call as the largest aligned divisor of N <= 1536.
_TM = 512
_TN_MAX = 1536
_LANE = 128
_SUBLANE_S8 = 32


def _pick_tn(n: int) -> Optional[int]:
    for tn in range(min(n, _TN_MAX), 0, -_LANE):
        if n % tn == 0:
            return tn
    return None


def supports(m: int, k: int, n: int) -> bool:
    """Shape gate: tile-aligned serving shapes only (XL: M=4096, K/N
    1152/3456/6144/3072 all qualify). Anything else -> XLA path."""
    return (m % _TM == 0 and k % _SUBLANE_S8 == 0 and n % _LANE == 0
            and _pick_tn(n) is not None)


def _bias_kernel(xq_ref, wq_ref, scale_ref, bias_ref, o_ref):
    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    o_ref[:] = out.astype(o_ref.dtype)


def int8_gemm_bias(xq: Array, wq: Array, scale: Array,
                   bias: Optional[Array],
                   out_dtype=jnp.bfloat16) -> Array:
    """(M, K) int8 @ (K, N) int8 with fused dequant epilogue.

    scale: (N,) f32 — the PRE-COMBINED activation*weight scale vector
    (loop-invariant in sampling scans). bias: (N,) f32 or None.
    Returns (M, N) out_dtype. Caller must check ``supports(M, K, N)``.
    """
    m, k = xq.shape
    n = wq.shape[1]
    if not supports(m, k, n):
        raise ValueError(
            f'int8_gemm_bias: unsupported shape M={m} K={k} N={n} '
            f'(need M%{_TM}==0, K%{_SUBLANE_S8}==0, lane-tileable N); '
            'gate calls with supports()')
    tn = _pick_tn(n)
    scale2 = scale.reshape(1, n).astype(jnp.float32)
    bias2 = (jnp.zeros((1, n), jnp.float32) if bias is None
             else bias.reshape(1, n).astype(jnp.float32))
    grid = (m // _TM, n // tn)
    return pl.pallas_call(
        _bias_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + k * n + 2 * m * n,
            transcendentals=0),
        interpret=_INTERPRET,
    )(xq, wq, scale2, bias2)


def _swiglu_kernel(xq_ref, wg_ref, wv_ref, sg_ref, sv_ref, bg_ref, bv_ref,
                   oscale_ref, o_ref):
    g = jax.lax.dot_general(
        xq_ref[:], wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    v = jax.lax.dot_general(
        xq_ref[:], wv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    g = g * sg_ref[:] + bg_ref[:]
    v = v * sv_ref[:] + bv_ref[:]
    h = (g * jax.nn.sigmoid(g)) * v  # silu(g) * v, f32 on the tile
    q = jnp.clip(jnp.round(h * oscale_ref[0, 0]), -127, 127)
    o_ref[:] = q.astype(jnp.int8)


def int8_gemm_swiglu_quant(xq: Array, wq: Array, scale: Array,
                           bias: Optional[Array],
                           out_scale_recip: Array) -> Array:
    """Fused SwiGLU FFN mid-section: fc1 GEMM + dequant + silu(g)*v +
    requantize to the fc2 int8 input.

    xq: (M, K) int8. wq: (K, 2H) int8 in the repo's fc1 layout
    (columns [0:H] = gate, [H:2H] = value — models/modules.py SwiGLU).
    scale: (2H,) f32 combined dequant vector; bias: (2H,) f32 or None.
    out_scale_recip: scalar f32 = 1 / fc2_act_scale (the calibrated fc2
    activation scale). Returns (M, H) int8.

    The gate/value halves ride as two separate weight inputs, so tile j
    loads matching g/v column blocks without any column permutation.
    """
    m, k = xq.shape
    two_h = wq.shape[1]
    if not supports_swiglu(m, k, two_h):
        raise ValueError(
            f'int8_gemm_swiglu_quant: unsupported shape M={m} K={k} '
            f'2H={two_h}; gate calls with supports_swiglu()')
    h = two_h // 2
    th = _pick_tn(h)
    wg, wv = wq[:, :h], wq[:, h:]
    scale = scale.astype(jnp.float32)
    sg, sv = scale[:h].reshape(1, h), scale[h:].reshape(1, h)
    if bias is None:
        bg = bv = jnp.zeros((1, h), jnp.float32)
    else:
        bias = bias.astype(jnp.float32)
        bg, bv = bias[:h].reshape(1, h), bias[h:].reshape(1, h)
    osr = jnp.asarray(out_scale_recip, jnp.float32).reshape(1, 1)
    grid = (m // _TM, h // th)
    half_spec = pl.BlockSpec((k, th), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, th), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _swiglu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            half_spec, half_spec, vec_spec, vec_spec, vec_spec, vec_spec,
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TM, th), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, h), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * two_h * k,
            bytes_accessed=m * k + k * two_h + m * h,
            transcendentals=m * h),
        interpret=_INTERPRET,
    )(xq, wg, wv, sg, sv, bg, bv, osr)


def supports_swiglu(m: int, k: int, two_h: int) -> bool:
    h = two_h // 2
    return (two_h % 2 == 0 and m % _TM == 0 and k % _SUBLANE_S8 == 0
            and h % _LANE == 0 and _pick_tn(h) is not None)
