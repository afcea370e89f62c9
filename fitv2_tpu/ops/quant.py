"""Int8 (W8A8) GEMM path for the v5e MXU's double-rate integer mode.

Why: the north-star sampler (FiTv2-XL 256-token 250-step ODE,
/root/reference/sample_fitv2_ddp.py:297-314) costs ~147 real TFLOP per
image; the v5e peaks at 197 TFLOP/s bf16 but 394 TOP/s int8, so the bf16
ceiling is ~1.34 img/s/chip while int8 GEMMs roughly double the MXU rate on
the four big per-block GEMMs (qkv / proj / fc1 / fc2 ~= 96% of step FLOPs).

Scheme — standard symmetric W8A8 with dynamic per-token activation scales
(SmoothQuant-style without the smoothing, which AdaLN's per-token modulation
makes unnecessary to fold):
  - weights: per-output-channel absmax int8, quantized ONCE per sampler call
    (the quantization depends only on loop-invariant params, so XLA's
    while-loop invariant code motion hoists it out of the 250-step scan);
  - activations: per-token (row) absmax -> round-to-nearest int8;
  - GEMM: int8 x int8 -> int32 on the MXU, dequantized by
    row_scale x col_scale into fp32, then bias/residual in bf16.

Numerics: int8 dynamic-symmetric quantization of transformer GEMMs
perturbs each linear output by <~0.4% RMS; the 250-step Euler ODE averages
independent per-step errors instead of compounding them. Accuracy remains
the caller's responsibility (this is an OPT-IN speed mode: FiT(
 gemm_precision='int8'); the default bf16 path is untouched, and FID parity
claims attach only to the bf16 path).

The reference has no counterpart (pure-torch bf16/fp32); this is
TPU-hardware-native capability, exposed like torch's quantized backends.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def quantize_symmetric(x: Array, axis: int,
                       dtype=jnp.int8) -> Tuple[Array, Array]:
    """Symmetric absmax quantization along `axis` (the contraction axis).

    Returns (q, scale) with x ~= q * scale; scale has x's shape with `axis`
    reduced (kept as 1 for broadcasting).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis,
                     keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(dtype), scale


def int8_matmul(x: Array, w_q: Array, w_scale: Array,
                bias: Optional[Array] = None,
                out_dtype=jnp.bfloat16) -> Array:
    """y = x @ dequant(w_q) with dynamic per-row int8 activation quant.

    x: (..., K) float; w_q: (K, N) int8; w_scale: (1, N) fp32.
    """
    xq, x_scale = quantize_symmetric(x, axis=-1)
    y = jax.lax.dot_general(
        xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * x_scale * w_scale.reshape(
        (1,) * (y.ndim - 1) + (-1,))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in nn.Dense computing through the int8 MXU path.

    Parameters keep nn.Dense's names/shapes/dtypes ('kernel' (K, N), 'bias'),
    so checkpoints, importers and exporters are unchanged; quantization
    happens at apply time and is loop-hoisted by XLA for sampling scans.
    """
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: nn.initializers.Initializer = \
        nn.initializers.xavier_uniform()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = x.shape[-1]
        kernel = self.param('kernel', self.kernel_init, (k, self.features),
                            jnp.float32)
        bias = (self.param('bias', self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)
        w_q, w_scale = quantize_symmetric(kernel, axis=0)
        return int8_matmul(x, w_q, w_scale.reshape(1, -1), bias,
                           out_dtype=self.dtype)
