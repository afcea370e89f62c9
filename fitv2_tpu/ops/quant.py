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

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# Fused Pallas GEMM+epilogue kernels (ops/int8_gemm.py): dequant/bias (and
# the SwiGLU mid-section) computed on the accumulator tile instead of as
# separate full passes over the int32 GEMM output. Measured on-chip
# (tools/fused_gemm_probe.py, v5e, XL bench workload): the fused path LOSES
# — 6725 vs 5458 ms per 250-step scan (1.19 vs 1.47 img/s). The epilogue
# savings (~5 ms/step of elementwise) are outweighed by Mosaic's int8 dot
# running well below XLA's batched int8 GEMM rate at these shapes — the
# same Mosaic-vs-XLA-GEMM economics that sank the round-2/3 attention
# kernels. Kept OPT-IN for contexts where the tradeoff differs; only the
# calibrated-scale serving mode qualifies (dynamic per-row scales keep XLA).
use_fused_kernels = False


def set_fused_kernels(enabled: bool) -> None:
    """Enable/disable the Pallas fused int8 GEMM serving kernels globally."""
    global use_fused_kernels
    use_fused_kernels = bool(enabled)


class QuantParts(NamedTuple):
    """Raw serving-mode pieces of an Int8Dense site (for cross-module
    fusions like the SwiGLU FFN kernel)."""
    w_q: Array          # (K, N) int8
    w_scale: Array      # (N,) f32 per-output-channel
    bias: Optional[Array]
    act_scale: Array    # () f32 calibrated activation scale


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
                out_dtype=jnp.bfloat16,
                act_scale: Optional[Array] = None) -> Array:
    """y = x @ dequant(w_q) with int8 activation quant.

    x: (..., K) float; w_q: (K, N) int8; w_scale: (1, N) fp32.
    act_scale: optional precomputed scalar scale (static calibrated mode —
    the absmax reduce disappears and the scale/round/cast fuses into the
    producer of x); None = dynamic per-row absmax.
    """
    if act_scale is None:
        xq, x_scale = quantize_symmetric(x, axis=-1)
    else:
        # static scalar scale: quantize by a HOISTED reciprocal multiply
        # (a per-element divide costs several VPU cycles vs 1 for mul, on
        # ~27M quantized elements per XL block)
        x_scale = act_scale.astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / x_scale)),
                      -127, 127).astype(jnp.int8)
        if use_fused_kernels:
            from fitv2_tpu.ops import int8_gemm as ig
            m = math.prod(x.shape[:-1])
            k, n = w_q.shape
            if ig.supports(m, k, n):
                combined = (x_scale * w_scale.reshape(-1)).astype(
                    jnp.float32)
                out = ig.int8_gemm_bias(xq.reshape(m, k), w_q, combined,
                                        bias, out_dtype=out_dtype)
                return out.reshape(x.shape[:-1] + (n,))
    y = jax.lax.dot_general(
        xq, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    w_scale_b = w_scale.reshape((1,) * (y.ndim - 1) + (-1,))
    if act_scale is not None:
        # fold scalar row scale x col scales into ONE (1, N) vector BEFORE
        # the elementwise dequant: XLA does not reassociate f32 products,
        # so y*x_scale*w_scale costs two full passes over the GEMM output;
        # the combined vector is loop-invariant and hoists out of the
        # sampling scan. (Dynamic mode keeps the two-factor form: its
        # per-row x per-col product would materialize a full (..., N) scale.)
        out = y.astype(jnp.float32) * (x_scale * w_scale_b)
    else:
        out = y.astype(jnp.float32) * x_scale * w_scale_b
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


class Int8Dense(nn.Module):
    """Drop-in nn.Dense computing through the int8 MXU path.

    Parameters keep nn.Dense's names/shapes/dtypes ('kernel' (K, N), 'bias'),
    so checkpoints, importers and exporters are unchanged; quantization
    happens at apply time and is loop-hoisted by XLA for sampling scans.

    Activation scales: dynamic per-row absmax by default. When a calibrated
    ``quant_calib`` collection is bound (see ``calibrate_quant_scales``),
    the stored per-site scalar absmax is used instead — the absmax reduce
    disappears from the hot path. During a calibration pass
    (apply(..., mutable=['quant_calib'])) the site records
    max(127-quantile absmax seen) while still computing dynamically.
    """
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: nn.initializers.Initializer = \
        nn.initializers.xavier_uniform()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: Array,
                 return_quant_parts: bool = False
                 ) -> Array | Optional[QuantParts]:
        k = x.shape[-1]
        kernel = self.param('kernel', self.kernel_init, (k, self.features),
                            jnp.float32)
        bias = (self.param('bias', self.bias_init, (self.features,),
                           jnp.float32) if self.use_bias else None)

        # Weight quantization. Inside a sampling scan the per-block stacked
        # kernels make the quantize a PER-BLOCK computation XLA cannot hoist
        # out of the outer step loop (LICM does not lift whole inner loops),
        # so re-quantizing costs ~2 ms/step at XL. ``prequantize_weights``
        # stores int8 kernels + scales in the ``quant_weights`` collection
        # once; when bound, the bf16 kernels are dead and DCE'd.
        prepping = self.is_mutable_collection('quant_weights')
        if prepping or self.has_variable('quant_weights', 'kernel_q'):
            wq_v = self.variable('quant_weights', 'kernel_q',
                                 lambda: quantize_symmetric(kernel, 0)[0])
            ws_v = self.variable('quant_weights', 'w_scale',
                                 lambda: quantize_symmetric(kernel, 0)[1])
            if prepping:
                wq_v.value, ws_v.value = quantize_symmetric(kernel, axis=0)
            w_q, w_scale = wq_v.value, ws_v.value
        else:
            w_q, w_scale = quantize_symmetric(kernel, axis=0)

        calibrating = self.is_mutable_collection('quant_calib')
        has_scale = self.has_variable('quant_calib', 'act_absmax')
        if return_quant_parts:
            # Cross-module fusion hook (e.g. the SwiGLU FFN kernel): expose
            # the site's serving pieces WITHOUT computing the GEMM. `x` only
            # fixes the kernel shape; its values are untouched. Only the
            # calibrated serving mode qualifies — during calibration the
            # caller must run the normal chain so act_absmax keeps
            # recording, so return None to force the fallback.
            if calibrating or not has_scale:
                return None
            amax_var = self.variable('quant_calib', 'act_absmax',
                                     lambda: jnp.zeros((), jnp.float32))
            act_scale = jnp.maximum(amax_var.value, 1e-12) / 127.0
            return QuantParts(w_q, w_scale.reshape(-1), bias, act_scale)
        if calibrating or has_scale:
            amax_var = self.variable('quant_calib', 'act_absmax',
                                     lambda: jnp.zeros((), jnp.float32))
            if calibrating:
                batch_amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
                amax_var.value = jnp.maximum(amax_var.value, batch_amax)
            else:
                amax = jnp.maximum(amax_var.value, 1e-12)
                return int8_matmul(x, w_q, w_scale.reshape(1, -1), bias,
                                   out_dtype=self.dtype,
                                   act_scale=amax / 127.0)
        return int8_matmul(x, w_q, w_scale.reshape(1, -1), bias,
                           out_dtype=self.dtype)


def prequantize_weights(model, params, example_args, method=None,
                        rngs=None):
    """One-time weight quantization pass; returns the ``quant_weights``
    collection (int8 kernels + per-channel scales, scan-stacked where the
    model scans). Bind it at serving time together with ``params``:
        model.apply({'params': p, 'quant_weights': qw}, *args)

    method/rngs are forwarded to model.apply (e.g. models whose __call__
    trains label dropout, like FiTLwD.init_all, need a 'label_dropout' rng).
    """
    _, mut = model.apply({'params': params}, *example_args,
                         mutable=['quant_weights'], method=method,
                         rngs=rngs)
    return mut['quant_weights']


def calibrate_quant_scales(model, params, apply_batches,
                           variables_extra: Optional[Dict] = None,
                           method=None, rngs=None):
    """Run calibration forwards and return the ``quant_calib`` collection.

    apply_batches: iterable of argument-tuples for ``model.apply`` (the
    positional args after the variables dict). Returns the folded
    quant_calib tree; bind it at serving time:
        model.apply({'params': p, 'quant_calib': calib}, *args)

    method/rngs are forwarded to model.apply (see prequantize_weights).
    """
    calib = {}
    for args in apply_batches:
        variables = {'params': params, **(variables_extra or {})}
        if calib:
            variables['quant_calib'] = calib
        _, mut = model.apply(variables, *args, mutable=['quant_calib'],
                             method=method, rngs=rngs)
        calib = mut['quant_calib']
    return calib
