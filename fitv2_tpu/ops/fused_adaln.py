"""Pallas fused LayerNorm + AdaLN modulation.

The FiT block computes ``modulate(LN(x), shift, scale)`` twice per block
(reference modules.py:270-273). Under XLA this chain materializes fp32
intermediates at (B, N, D) width between the LN reduction and the
modulation; profiling the XL sampler shows these elementwise fusions cost
as much as all matmuls. This kernel reads x once (bf16), does the fp32
mean/var reduction and the (1+scale)*xhat+shift epilogue in VMEM, and
writes the modulated bf16 output once.

Forward-only custom_vjp: backward recomputes with the XLA reference chain
(remat-style), keeping training correctness with zero extra residents.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_ref, shift_ref, scale_ref, o_ref, *, eps: float):
    """x: (BN_tile, D); shift/scale: (1, D) for this batch row."""
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    out = xhat * (1.0 + scale_ref[0].astype(jnp.float32)) \
        + shift_ref[0].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _forward(x: Array, shift: Array, scale: Array, eps: float,
             block_n: int) -> Array:
    b, n, d = x.shape
    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)
    grid = (b, n // block_n)
    # (B, 1, D) conditioning keeps a 2D trailing block (TPU block shapes
    # must be (8,128)-divisible or equal to the array dims)
    shift3 = shift[:, None, :]
    scale3 = scale[:, None, :]
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_n, d), lambda ib, it: (ib, it, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, d), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, d), lambda ib, it: (ib, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_n, d),
                               lambda ib, it: (ib, it, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
    )(x, shift3, scale3)


def _reference(x: Array, shift: Array, scale: Array, eps: float) -> Array:
    # One-pass moments reading x directly (each reduce fuses its own
    # convert/subtract; an explicit x.astype(f32) SHARED by reduce and
    # normalize makes XLA materialize a full f32 copy — see the same fix in
    # ops/fused_qk_rope._reference). Unlike qk_rope (near-zero-mean GEMM
    # outputs), x here is the residual stream, where a large common offset
    # across channels would make the raw E[x^2]-E[x]^2 form catastrophically
    # cancel in fp32; shifting both moments by a per-row provisional mean
    # (channel 0) keeps the one-pass economics with two-pass robustness:
    # var = E[(x-s)^2] - E[x-s]^2 for any constant s.
    s = jax.lax.slice_in_dim(x, 0, 1, axis=-1).astype(jnp.float32)
    mean_c = jnp.mean(x.astype(jnp.float32) - s, axis=-1, keepdims=True)
    mean2_c = jnp.mean(jax.lax.square(x.astype(jnp.float32) - s), axis=-1,
                       keepdims=True)
    var = jnp.maximum(mean2_c - jax.lax.square(mean_c), 0.0)
    mean = mean_c + s
    xhat = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    out = xhat * (1.0 + scale.astype(jnp.float32)[:, None, :]) \
        + shift.astype(jnp.float32)[:, None, :]
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_adaln_norm(x: Array, shift: Array, scale: Array,
                     eps: float = 1e-6, block_n: int = 256) -> Array:
    """modulate(LayerNorm_no_affine(x), shift, scale).

    x: (B, N, D); shift/scale: (B, D). Output dtype == x.dtype.
    """
    return _forward(x, shift, scale, eps, block_n)


def _fwd(x, shift, scale, eps, block_n):
    return _forward(x, shift, scale, eps, block_n), (x, shift, scale)


def _bwd(eps, block_n, res, g):
    x, shift, scale = res
    _, vjp = jax.vjp(lambda xx, sh, sc: _reference(xx, sh, sc, eps),
                     x, shift, scale)
    return vjp(g)


fused_adaln_norm.defvjp(_fwd, _bwd)


def _pick_block_n(n: int, target: int = 256) -> Optional[int]:
    """Largest divisor of n that is <= target and a multiple of 8."""
    for bn in range(min(target, n), 7, -1):
        if n % bn == 0 and bn % 8 == 0:
            return bn
    return None


def adaln_norm(x: Array, shift: Array, scale: Array, eps: float = 1e-6,
               impl: str = 'auto', quantized: bool = False) -> Array:
    """Dispatcher: Pallas on TPU, XLA reference elsewhere/on failure.

    quantized=True (the consumer is an int8 GEMM, ops/quant.py): use the
    XLA chain even on TPU — XLA fuses the downstream round/clip/cast-to-s8
    into the modulate epilogue, but CANNOT fuse into a Pallas custom-call,
    so the kernel forces an extra bf16 write + s8 re-read pass (~0.7
    ms/step at XL; seen in optimized HLO round 3)."""
    on_tpu = jax.default_backend() not in ('cpu',)
    block_n = _pick_block_n(x.shape[-2])
    # quantized steers only 'auto'; an explicit impl='pallas' still wins
    # (e.g. to benchmark the kernel inside the int8 graph)
    if impl == 'pallas' or (impl == 'auto' and not quantized and on_tpu
                            and x.shape[-1] % 128 == 0
                            and block_n is not None):
        try:
            return fused_adaln_norm(x, shift, scale, eps, block_n)
        except Exception:
            pass
    return _reference(x, shift, scale, eps)
