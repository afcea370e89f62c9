"""Pallas TPU single-block attention for short sequences (N <= ~512).

At FiTv2's native resolution (N=256 tokens) the whole attention working set
for one batch row — q/k/v (N, H*Dh) plus one (N, N) logits tile — fits in
VMEM, so softmax attention needs no HBM round trip for the logits at all.
XLA's lowering of the same einsum chain materializes the (B, H, N, N) fp32
logits and probabilities in HBM (~67 MB each for the XL sampler), which
profiling shows costs more than the matmuls it feeds.

Replaces the reference's torch SDPA call for the short-sequence case
(/root/reference/fit/model/modules.py:176-202) with key-side padding
masking (equivalent after the reference's own zeroing of padded query
rows, modules.py:204).

Grid: one invocation per batch row; q/k/v blocks are flat 2D (N, H*Dh) —
Mosaic rejects the shape casts that 3D (N, H, Dh) blocks would need for
per-head middle-axis loads/stores, while static lane slices of a 2D block
are supported. Heads are processed by an unrolled in-kernel loop: per
head, two MXU matmuls (logits, probs@v) with an fp32 softmax in between,
entirely in VMEM. The flat layout matches the qkv projection output, so no
relayout happens on either side of the kernel.

Backward: custom_vjp recomputing through the XLA reference chain.

MEASURED on v5e (B=16, N=256, H=16, Dh=72, bf16, 36-iteration scan):
this kernel 909 us/call vs the XLA einsum chain 750 us/call. The
misaligned 72-lane head slices (static, but off the 128-lane grid) and
72-wide MXU contractions cost more than the avoided logits HBM traffic —
XLA's own softmax fusion already keeps the (N, N) tile in VMEM between
the two einsums. Kept as an opt-in building block (and as the measured
record); NOT wired into the masked_attention 'auto' dispatch. A lane-
aligned head dim (Dh in {64->pad 128, 128}) is where this kernel shape
should win.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads: int,
            scale: float, masked: bool):
    """q/k/v/o: (N, H*Dh) flat; mask: (1, N) with 1=valid key."""
    n, c = q_ref.shape
    dh = c // num_heads
    if masked:
        bias = jnp.where(mask_ref[:] > 0, 0.0, _NEG_INF)  # (1, N)
    for ih in range(num_heads):
        sl = slice(ih * dh, (ih + 1) * dh)
        q = q_ref[:, sl]  # (N, Dh)
        k = k_ref[:, sl]
        v = v_ref[:, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (N, N) fp32
        if masked:
            logits = logits + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        p = (e / s).astype(v.dtype)
        o_ref[:, sl] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(q: Array, k: Array, v: Array, mask: Optional[Array],
             num_heads: int) -> Array:
    b, n, c = q.shape
    dh = c // num_heads
    scale = dh ** -0.5
    masked = mask is not None
    if mask is None:
        mask2 = jnp.ones((b, 1, n), jnp.float32)
    else:
        mask2 = mask.reshape(b, 1, n).astype(jnp.float32)
    kern = functools.partial(_kernel, num_heads=num_heads, scale=scale,
                             masked=masked)
    spec = pl.BlockSpec((None, n, c), lambda ib: (ib, 0, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((None, 1, n), lambda ib: (ib, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec, spec, spec, mspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, mask2)


def _reference(q, k, v, mask, num_heads):
    b, n, c = q.shape
    dh = c // num_heads
    qh, kh, vh = (x.reshape(b, n, num_heads, dh) for x in (q, k, v))
    logits = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    if mask is not None:
        logits = jnp.where((mask > 0)[:, None, None, :], logits,
                           float('-inf'))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, vh).reshape(b, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def block_masked_attention(q: Array, k: Array, v: Array,
                           mask: Optional[Array], num_heads: int) -> Array:
    """Single-VMEM-block softmax attention.

    q/k/v: (B, N, H*Dh) flat head-concatenated; mask: (B, N) or None.
    Returns (B, N, H*Dh).
    """
    return _forward(q, k, v, mask, num_heads)


def _fwd(q, k, v, mask, num_heads):
    return _forward(q, k, v, mask, num_heads), (q, k, v, mask)


def _bwd(num_heads, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda qq, kk, vv: _reference(qq, kk, vv, mask, num_heads), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


block_masked_attention.defvjp(_fwd, _bwd)
