"""Pallas TPU fused attention megakernel for short sequences (N <= ~1024).

Fuses the whole FiT attention chain — per-head QK-LayerNorm, split-layout
2D-RoPE rotation, scaled masked softmax attention, and padded-query zeroing —
into ONE kernel that reads the raw (B, N, 3C) qkv-projection output and
writes the (B, N, C) attention output. This replaces, per block:

  reference /root/reference/fit/model/modules.py:166-204
    qkv split -> q/k LayerNorm -> RoPE rotate -> SDPA(pairwise mask) -> x*mask

Why a megakernel wins at FiTv2's native shape (B=16, N=256, H=16, Dh=72):
  - XLA materializes the (B, H, N, N) fp32 logits AND probabilities in HBM
    (~67 MB each for the XL sampler) because a dot cannot fuse into the
    next dot; measured 750 us/call vs ~50 us of pure matmul time.
  - The preamble (LN + rotate) is bandwidth-bound: it reads and writes q/k
    twice between the qkv projection and the attention matmuls.
  - Previous partial kernels lost (a removed per-(batch)-grid flat-lane
    block kernel measured 909 us/call vs XLA's 750): a
    per-(batch*head) grid pays per-program overhead 256 times, and the
    (B, N, H, Dh=72) layout pads every VPU op 72->128 lanes. Here the grid
    is (B,) with an unrolled in-kernel head loop, all operands stay in the
    flat (N, C) lane layout the surrounding GEMMs use, and q/k/v head
    slices are taken as static 72-wide lane slices inside VMEM.

Masking: key-side padding bias, equivalent to the reference's pairwise
``(mask_i == mask_j)`` SDPA mask after its own zeroing of padded query rows
(modules.py:204) — the kernel also zeroes padded query rows itself.

Backward: jax.custom_vjp recomputing through the XLA reference chain (the
usual flash-attention remat tradeoff); gradients flow to qkv and the rope
tables.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30

# set True in tests to run the kernel in Pallas interpret mode on CPU
_INTERPRET = False


def _kernel(qkv_ref, cos_ref, sin_ref, mask_ref, o_ref, *, num_heads: int,
            eps: float, norm_q: bool, norm_k: bool, scale: float,
            masked: bool):
    """qkv: (N, 3C); cos/sin: (N, Dh) split-layout tables; mask: (1, N);
    o: (N, C)."""
    n, c3 = qkv_ref.shape
    c = c3 // 3
    dh = c // num_heads
    d = dh // 2

    cos = cos_ref[:].astype(o_ref.dtype)  # (N, Dh)
    sin = sin_ref[:].astype(o_ref.dtype)
    if masked:
        kbias = jnp.where(mask_ref[:] > 0, 0.0, _NEG_INF)  # (1, N) keys
        # padded QUERY rows are zeroed by the caller (_forward) outside the
        # kernel, where the multiply fuses into the out-projection's input.

    def ln(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return (xc * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    def rot(x):
        return jnp.concatenate([-x[:, d:], x[:, :d]], axis=-1)

    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        q = qkv_ref[:, h * dh:(h + 1) * dh]          # (N, Dh)
        k = qkv_ref[:, c + h * dh:c + (h + 1) * dh]
        v = qkv_ref[:, 2 * c + h * dh:2 * c + (h + 1) * dh]
        if norm_q:
            q = ln(q)
        if norm_k:
            k = ln(k)
        q = q * cos + rot(q) * sin
        k = k * cos + rot(k) * sin
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (N, N) fp32
        if masked:
            logits = logits + kbias
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        p = (e / s).astype(v.dtype)
        o_ref[:, sl] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(qkv: Array, cos: Array, sin: Array, mask: Optional[Array],
             num_heads: int, eps: float, norm_q: bool, norm_k: bool) -> Array:
    b, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    scale = dh ** -0.5
    masked = mask is not None
    if mask is None:
        mask2 = jnp.ones((b, 1, n), jnp.float32)
    else:
        mask2 = mask.reshape(b, 1, n).astype(jnp.float32)
    kern = functools.partial(_kernel, num_heads=num_heads, eps=eps,
                             norm_q=norm_q, norm_k=norm_k, scale=scale,
                             masked=masked)
    qkv_spec = pl.BlockSpec((None, n, c3), lambda ib: (ib, 0, 0),
                            memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec((None, n, dh), lambda ib: (ib, 0, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((None, 1, n), lambda ib: (ib, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((None, n, c), lambda ib: (ib, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[qkv_spec, cs_spec, cs_spec, m_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        interpret=_INTERPRET,
    )(qkv, cos.astype(qkv.dtype), sin.astype(qkv.dtype), mask2)
    if masked:
        # zero padded query rows (reference modules.py:204); fuses into the
        # following out-projection's input elementwise chain.
        out = out * mask.astype(out.dtype)[..., None]
    return out


def _reference_chain(qkv: Array, cos: Array, sin: Array,
                     mask: Optional[Array], num_heads: int, eps: float,
                     norm_q: bool, norm_k: bool) -> Array:
    """Unfused XLA chain with identical dtype discipline (bf16 rope, fp32
    LN stats / softmax); used for the custom_vjp backward and CPU tests."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    dh = c // num_heads
    q, k, v = (p.reshape(b, n, num_heads, dh)
               for p in jnp.split(qkv, 3, axis=-1))

    def ln(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    def rot(x):
        d = x.shape[-1] // 2
        return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)

    cs = cos[:, :, None, :].astype(q.dtype)
    sn = sin[:, :, None, :].astype(q.dtype)
    if norm_q:
        q = ln(q)
    if norm_k:
        k = ln(k)
    q = q * cs + rot(q) * sn
    k = k * cs + rot(k) * sn
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * dh ** -0.5
    if mask is not None:
        logits = jnp.where((mask > 0)[:, None, None, :], logits, _NEG_INF)
    p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum('bhqk,bkhd->bqhd', p, v).reshape(b, n, c)
    if mask is not None:
        out = out * mask.astype(out.dtype)[..., None]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_qkln_rope_attention(qkv: Array, cos: Array, sin: Array,
                              mask: Optional[Array], num_heads: int,
                              eps: float = 1e-6, norm_q: bool = True,
                              norm_k: bool = True) -> Array:
    """Fused qk-LN + split-RoPE + masked attention.

    Args:
      qkv: (B, N, 3C) flat projection output, head-concatenated
           [q_0..q_H | k_0..k_H | v_0..v_H] with Dh = C // num_heads.
      cos, sin: (B, N, Dh) split-layout rope tables (models/rope.py).
      mask: (B, N) padding mask (1=valid) or None.
    Returns: (B, N, C) attention output with padded query rows zeroed.
    """
    return _forward(qkv, cos, sin, mask, num_heads, eps, norm_q, norm_k)


def _fwd(qkv, cos, sin, mask, num_heads, eps, norm_q, norm_k):
    out = _forward(qkv, cos, sin, mask, num_heads, eps, norm_q, norm_k)
    return out, (qkv, cos, sin, mask)


def _bwd(num_heads, eps, norm_q, norm_k, res, g):
    qkv, cos, sin, mask = res
    _, vjp = jax.vjp(
        lambda a, cc, ss: _reference_chain(a, cc, ss, mask, num_heads, eps,
                                           norm_q, norm_k), qkv, cos, sin)
    dqkv, dcos, dsin = vjp(g)
    return dqkv, dcos, dsin, None


fused_qkln_rope_attention.defvjp(_fwd, _bwd)


def supports(n: int, c: int, num_heads: int, rope_layout: str,
             q_norm: Optional[str], k_norm: Optional[str],
             qk_norm_weight: bool, add_rel_pe_to_v: bool,
             save_attention: bool) -> bool:
    """Static eligibility for the fused kernel (the FiTv2 hot configuration)."""
    dh = c // num_heads
    return (jax.default_backend() not in ('cpu',)
            and rope_layout == 'split'
            and not qk_norm_weight and not add_rel_pe_to_v
            and not save_attention
            and q_norm in (None, 'layernorm')
            and k_norm in (None, 'layernorm')
            and dh % 2 == 0
            and n % 8 == 0
            and n * (3 * c + c) * 2 + n * n * 4 < 12 * 2 ** 20  # VMEM budget
            )
