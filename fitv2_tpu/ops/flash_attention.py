"""Pallas TPU flash attention with key-side padding mask.

Replaces the reference's torch SDPA call over padded variable-length token
sequences (/root/reference/fit/model/modules.py:176-202). The pairwise
``(mask_i == mask_j)`` boolean mask there is equivalent — after the
reference's own zeroing of padded query rows (modules.py:204) — to masking
padded KEYS only, which is what this kernel does with an online-softmax
blocked sweep (no (N, N) mask materialization).

Layout: q, k, v are (B, N, H, Dh). The kernel runs on (B*H) x (N/BQ) grid,
head_dim zero-padded to the 128-lane width (Dh=72 for FiTv2-XL -> 128).
Padded keys contribute exp(-inf)=0 to the online softmax; fully-masked query
rows produce 0/denom-guarded output (callers zero padded query rows anyway).

Backward: jax.custom_vjp with a recompute-based gradient (standard softmax
attention identities) built from XLA einsums — flash forward for memory,
recomputation for the backward, the usual remat tradeoff.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_NEG_INF = -1e30


def _pad_head_dim(x: Array) -> Array:
    dh = x.shape[-1]
    pad = (-dh) % _LANE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return x


def _flash_kernel(*refs, block_k: int, scale: float, masked: bool):
    """One (head, q-block): online softmax over key blocks.

    q_ref: (BQ, D); k_ref/v_ref: (N, D); mask_ref: (1, N) (present only
    when ``masked``); o_ref: (BQ, D).
    """
    if masked:
        q_ref, k_ref, v_ref, mask_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        mask_ref = None
    bq, d = q_ref.shape
    n = k_ref.shape[0]
    q = q_ref[:] * scale

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[pl.ds(i * block_k, block_k), :]
        logits = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (BQ, BK)
        if masked:
            mask_blk = mask_ref[0, pl.ds(i * block_k, block_k)]  # (BK,)
            logits = jnp.where(mask_blk[None, :] > 0, logits, _NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m, l, acc = jax.lax.fori_loop(0, n // block_k, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


def _flash_forward(q: Array, k: Array, v: Array, mask: Optional[Array],
                   block_q: int = 256, block_k: int = 256) -> Array:
    """q,k,v: (B, N, H, Dh); mask: (B, N) or None (= all keys valid; the
    mask load and the `where` leave the kernel) -> out (B, N, H, Dh)."""
    b, n, h, dh = q.shape
    scale = dh ** -0.5
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0, (n, block_q, block_k)

    # (B, N, H, D) -> (B*H, N, D), pad lanes
    def to_bh(x):
        x = _pad_head_dim(x)
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, -1)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    d = qb.shape[-1]
    masked = mask is not None

    grid = (b * h, n // block_q)
    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda ib, iq: (ib, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n, d), lambda ib, iq: (ib, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, n, d), lambda ib, iq: (ib, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [qb, kb, vb]
    if masked:
        # (B*H, 1, N): keep a 2D trailing block (TPU blocks need the last
        # two dims (8,128)-divisible or equal to the array dims)
        operands.append(
            jnp.repeat(mask.astype(jnp.float32), h, axis=0)[:, None, :])
        in_specs.append(pl.BlockSpec((None, 1, n), lambda ib, iq: (ib, 0, 0),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale,
                          masked=masked),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, block_q, d),
                               lambda ib, iq: (ib, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
    )(*operands)

    out = out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return out[..., :dh]


def _reference_attention(q, k, v, mask):
    dh = q.shape[-1]
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * dh ** -0.5
    if mask is not None:
        logits = jnp.where((mask > 0)[:, None, None, :], logits, _NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    return p, jnp.einsum('bhqk,bkhd->bqhd', p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_masked_attention(q: Array, k: Array, v: Array, mask: Array,
                           block_q: int = 256, block_k: int = 256) -> Array:
    """Flash attention with key padding mask. q,k,v: (B,N,H,Dh); mask: (B,N)."""
    return _flash_forward(q, k, v, mask, block_q, block_k)


def _fwd(q, k, v, mask, block_q, block_k):
    out = _flash_forward(q, k, v, mask, block_q, block_k)
    return out, (q, k, v, mask)


def _bwd(block_q, block_k, res, g):
    q, k, v, mask = res
    # recompute probabilities, then standard softmax-attention gradients
    p, _ = _reference_attention(q, k, v, mask)  # (B,H,Q,K) fp32
    dh = q.shape[-1]
    scale = dh ** -0.5
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum('bhqk,bqhd->bkhd', p, g32)
    dp = jnp.einsum('bqhd,bkhd->bhqk', g32, v32)
    dsoft = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum('bhqk,bkhd->bqhd', dsoft, k.astype(jnp.float32)) * scale
    dk = jnp.einsum('bhqk,bqhd->bkhd', dsoft, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


flash_masked_attention.defvjp(_fwd, _bwd)
