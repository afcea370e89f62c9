"""Pallas TPU attention-core kernel (round-3 economics).

Scope: ONLY the bounded-softmax attention core — q/k/v already LayerNormed
and RoPE-rotated (that preamble measures free in the XLA chain,
tools/ablate_probe.py: -0.2 ms/step). The monolithic XLA core costs
5.37 ms/step on the XL int8 sampler (batch 8) because the (B, H, N, N) bf16
logits round-trip HBM (~33.5 MB x write+read per block); everything else
per block is VMEM-resident at this batch. This kernel keeps logits/probs in
VMEM: per grid program (one batch element) it loops over heads, computes
the (N, N) logits tile, exponentiates (no max pass — the caller guarantees
|logit| <= sqrt(Dh) via no-affine q/k LayerNorm), and divides the AV output
by the row sums.

Differences from the retired megakernel attempts (ops/fused_attention.py):
  - head-major (B, H, N, Dh) inputs: head slices are LEADING-dim slices of
    the VMEM block — no 72-wide unaligned lane slicing;
  - no LN / RoPE / mask passes in-kernel (XLA fuses those for free);
  - bounded softmax: exp directly on the f32 dot accumulator, denominator
    applied to the (N, Dh) AV output instead of the (N, N) probs.

Masking (padded keys) is handled by a key bias row; padded-query zeroing
stays with the caller (fuses into the proj input chain).

Reference semantics: /root/reference/fit/model/modules.py:181-204.

MEASURED RESULT (v5e, XL int8 sampler, batch 8, tools/ablate_probe.py
'core'): 35.8 ms/step vs the XLA chain's 20.5 — ~560 us/block against
XLA's 149. Third kernel design to lose at N=256/Dh=72 (round-1 per-head
grid 909 us, round-1/2 flat-lane megakernel 544 us): Mosaic serializes the
32 small per-head dots where XLA's batched dot keeps the MXUs full, and
that deficit dwarfs the 67 MB/block logits round-trip it avoids. Kept as
an opt-in (attn_impl='pallas_core') with this record so the experiment is
not repeated; 'auto' uses the XLA chain.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_INTERPRET = False  # set True in CPU tests


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """q/k/v/o: (H, N, Dh) VMEM blocks for one batch element."""
    h, n, dh = q_ref.shape
    for i in range(h):
        q = q_ref[i]  # (N, Dh)
        k = k_ref[i]
        v = v_ref[i]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (N, N) f32
        e = jnp.exp(logits)
        s = jnp.sum(e, axis=-1, keepdims=True)  # (N, 1) f32
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, Dh) f32
        o_ref[i] = (o / s).astype(o_ref.dtype)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    """bias: (1, N) additive key bias (0 valid, -1e30 padded)."""
    h, n, dh = q_ref.shape
    bias = bias_ref[:]  # (1, N)
    for i in range(h):
        q = q_ref[i]
        k = k_ref[i]
        v = v_ref[i]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias
        e = jnp.exp(logits)
        s = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[i] = (o / s).astype(o_ref.dtype)


def _xla_core(q: Array, k: Array, v: Array, mask: Optional[Array]) -> Array:
    """Same math, unfused (head-major): custom_vjp backward + CPU path."""
    dh = q.shape[-1]
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * dh ** -0.5
    if mask is not None:
        logits = logits + jnp.where(mask > 0, 0.0,
                                    -1e30)[:, None, None, :]
    e = jnp.exp(logits)
    s = jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.einsum('bhqk,bhkd->bhqd', e.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return (o / s).astype(v.dtype)


@jax.custom_vjp
def attention_core(q: Array, k: Array, v: Array,
                   mask: Optional[Array] = None) -> Array:
    """Bounded-softmax attention on head-major tensors.

    q, k, v: (B, H, N, Dh) — bf16 on TPU; mask: optional (B, N) key
    validity. Returns (B, H, N, Dh). Caller contract: q and k are
    LayerNormed per head (bounded logits) and padded-query outputs are
    zeroed downstream.
    """
    return _forward(q, k, v, mask)


def _forward(q: Array, k: Array, v: Array,
             mask: Optional[Array] = None) -> Array:
    b, h, n, dh = q.shape
    scale = dh ** -0.5
    spec = pl.BlockSpec((None, h, n, dh), lambda ib: (ib, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(q.shape, v.dtype)
    if mask is None:
        return pl.pallas_call(
            functools.partial(_kernel, scale=scale),
            grid=(b,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=out_shape,
            interpret=_INTERPRET,
        )(q, k, v)
    bias = jnp.where(mask > 0, 0.0, -1e30).astype(jnp.float32)
    bias = bias.reshape(b, 1, n)
    bias_spec = pl.BlockSpec((None, 1, n), lambda ib: (ib, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_masked, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec, bias_spec],
        out_specs=spec,
        out_shape=out_shape,
        interpret=_INTERPRET,
    )(q, k, v, bias)


def _fwd(q, k, v, mask):
    return _forward(q, k, v, mask), (q, k, v, mask)


def _bwd(res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda qq, kk, vv: _xla_core(qq, kk, vv, mask), q, k, v)
    return vjp(g) + (None,)


attention_core.defvjp(_fwd, _bwd)
