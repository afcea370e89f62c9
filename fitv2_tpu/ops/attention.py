"""Mask-aware attention for padded variable-length token sequences.

The reference feeds SDPA a pairwise boolean mask `(mask_i == mask_j)` built
from the 0/1 padding mask and then zeroes padded query outputs
(/root/reference/fit/model/modules.py:176-204). After that zeroing, the result
is identical to key-side padding masking (valid queries never attend padded
keys; padded query rows are discarded), which is what we implement — it is
cheaper (no (B, N, N) bool materialization feeding the kernel) and maps onto a
flash-attention kernel with a key mask.

Two implementations:
  - 'xla'    : jnp einsum + softmax; XLA fuses this well for short sequences
               (N in {256, 1024}) and arbitrary head_dim (FiTv2 uses Dh=72).
  - 'pallas' : a flash-attention TPU kernel (fitv2_tpu/ops/flash_attention.py)
               with online softmax; preferable for long sequences.
  - 'auto'   : picks per-shape (benchmark-informed: XLA wins at N<=1024 with
               Dh=72 because flash tiling pads 72 -> 128 lanes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = float('-inf')


def _xla_masked_attention(q: Array, k: Array, v: Array,
                          mask: Optional[Array],
                          bounded_logits: bool = False) -> Array:
    """q, k, v: (B, N, H, Dh); mask: (B, N) with 1=valid, 0=pad.

    The (B, H, N, N) logits/probs round-trips through HBM are the entire
    cost of this chain at short N (measured ~206 us/block at the XL shape,
    ~= the bandwidth floor of fp32 logits + bf16 probs). For bf16 inputs the
    MATERIALIZED logits are kept bf16 (halving that traffic) while the
    softmax arithmetic still runs in fp32 inside the fusion — registers,
    not HBM. Precision: bf16 rounding of logits (relative 2^-8) perturbs
    post-softmax probs ~1e-3, comparable to the reference's own bf16-input
    SDPA; fp32 inputs (CPU golden tests) keep full fp32 logits.

    bounded_logits: set by the caller when BOTH q and k are LayerNormed
    per head with no affine weight (the FiTv2 hot config) — then every row
    has L2 norm exactly sqrt(Dh), so |logit| <= sqrt(Dh) (~8.5 at Dh=72)
    and exp cannot overflow. The softmax max-subtraction (a full extra
    reduce + subtract pass over the (B,H,N,N) tensor, ~75 us/block
    measured) is skipped; masked keys get exp=0 directly.
    """
    dh = q.shape[-1]
    scale = dh ** -0.5
    acc = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=acc) * jnp.asarray(
                            scale, acc)
    key_valid = None if mask is None else (mask > 0)[:, None, None, :]
    if bounded_logits:
        e = jnp.exp(logits.astype(jnp.float32))
        if key_valid is not None:
            e = jnp.where(key_valid, e, 0.0)
        e = e.astype(v.dtype)
        # Softmax denominator folded INTO the AV matmul: a ones column
        # appended to v makes the dot emit row sums alongside the
        # numerator (the MXU pads Dh=72 to 128 lanes regardless, so the
        # extra column is free compute) and the separate sum-reduction
        # pass over the (B, H, N, N) tensor disappears. Measured
        # end-to-end NEUTRAL on the XL sampler (0.955 vs 0.957 img/s,
        # within noise) — kept for the simpler op graph and the fp32
        # dot-accumulated denominator (slightly better precision than a
        # bf16-cast sum).
        b, n, h, _ = v.shape
        v_ext = jnp.concatenate(
            [v, jnp.ones((b, n, h, 1), v.dtype)], axis=-1)
        o_ext = jnp.einsum('bhqk,bkhd->bqhd', e, v_ext,
                           preferred_element_type=jnp.float32)
        return (o_ext[..., :dh] / o_ext[..., dh:]).astype(v.dtype)
    if key_valid is not None:
        logits = jnp.where(key_valid, logits, jnp.asarray(_NEG_INF, acc))
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    e = jnp.exp((logits - m).astype(jnp.float32))
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, v)


def _xla_chunked_attention(q: Array, k: Array, v: Array,
                           mask: Optional[Array],
                           chunk: int = 64) -> Array:
    """Query-chunked bounded-softmax attention (round-3 VERDICT #1).

    Ablation (tools/ablate_probe.py) measured the monolithic XLA chain at
    5.37 ms/step on the XL int8 sampler (batch 8): the (B, H, N, N) bf16
    logits tensor (33.5 MB) exceeds XLA's alternate-memory budget, so the
    probs round-trip HBM (~2.9 ms/step of pure traffic) even though every
    OTHER large per-block intermediate is VMEM-resident at this batch.
    Splitting queries into `chunk`-row tiles keeps each logits tile at
    (B, H, chunk, N) — small enough for the alternate-memory assigner —
    removing the round trip without a custom kernel. Same math as the
    bounded path in _xla_masked_attention (exp without max-subtraction,
    denominator folded into the AV dot via a ones column); requires
    LayerNormed q AND k (|logit| <= sqrt(Dh)).
    """
    b, n, h, dh = q.shape
    scale = dh ** -0.5
    acc = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    key_valid = None if mask is None else (mask > 0)[:, None, None, :]
    v_ext = jnp.concatenate([v, jnp.ones((b, n, h, 1), v.dtype)], axis=-1)
    outs = []
    for i in range(0, n, chunk):
        qc = q[:, i:i + chunk]
        logits = jnp.einsum('bqhd,bkhd->bhqk', qc, k,
                            preferred_element_type=acc) * jnp.asarray(
                                scale, acc)
        e = jnp.exp(logits.astype(jnp.float32))
        if key_valid is not None:
            e = jnp.where(key_valid, e, 0.0)
        e = e.astype(v.dtype)
        o_ext = jnp.einsum('bhqk,bkhd->bqhd', e, v_ext,
                           preferred_element_type=jnp.float32)
        outs.append((o_ext[..., :dh] / o_ext[..., dh:]).astype(v.dtype))
    return jnp.concatenate(outs, axis=1)


# Measured dead end (round 2): int8 attention. Int8 probabilities cannot
# use a fixed scale — e = exp(logits) spans (0, e^sqrt(Dh)] so a global
# scale saturates and any per-row normalization reintroduces the extra
# (B, H, N, N) pass the scheme was meant to remove; int8 QK dots alone
# lose because the int32 logits double the materialization traffic
# (236 MB/block vs the bf16 chain's 136 MB) for ~0.5 ms of MXU saving.
# Keeping probabilities out of HBM entirely is flash-kernel territory,
# which the 72-lane head dim already rules out at these shapes (see the
# dispatch history below).


def masked_attention(q: Array, k: Array, v: Array, mask: Optional[Array] = None,
                     impl: str = 'auto',
                     bounded_logits: bool = False,
                     quantized: bool = False) -> Array:
    """Scaled dot-product attention with key-side padding mask.

    Args:
      q, k, v: (B, N, H, Dh)
      mask: (B, N) float/bool, nonzero = valid token. The caller is responsible
        for zeroing padded query outputs (done in modules.Attention to mirror
        reference modules.py:204).
      impl: 'auto' | 'xla' | 'pallas'
      bounded_logits: caller guarantees |logits| is bounded well below the
        exp overflow threshold (q/k both LayerNormed) — enables the
        max-subtraction-free softmax in the XLA path.
      quantized: accepted for dispatch uniformity; attention itself stays
        bf16 in the int8 serving mode (see the dead-end note above).
    Returns: (B, N, H, Dh)
    """
    n = q.shape[1]
    # Dispatch history on v5e (H=16, Dh=72, bf16):
    #   round 1 (fp32 logits XLA): flash won at N>=1024 (2.15 vs 2.74 ms,
    #   B=8) and lost at N=256 — 'auto' selected it for long sequences.
    #   round 2: bf16 materialized logits + the bounded-logits softmax
    #   (no max pass) cut the XLA chain ~4x at N=1024 (316 vs flash's
    #   520 us/call at b2=4) — XLA now wins at BOTH N=256 and N=1024,
    #   so 'auto' never picks the Pallas kernel; impl='pallas' opts in
    #   (e.g. for sequences long enough that even bf16 (B,H,N,N) logits
    #   do not fit in HBM).
    #   round 3 (XL int8 sampler, batch 8, tools/ablate_probe.py): the XLA
    #   chain measures 5.37 ms/step = ~149 us/block, ~= its serial
    #   traffic+matmul budget (bf16 logits round-trip 67 MB + ~75 us
    #   batched-dot time). Both alternatives measured WORSE end-to-end:
    #   'xla_chunked' 64-query tiles 38.4 vs 20.5 ms/step (the tiles did
    #   not earn alternate-memory residency; 4x smaller dots lost more than
    #   the traffic saved), and the head-major grid=(B,) Pallas core
    #   (ops/attention_core.py) 35.8 ms/step (~560 us/block — the third
    #   kernel design to lose 3.5-6x against XLA's batched dots at
    #   N=256/Dh=72). 'auto' stays on the monolithic XLA chain.
    #   round 4 — the sweep's CLOSING measurement (VERDICT r3 #8): the one
    #   untried geometry was lane-padding INSIDE a fused kernel. The flash
    #   kernel already zero-pads Dh 72->128 before its fused
    #   online-softmax sweep (flash_attention._pad_head_dim), so it IS
    #   that design; measured on the XL int8 bench workload
    #   (tools/ablate_probe.py full vs flash): 28.25 vs 21.62 ms/step —
    #   aligned lanes do not rescue it either, because the padded kernel
    #   moves 128/72 = 1.78x the q/k/v bytes and Mosaic's per-grid-cell
    #   dots still underrun XLA's batched dot at these tile sizes. Six
    #   designs measured, six losses; the sweep is CLOSED at this
    #   geometry. The kernel remains the opt-in for contexts whose
    #   (B, H, N, N) bf16 logits exceed HBM (N >~ 8k at XL batch 8).
    if impl == 'pallas':
        try:
            from fitv2_tpu.ops.flash_attention import flash_masked_attention
            return flash_masked_attention(q, k, v, mask)
        except Exception:
            pass  # fall back to XLA (e.g. CPU tests, unsupported shapes)
    if impl in ('pallas_core', 'xla_chunked') and not bounded_logits:
        # both alternatives use the max-subtraction-free softmax, which is
        # only safe when the caller guarantees bounded logits (q/k both
        # LayerNormed). A silent XLA substitution here would make "measuring
        # the alternative" record the wrong implementation — fail loudly.
        raise ValueError(
            f'impl={impl!r} requires bounded_logits=True (QK-norm); '
            "use impl='auto'/'xla' for unbounded logits")
    if impl == 'pallas_core':
        try:
            from fitv2_tpu.ops.attention_core import attention_core
            qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            return attention_core(qh, kh, vh, mask).transpose(0, 2, 1, 3)
        except Exception:
            pass  # fall back to XLA (e.g. CPU without interpret mode)
    if impl == 'xla_chunked':
        # explicit opt-in: no shape gate — the slicing loop handles a short
        # final chunk; only the bounded-softmax requirement is semantic
        # (exp without max-subtraction needs |logit| <= sqrt(Dh))
        return _xla_chunked_attention(q, k, v, mask)
    return _xla_masked_attention(q, k, v, mask, bounded_logits)
