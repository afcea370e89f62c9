"""Pallas fused QK-LayerNorm + RoPE rotation.

Profiling the FiTv2-XL sampler shows the attention preamble — per-head
LayerNorm of q/k in fp32 followed by the rotary rotation — materializes
large intermediates between the two stages (the biggest elementwise fusions
in the trace, on par with all matmuls). This kernel does both stages in one
VMEM pass per (batch, head, token-tile): read q/k (bf16) once, fp32 LN over
the head dim, split-layout rotation with the cos/sin tables, write once.

Only the FiTv2 hot configuration is fused: no-affine 'layernorm' q/k norms
(or none) + split rope layout. Everything else falls back to the unfused
path in models/modules.py. Backward recomputes through the XLA reference
chain (custom_vjp).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(q_ref, k_ref, cos_ref, sin_ref, oq_ref, ok_ref, *,
            eps: float, norm_q: bool, norm_k: bool):
    """q/k: (BN_tile, H, Dh); cos/sin: (BN_tile, Dh). Split-layout rotation.

    Matches the _reference dtype discipline exactly: LN statistics in fp32,
    cast back to the input dtype, rotation in the input dtype.
    """
    cos = cos_ref[:][:, None, :].astype(oq_ref.dtype)
    sin = sin_ref[:][:, None, :].astype(oq_ref.dtype)
    d = q_ref.shape[-1] // 2

    def ln(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        return (xc * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    def rot(x):
        return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)

    q = q_ref[:]
    if norm_q:
        q = ln(q)
    oq_ref[:] = q * cos + rot(q) * sin

    k = k_ref[:]
    if norm_k:
        k = ln(k)
    ok_ref[:] = k * cos + rot(k) * sin


def _forward(q: Array, k: Array, cos: Array, sin: Array, eps: float,
             norm_q: bool, norm_k: bool, block_n: int
             ) -> Tuple[Array, Array]:
    """q, k: (B, N, H, Dh); cos/sin: (B, N, Dh) split-layout tables.

    Runs natively in (B, N, H, Dh) layout — blocks (block_n, H, Dh) are
    legal because the trailing dims equal the full array dims, and no
    transposes are needed on either side (an earlier head-major variant
    paid relayout copies that outweighed the fusion)."""
    b, n, h, dh = q.shape
    block_n = min(block_n, n)
    assert n % block_n == 0
    grid = (b, n // block_n)
    kern = functools.partial(_kernel, eps=eps, norm_q=norm_q, norm_k=norm_k)
    qk_spec = pl.BlockSpec((None, block_n, h, dh),
                           lambda ib, it: (ib, it, 0, 0),
                           memory_space=pltpu.VMEM)
    cs_spec = pl.BlockSpec((None, block_n, dh),
                           lambda ib, it: (ib, it, 0),
                           memory_space=pltpu.VMEM)
    oq, ok = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[qk_spec, qk_spec, cs_spec, cs_spec],
        out_specs=(qk_spec, qk_spec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype)),
    )(q, k, cos, sin)
    return oq, ok


def _reference(q, k, cos, sin, eps, norm_q, norm_k):
    """Unfused chain with the modules.py dtype discipline: LN reduces in
    fp32 then casts back, the rotation runs in the input dtype (bf16 on
    TPU) — keeping rope in fp32 here measurably regresses the sampler."""
    def ln(x):
        # One-pass moments read the bf16 input DIRECTLY with fp32
        # accumulation (dtype=f32 fuses the convert into the reduce).
        # The earlier x.astype(f32) materialized an 18.9 MB f32 relayout
        # copy per q/k per block on the XL sampler (seen in optimized HLO:
        # copy f32[16,256,1152]{1,2,0} at this line) — ~2.5 ms/step of
        # pure HBM traffic. E[x^2]-E[x]^2 in fp32 is safe here: q/k
        # projections are near-zero-mean and Dh=72 accumulation carries
        # ~2^-24 relative error, far below the bf16 output rounding.
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(jax.lax.square(x.astype(jnp.float32)), axis=-1,
                         keepdims=True, dtype=jnp.float32)
        var = jnp.maximum(mean2 - jax.lax.square(mean), 0.0)
        return ((x.astype(jnp.float32) - mean)
                * jax.lax.rsqrt(var + eps)).astype(x.dtype)

    def rot(x):
        d = x.shape[-1] // 2
        return jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)

    c = cos[:, :, None, :].astype(q.dtype)
    s = sin[:, :, None, :].astype(q.dtype)
    qn = ln(q) if norm_q else q
    kn = ln(k) if norm_k else k
    oq = qn * c + rot(qn) * s
    ok = kn * c + rot(kn) * s
    return oq, ok


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_qk_rope(q: Array, k: Array, cos: Array, sin: Array,
                  eps: float = 1e-6, norm_q: bool = True,
                  norm_k: bool = True, block_n: int = 256
                  ) -> Tuple[Array, Array]:
    return _forward(q, k, cos, sin, eps, norm_q, norm_k, block_n)


def _fwd(q, k, cos, sin, eps, norm_q, norm_k, block_n):
    return (_forward(q, k, cos, sin, eps, norm_q, norm_k, block_n),
            (q, k, cos, sin))


def _bwd(eps, norm_q, norm_k, block_n, res, g):
    q, k, cos, sin = res
    _, vjp = jax.vjp(
        lambda qq, kk, cc, ss: _reference(qq, kk, cc, ss, eps, norm_q,
                                          norm_k), q, k, cos, sin)
    return vjp(g)


fused_qk_rope.defvjp(_fwd, _bwd)


def _pick_block_n(n: int, target: int = 256) -> Optional[int]:
    for bn in range(min(target, n), 7, -1):
        if n % bn == 0 and bn % 8 == 0:
            return bn
    return None


def qk_norm_rope(q: Array, k: Array, cos: Array, sin: Array,
                 eps: float = 1e-6, norm_q: bool = True,
                 norm_k: bool = True, impl: str = 'auto'
                 ) -> Tuple[Array, Array]:
    """Dispatcher. MEASURED on v5e (FiTv2-XL sampler, 12-step scan): XLA
    reference 36.1 ms/step; Pallas in head-major (B,H,N,Dh) layout 42 ms
    (relayout transposes); Pallas natively in (B,N,H,Dh) 45.6 ms (Dh=72
    pads to 128 lanes, so every VPU op wastes 44% of the vector width and
    the H=16 sublane dim underfills tiles). XLA's unfused chain wins on
    this geometry — 'auto' uses it; impl='pallas' opts into the kernel
    (useful for lane-aligned head dims)."""
    block_n = _pick_block_n(q.shape[1])
    if impl == 'pallas' and q.shape[-1] % 2 == 0 and block_n is not None:
        try:
            return fused_qk_rope(q, k, cos, sin, eps, norm_q, norm_k,
                                 block_n)
        except Exception:
            pass
    return _reference(q, k, cos, sin, eps, norm_q, norm_k)
