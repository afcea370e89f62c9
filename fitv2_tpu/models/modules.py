"""FiT transformer building blocks (flax.linen), TPU-native.

Reimplements the reference module zoo (/root/reference/fit/model/modules.py:19-296)
with JAX idioms:
  - padded variable-length sequences are handled with a key-side padding mask +
    post-attention query zeroing, which is numerically identical (after the
    reference's own `x * mask` at modules.py:204) to the pairwise
    `(mask_i == mask_j)` boolean mask it feeds to SDPA (modules.py:176-178)
    — padded query rows are zeroed before the output projection either way.
  - norms are computed in float32 regardless of the compute dtype.
  - RoPE tables are computed outside the block stack and passed in.

Parameter layout is chosen so the PyTorch checkpoint importer is a pure
transpose + rename (see fitv2_tpu/ckpt/torch_import.py).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fitv2_tpu.models.rope import apply_rope
from fitv2_tpu.ops.attention import masked_attention

Array = jax.Array
Dtype = Any

# PyTorch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == uniform(+-1/sqrt(fan_in));
# the reference overrides most weights with xavier_uniform + zero bias
# (fit_model.py:117-157), which we mirror here.
xavier = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros_init()
normal02 = nn.initializers.normal(stddev=0.02)


def _expand_mod(m: Array, x: Array) -> Array:
    """Broadcast a modulation tensor against (B, N, D) tokens.

    (B, D) global conditioning -> (B, 1, D); (B, N, D) per-token conditioning
    (LwD shared-encoder variants, fit_model_lwd_bk.py c_repre) passes through.
    """
    return m[:, None, :] if m.ndim == x.ndim - 1 else m


def modulate(x: Array, shift: Array, scale: Array) -> Array:
    """AdaLN modulation: x * (1 + scale) + shift (reference fit/model/utils.py:6)."""
    return x * (1.0 + _expand_mod(scale, x)) + _expand_mod(shift, x)


def norm_modulate(x: Array, shift: Array, scale: Array, norm_type: str,
                  norm_module_fn, eps: float = 1e-6,
                  quantized: bool = False) -> Array:
    """modulate(norm(x), shift, scale), fused on TPU when possible.

    The plain no-affine LayerNorm + global (B, D) conditioning case — the
    hot path of every FiT block — dispatches to the Pallas fused kernel
    (fitv2_tpu/ops/fused_adaln.py); every other combination (weighted norms,
    per-token conditioning) uses the reference chain via ``norm_module_fn``.
    quantized marks the consumer as an int8 GEMM (the dispatcher then
    prefers the XLA chain so the s8 cast fuses in).
    """
    if ((norm_type or 'none') == 'layernorm' and shift.ndim == 2
            and scale.ndim == 2):
        from fitv2_tpu.ops.fused_adaln import adaln_norm
        return adaln_norm(x, shift, scale, eps, quantized=quantized)
    return modulate(norm_module_fn(x), shift, scale)


def _norm_no_affine(x: Array, eps: float = 1e-6) -> Array:
    """LayerNorm without affine params, computed in fp32 (torch LN parity)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LayerNorm(nn.Module):
    """create_norm parity (reference fit/model/norms.py:19-50).

    norm_type: 'layernorm' (no affine), 'w_layernorm' (weight only),
    'rmsnorm'/'w_rmsnorm' (weight), 'none'/None (identity).
    """
    norm_type: Optional[str] = 'layernorm'
    eps: float = 1e-6
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nt = (self.norm_type or 'none').lower()
        if nt in ('none', ''):
            return x
        if nt in ('layernorm', 'w_layernorm'):
            y = _norm_no_affine(x, self.eps)
            if nt == 'w_layernorm':
                w = self.param('weight', nn.initializers.ones_init(),
                               (x.shape[-1],), self.param_dtype)
                y = y * w.astype(y.dtype)
            return y
        if nt in ('rmsnorm', 'w_rmsnorm'):
            x32 = x.astype(jnp.float32)
            y = (x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                                     + self.eps)).astype(x.dtype)
            w = self.param('weight', nn.initializers.ones_init(),
                           (x.shape[-1],), self.param_dtype)
            return y * w.astype(y.dtype)
        raise NotImplementedError(f'Unknown norm_type: {self.norm_type!r}')


class Dense(nn.Dense):
    """nn.Dense defaulting to xavier-uniform kernel / zero bias (reference init)."""
    kernel_init: Callable = xavier
    bias_init: Callable = zeros


def _dense(quantized: bool):
    """Dense factory for the hot GEMMs: bf16 MXU by default, int8 (W8A8,
    394 TOP/s on v5e — double the bf16 rate) when the model opts in via
    FiT(gemm_precision='int8'). Param trees are identical either way."""
    if quantized:
        from fitv2_tpu.ops.quant import Int8Dense
        return Int8Dense
    return Dense


class PatchEmbedder(nn.Module):
    """Linear projection of p**2*C latent patches (reference modules.py:19-37)."""
    embed_dim: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Dense(self.embed_dim, use_bias=self.use_bias, dtype=self.dtype,
                     name='proj')(x)


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding -> 2-layer SiLU MLP (modules.py:39-76).

    NOTE parity detail: the sinusoid concatenates [cos, sin] (cos first),
    unlike the more common [sin, cos] (modules.py:68).
    """
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Dtype = jnp.float32

    @staticmethod
    def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
        half = dim // 2
        freqs = jnp.exp(-math.log(max_period) *
                        jnp.arange(half, dtype=jnp.float32) / half)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
        return emb

    @nn.compact
    def __call__(self, t: Array) -> Array:
        x = self.timestep_embedding(t, self.frequency_embedding_size)
        x = Dense(self.hidden_size, dtype=self.dtype, kernel_init=normal02,
                  name='mlp_0')(x.astype(self.dtype))
        x = nn.silu(x)
        x = Dense(self.hidden_size, dtype=self.dtype, kernel_init=normal02,
                  name='mlp_2')(x)
        return x


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG null class + token drop (modules.py:79-106)."""
    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: Array, train: bool = False,
                 force_drop_ids: Optional[Array] = None) -> Array:
        use_cfg_embedding = self.dropout_prob > 0
        table = self.param('embedding_table', normal02,
                           (self.num_classes + int(use_cfg_embedding),
                            self.hidden_size), jnp.float32)
        if force_drop_ids is not None:
            labels = jnp.where(force_drop_ids == 1, self.num_classes, labels)
        elif train and use_cfg_embedding:
            rng = self.make_rng('label_dropout')
            drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            labels = jnp.where(drop, self.num_classes, labels)
        return table[labels].astype(self.dtype)


class SwiGLU(nn.Module):
    """timm-style SwiGLU MLP: fc2(silu(fc1_g(x)) * fc1_x(x)).

    Matches timm.layers.mlp.SwiGLU as used at reference modules.py:247-251.
    The two up-projections run as ONE fused (D, 2H) GEMM named ``fc1`` with
    column layout [g | x]: one MXU pass with twice the output width instead
    of two narrow passes over the same input. Isolated A/B of the full MLP
    on v5e (tools/perf_probe_diff.py stage_swiglu, M=4096): fused 494 us
    (176 TFLOP/s) vs split 987 us (88 TFLOP/s); end-to-end the sampler is
    within noise of the split layout, so the fused form is kept for the
    single-pass input read. The checkpoint importer/exporter concatenates/
    splits the timm fc1_g/fc1_x keys, so published weights round-trip
    bit-exactly.
    """
    hidden_features: int
    out_features: Optional[int] = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = self.out_features or x.shape[-1]
        D = _dense(self.quantized)
        fc1 = D(2 * self.hidden_features, use_bias=self.use_bias,
                dtype=self.dtype, name='fc1')
        fc2 = D(out, use_bias=self.use_bias, dtype=self.dtype, name='fc2')
        if self.quantized:
            from fitv2_tpu.ops import quant as _q
            if _q.use_fused_kernels:
                y = self._fused_int8(x, fc1, fc2, out)
                if y is not None:
                    return y
        gv = fc1(x)
        g, v = jnp.split(gv, 2, axis=-1)
        return fc2(nn.silu(g) * v)

    def _fused_int8(self, x: Array, fc1, fc2, out: int) -> Optional[Array]:
        """Serving-mode fused FFN: fc1 GEMM + silu(g)*v + requant and the
        fc2 GEMM run as two Pallas kernels (ops/int8_gemm.py) — the
        (M, 2H) fc1 output and (M, H) activation never materialize.
        Returns None (caller falls back to the reference chain) outside
        the calibrated+tile-aligned serving regime."""
        from fitv2_tpu.ops import int8_gemm as ig
        m = math.prod(x.shape[:-1])
        k, h = x.shape[-1], self.hidden_features
        if not (ig.supports_swiglu(m, k, 2 * h) and ig.supports(m, h, out)):
            return None
        p1 = fc1(x, return_quant_parts=True)
        p2 = fc2(jnp.zeros(x.shape[:-1] + (h,), x.dtype),
                 return_quant_parts=True)
        if p1 is None or p2 is None:  # calibration pass / no calib bound
            return None
        xs = p1.act_scale.astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / xs)),
                      -127, 127).astype(jnp.int8)
        mid_q = ig.int8_gemm_swiglu_quant(
            xq.reshape(m, k), p1.w_q, xs * p1.w_scale, p1.bias,
            1.0 / p2.act_scale)
        y = ig.int8_gemm_bias(mid_q, p2.w_q, p2.act_scale * p2.w_scale,
                              p2.bias, out_dtype=self.dtype)
        return y.reshape(x.shape[:-1] + (out,))


class Mlp(nn.Module):
    """GELU(tanh) MLP (FiTv1 path, reference modules.py:253)."""
    hidden_features: int
    out_features: Optional[int] = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out = self.out_features or x.shape[-1]
        D = _dense(self.quantized)
        x = D(self.hidden_features, use_bias=self.use_bias, dtype=self.dtype,
              name='fc1')(x)
        x = nn.gelu(x, approximate=True)
        return D(out, use_bias=self.use_bias, dtype=self.dtype, name='fc2')(x)


class Attention(nn.Module):
    """Multi-head attention over padded token sequences with 2D RoPE.

    Reference: modules.py:120-207. qkv is one fused projection; optional
    per-head-dim q/k LayerNorm; RoPE rotation of q/k (optionally v); mask-aware
    softmax attention; outputs of padded queries zeroed before the out proj.
    """
    num_heads: int
    qkv_bias: bool = True
    q_norm: Optional[str] = None
    k_norm: Optional[str] = None
    qk_norm_weight: bool = False
    use_rope: bool = True
    add_rel_pe_to_v: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = 'auto'  # 'auto' | 'xla' | 'pallas'
    save_attention: bool = False  # sow probs for viz (reference fit_model.py:302-331)
    rope_layout: str = 'interleaved'  # 'split' = TPU-fast basis (see rope.py)
    quantized: bool = False  # int8 W8A8 qkv/proj GEMMs (ops/quant.py)

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 freqs_cos: Optional[Array] = None,
                 freqs_sin: Optional[Array] = None) -> Array:
        B, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        qkv = _dense(self.quantized)(3 * C, use_bias=self.qkv_bias,
                                     dtype=self.dtype, name='qkv')(x)

        # Fused megakernel path (qk-LN + split-RoPE + masked attention in one
        # Pallas kernel straight off the flat qkv projection). MEASURED on
        # v5e (B=16, N=256, H=16, Dh=72): 544 us/call vs the XLA chain's
        # 206 us — the 512 per-head (256,72,256) MXU dots pay more in
        # small-matmul issue overhead than the avoided logits HBM traffic,
        # so 'auto' does NOT select it; opt in with attn_impl='fused'
        # (wins are expected only for lane-aligned head dims).
        if (self.attn_impl == 'fused'
                and self.use_rope and freqs_cos is not None):
            from fitv2_tpu.ops import fused_attention as fa
            if fa.supports(N, C, H, self.rope_layout, self.q_norm,
                           self.k_norm, self.qk_norm_weight,
                           self.add_rel_pe_to_v, self.save_attention):
                out = fa.fused_qkln_rope_attention(
                    qkv, freqs_cos, freqs_sin, mask, H,
                    norm_q=self.q_norm == 'layernorm',
                    norm_k=self.k_norm == 'layernorm')
                return _dense(self.quantized)(C, dtype=self.dtype,
                                              name='proj')(out)
        # split on the minor dim (layout-friendly: measured 1.9% faster than
        # reshape(B,N,3,H,Dh) + middle-axis indexing, which makes XLA insert
        # a full-tensor relayout copy per block on TPU; a k-major
        # 'bnc,cko->kbno' einsum variant measured equal to the 5D reshape).
        # Identical values — columns [0:C]=q, [C:2C]=k, [2C:3C]=v.
        q, k, v = (p.reshape(B, N, H, Dh)
                   for p in jnp.split(qkv, 3, axis=-1))  # (B, N, H, Dh)

        def _qk_norm_type(t):
            if t == 'layernorm' and self.qk_norm_weight:
                return 'w_layernorm'
            return t

        # Fused QK-LayerNorm + split-RoPE (the hot FiTv2 configuration):
        # one VMEM pass instead of materialized LN + rotate intermediates.
        fuse_qk = (self.use_rope and freqs_cos is not None
                   and self.rope_layout == 'split'
                   and not self.add_rel_pe_to_v
                   and not self.qk_norm_weight
                   and self.q_norm in (None, 'layernorm')
                   and self.k_norm in (None, 'layernorm'))
        if fuse_qk:
            from fitv2_tpu.ops.fused_qk_rope import qk_norm_rope
            q, k = qk_norm_rope(q, k, freqs_cos, freqs_sin,
                                norm_q=self.q_norm == 'layernorm',
                                norm_k=self.k_norm == 'layernorm')
        else:
            q = LayerNorm(_qk_norm_type(self.q_norm), name='q_norm')(q)
            k = LayerNorm(_qk_norm_type(self.k_norm), name='k_norm')(k)
            if self.use_rope and freqs_cos is not None:
                # add_rel_pe_to_v changes the value basis, which the split
                # permutation does not preserve -> force interleaved there
                layout = ('interleaved' if self.add_rel_pe_to_v
                          else self.rope_layout)
                cos = freqs_cos[:, :, None, :].astype(q.dtype)
                sin = freqs_sin[:, :, None, :].astype(q.dtype)
                if self.add_rel_pe_to_v:
                    v = apply_rope(v, cos, sin, layout)
                q = apply_rope(q, cos, sin, layout)
                k = apply_rope(k, cos, sin, layout)

        if self.save_attention:
            # capture softmax probabilities for attention visualization
            # (reference Attention stores maps when save_attention is set)
            logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * (Dh ** -0.5)
            if mask is not None:
                logits = jnp.where((mask > 0)[:, None, None, :], logits,
                                   float('-inf'))
            probs = jax.nn.softmax(logits, axis=-1)
            self.sow('intermediates', 'attn_probs', probs)
        # no-affine LayerNorm on BOTH q and k bounds every row to L2 norm
        # sqrt(Dh), hence |logit| <= sqrt(Dh) — the softmax can skip its
        # max-subtraction pass (see ops/attention.py bounded_logits)
        bounded = (self.q_norm == 'layernorm' and self.k_norm == 'layernorm'
                   and not self.qk_norm_weight)
        out = masked_attention(q, k, v, mask, impl=self.attn_impl,
                               bounded_logits=bounded,
                               quantized=self.quantized)  # (B, N, H, Dh)
        out = out.reshape(B, N, C)
        if mask is not None:
            out = out * mask.astype(out.dtype)[..., None]  # zero padded queries
        return _dense(self.quantized)(C, dtype=self.dtype, name='proj')(out)


class AdaLNModulation(nn.Module):
    """SiLU -> Linear(s) producing n_chunks*D modulation params, zero-init.

    adaln_type 'normal': one Linear; 'lora': Linear(D, r) -> Linear(r, nD);
    'swiglu': a SwiGLU head (reference modules.py:254-268).
    """
    hidden_size: int
    n_chunks: int
    adaln_type: str = 'normal'
    lora_dim: Optional[int] = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c: Array) -> Array:
        n_out = self.n_chunks * self.hidden_size
        if self.adaln_type in ('normal', 'lora'):
            h = nn.silu(c)
            if self.adaln_type == 'lora':
                h = Dense(self.lora_dim, use_bias=self.use_bias, dtype=self.dtype,
                          name='fc1')(h)
            # final layer zero-init (reference fit_model.py:139-148)
            return Dense(n_out, use_bias=self.use_bias, dtype=self.dtype,
                         kernel_init=zeros, name='fc_out')(h)
        if self.adaln_type == 'swiglu':
            hidden = (self.hidden_size // 4) * 3 if self.n_chunks == 6 \
                else self.hidden_size // 2
            g = Dense(hidden, use_bias=self.use_bias, dtype=self.dtype,
                      name='fc1_g')(c)
            v = Dense(hidden, use_bias=self.use_bias, dtype=self.dtype,
                      name='fc1_x')(c)
            return Dense(n_out, use_bias=self.use_bias, dtype=self.dtype,
                         kernel_init=zeros, name='fc2')(nn.silu(g) * v)
        raise NotImplementedError(self.adaln_type)


class FiTBlock(nn.Module):
    """AdaLN-zero transformer block (reference modules.py:213-274)."""
    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    swiglu: bool = True
    swiglu_large: bool = False
    norm_layer: str = 'layernorm'
    q_norm: Optional[str] = None
    k_norm: Optional[str] = None
    qk_norm_weight: bool = False
    qkv_bias: bool = True
    ffn_bias: bool = True
    adaln_bias: bool = True
    adaln_type: str = 'normal'
    adaln_lora_dim: Optional[int] = None
    use_rope: bool = True
    add_rel_pe_to_v: bool = False
    dtype: Dtype = jnp.float32
    attn_impl: str = 'auto'
    save_attention: bool = False
    rope_layout: str = 'interleaved'
    quantized: bool = False  # int8 W8A8 on qkv/proj/fc1/fc2 (ops/quant.py)

    @nn.compact
    def __call__(self, x: Array, c: Array, mask: Optional[Array],
                 freqs_cos: Optional[Array], freqs_sin: Optional[Array],
                 global_adaln: Array | float = 0.0) -> Array:
        D = self.hidden_size
        mod = AdaLNModulation(
            D, 6, adaln_type=self.adaln_type, lora_dim=self.adaln_lora_dim,
            use_bias=self.adaln_bias, dtype=self.dtype,
            name='adaLN_modulation')(c) + global_adaln
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        h = norm_modulate(x, shift_msa, scale_msa, self.norm_layer,
                          LayerNorm(self.norm_layer, name='norm1'),
                          quantized=self.quantized)
        attn_out = Attention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias, q_norm=self.q_norm,
            k_norm=self.k_norm, qk_norm_weight=self.qk_norm_weight,
            use_rope=self.use_rope, add_rel_pe_to_v=self.add_rel_pe_to_v,
            dtype=self.dtype, attn_impl=self.attn_impl,
            save_attention=self.save_attention,
            rope_layout=self.rope_layout, quantized=self.quantized,
            name='attn')(h, mask, freqs_cos, freqs_sin)
        x = x + _expand_mod(gate_msa, x) * attn_out

        h = norm_modulate(x, shift_mlp, scale_mlp, self.norm_layer,
                          LayerNorm(self.norm_layer, name='norm2'),
                          quantized=self.quantized)
        mlp_hidden = int(D * self.mlp_ratio)
        if self.swiglu:
            hidden = mlp_hidden if self.swiglu_large else (mlp_hidden * 2) // 3
            mlp_out = SwiGLU(hidden, use_bias=self.ffn_bias, dtype=self.dtype,
                             quantized=self.quantized, name='mlp')(h)
        else:
            mlp_out = Mlp(mlp_hidden, use_bias=self.ffn_bias, dtype=self.dtype,
                          quantized=self.quantized, name='mlp')(h)
        return x + _expand_mod(gate_mlp, x) * mlp_out


class FinalLayer(nn.Module):
    """Final modulated projection to patch outputs (reference modules.py:276-296)."""
    hidden_size: int
    patch_size: int
    out_channels: int
    norm_layer: str = 'layernorm'
    adaln_bias: bool = True
    adaln_type: str = 'normal'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        adaln_type = 'swiglu' if self.adaln_type == 'swiglu' else 'normal'
        mod = AdaLNModulation(self.hidden_size, 2, adaln_type=adaln_type,
                              use_bias=self.adaln_bias, dtype=self.dtype,
                              name='adaLN_modulation')(c)
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = norm_modulate(x, shift, scale, self.norm_layer,
                          LayerNorm(self.norm_layer, name='norm_final'))
        # zero-init output projection (reference fit_model.py:156-157)
        return Dense(self.patch_size * self.patch_size * self.out_channels,
                     dtype=self.dtype, kernel_init=zeros, name='linear')(x)
