"""FiT / FiTv2: flexible diffusion transformer over padded token sequences.

TPU-native reimplementation of the reference model
(/root/reference/fit/model/fit_model.py:21-331). Differences by design:

  - flax.linen module; parameters are a pytree, sharded via jax.sharding.
  - The depth-D block stack runs under ``nn.scan`` with stacked (D, ...)
    parameters: one compiled block body, fast compiles, and FSDP sharding of
    the stacked leaves along the data axis maps cleanly onto a TPU mesh.
    ``use_checkpoint`` becomes ``nn.remat`` of the scanned block
    (reference fit_model.py:223-228 used torch.utils.checkpoint per block).
  - RoPE cos/sin are computed once per forward from the grid (cached tables or
    online per-sample frequencies, reference fit_model.py:211-217) and
    broadcast into the scan.
  - All shapes static: callers pad to a fixed context length per bucket.

Sequence layout is always (B, N, C) ("use_sit" layout); the FiTv1 channel-first
(B, C, N) convention is handled at the call boundary.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fitv2_tpu.models import rope as rope_lib
from fitv2_tpu.models.modules import (
    AdaLNModulation, FiTBlock, FinalLayer, LabelEmbedder, PatchEmbedder,
    TimestepEmbedder,
)
from fitv2_tpu.parallel.mesh import constrain_sequence

Array = jax.Array
Dtype = Any


class _ScanBlock(nn.Module):
    """Adapter giving FiTBlock the (carry, *broadcast) -> (carry, out) shape
    nn.scan requires; params live under <name>/block/..."""
    block_kwargs: Any  # flax FrozenDict of FiTBlock kwargs (static)
    sequence_mesh: Any = None  # static Mesh for SP activation constraints

    @nn.compact
    def __call__(self, x, c, mask, freqs_cos, freqs_sin, global_adaln):
        x = FiTBlock(**dict(self.block_kwargs), name='block')(
            x, c, mask, freqs_cos, freqs_sin, global_adaln)
        x = constrain_sequence(x, self.sequence_mesh)  # no-op when None
        return x, None


def embed_pre_trunk(model: 'FiT', sub, x: Array, t: Array, y: Array,
                    grid: Array, size: Optional[Array], train: bool,
                    force_drop_ids: Optional[Array]):
    """The pre-trunk graph (time-shift, patch/time/label embed, RoPE,
    global adaLN) shared by ``FiT.__call__`` and external block executors
    (parallel/pipeline.py). ``sub(module, *args)`` applies a constructed
    submodule: in-scope it calls it directly; out-of-scope it runs
    ``module.apply`` on the matching params subtree. Single source of truth
    for the pre graph — edit here, both executors follow.

    Returns (x, c, freqs_cos, freqs_sin, global_adaln)."""
    ts = model.time_shifting
    t = jnp.minimum(ts * t / (1.0 + (ts - 1.0) * t), 1.0)
    t = t.astype(model.dtype)

    x = x.astype(model.dtype)
    x = sub(PatchEmbedder(model.hidden_size, dtype=model.dtype,
                          name='x_embedder'), x)
    x = constrain_sequence(x, model.sequence_mesh)  # no-op when None
    t_emb = sub(TimestepEmbedder(model.hidden_size, dtype=model.dtype,
                                 name='t_embedder'), t)
    y_emb = sub(LabelEmbedder(model.num_classes, model.hidden_size,
                              model.class_dropout_prob, dtype=model.dtype,
                              name='y_embedder'), y, train, force_drop_ids)
    c = t_emb + y_emb  # (B, D)

    freqs_cos, freqs_sin = model._rope(grid, size)

    if model.adaln_type == 'lora':
        global_adaln = sub(AdaLNModulation(
            model.hidden_size, 6, adaln_type='normal',
            use_bias=model.adaln_bias, dtype=model.dtype,
            name='global_adaLN_modulation'), c)
    else:
        global_adaln = 0.0
    return x, c, freqs_cos, freqs_sin, global_adaln


def finalize_post_trunk(model: 'FiT', sub, x: Array, c: Array,
                        mask: Optional[Array]) -> Array:
    """The post-trunk graph (final layer + padded-token zeroing) shared by
    ``FiT.__call__`` and external block executors — see embed_pre_trunk."""
    x = sub(FinalLayer(model.hidden_size, model.patch_size,
                       model.out_channels, norm_layer=model.norm_type,
                       adaln_bias=model.adaln_bias,
                       adaln_type=model.adaln_type, dtype=model.dtype,
                       name='final_layer'), x, c)
    if mask is not None:
        x = x * mask.astype(x.dtype)[..., None]  # zero padded tokens
    return x


class FiT(nn.Module):
    """Flexible Diffusion Transformer (reference fit_model.py:21-116 hyperparams)."""
    context_size: int = 256
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    use_sit: bool = False
    use_checkpoint: bool = False
    use_swiglu: bool = False
    use_swiglu_large: bool = False
    rel_pos_embed: Optional[str] = 'rope'
    norm_type: str = 'layernorm'
    q_norm: Optional[str] = None
    k_norm: Optional[str] = None
    qk_norm_weight: bool = False
    qkv_bias: bool = True
    ffn_bias: bool = True
    adaln_bias: bool = True
    adaln_type: str = 'normal'
    adaln_lora_dim: Optional[int] = None
    rope_theta: float = 10000.0
    custom_freqs: str = 'normal'
    max_pe_len_h: Optional[int] = None
    max_pe_len_w: Optional[int] = None
    decouple: bool = False
    ori_max_pe_len: Optional[int] = None
    online_rope: bool = False
    add_rel_pe_to_v: bool = False
    time_shifting: float = 1.0
    max_cached_len: int = 512
    dtype: Dtype = jnp.float32
    attn_impl: str = 'auto'
    scan_blocks: bool = True
    save_attention: bool = False
    # remat policy when use_checkpoint: 'full' recomputes everything
    # (reference torch.utils.checkpoint semantics, fit_model.py:223-228);
    # 'dots' saves matmul outputs and recomputes only the cheap elementwise
    # chain (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) —
    # much faster backward for a modest activation-memory increase.
    remat_policy: str = 'full'
    # 'split' avoids the lane-hostile interleaved rotate_half (22% step-time
    # saving at XL); requires importer-side q/k basis permutation
    # (convert_fit_state_dict rope_layout) — outputs are bit-compatible.
    rope_layout: str = 'split'
    # 'bf16' (default, full parity) or 'int8': W8A8 block GEMMs on the MXU's
    # double-rate integer path (ops/quant.py) — opt-in speed mode for
    # serving; same parameter tree, quantization at apply time.
    gemm_precision: str = 'bf16'
    # Sequence parallelism: a jax.sharding.Mesh with a 'sequence' axis. When
    # set, activations are CONSTRAINED token-sharded after the patch embed
    # and after every block (parallel/mesh.constrain_sequence), so the
    # MLP/norm/modulation chain and its activation memory stay sharded
    # N/seq per device; XLA inserts k/v all-gathers only around the
    # attention einsums. None (default) = no SP. Static field: the SAME
    # mesh object must be used for the jit in_shardings.
    sequence_mesh: Any = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def rope_config(self) -> rope_lib.RopeConfig:
        layout = ('interleaved' if self.add_rel_pe_to_v
                  else self.rope_layout)
        return rope_lib.RopeConfig(
            head_dim=self.head_dim, mode=self.custom_freqs, theta=self.rope_theta,
            max_cached_len=self.max_cached_len, max_pe_len_h=self.max_pe_len_h,
            max_pe_len_w=self.max_pe_len_w, decouple=self.decouple,
            ori_max_pe_len=self.ori_max_pe_len, online=self.online_rope,
            layout=layout)

    def block_kwargs(self) -> dict:
        """Constructor kwargs of one FiTBlock for this config. Single source
        for the in-model scan stack below AND external block executors
        (parallel/pipeline.py builds a standalone FiTBlock from these to run
        the same stacked params under a GPipe schedule)."""
        return dict(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, swiglu=self.use_swiglu,
            swiglu_large=self.use_swiglu_large, norm_layer=self.norm_type,
            q_norm=self.q_norm, k_norm=self.k_norm,
            qk_norm_weight=self.qk_norm_weight, qkv_bias=self.qkv_bias,
            ffn_bias=self.ffn_bias, adaln_bias=self.adaln_bias,
            adaln_type=self.adaln_type, adaln_lora_dim=self.adaln_lora_dim,
            use_rope=self.rel_pos_embed is not None,
            add_rel_pe_to_v=self.add_rel_pe_to_v, dtype=self.dtype,
            attn_impl=self.attn_impl, save_attention=self.save_attention,
            rope_layout=self.rope_layout,
            quantized=self.gemm_precision == 'int8')

    def _remat_policy(self):
        if self.remat_policy == 'dots':
            return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        if self.remat_policy == 'dots_all':
            # saves EVERY dot output including batched ones (the attention
            # logits/AV products), so backward recomputes only elementwise —
            # highest memory, fastest backward of the remat tiers.
            return jax.checkpoint_policies.dots_saveable
        if self.remat_policy == 'dots_offload':
            # 'dots' savings streamed to pinned host memory instead of HBM:
            # trades PCIe/transfer bandwidth for the saved-dots working set —
            # the candidate for the batch>=24 HBM wall (43%-fragmented
            # 12.85G temp, PARITY.md round-3).
            return jax.checkpoint_policies.offload_dot_with_no_batch_dims(
                'device', 'pinned_host')
        if self.remat_policy == 'full':
            return None  # save nothing, recompute everything
        raise ValueError(f'unknown remat_policy: {self.remat_policy!r}')

    def _rope(self, grid: Array, size: Optional[Array]) -> Tuple[Array, Array]:
        cfg = self.rope_config()
        if self.rel_pos_embed is None:
            return None, None
        if self.online_rope:
            assert size is not None, 'online rope needs per-sample size'
            return rope_lib.online_rope_from_grid(cfg, grid, size)
        cache = rope_lib.build_rope_cache(cfg)  # constant-folded under jit
        return rope_lib.rope_from_grid(cache, grid, cfg.layout)

    @nn.compact
    def __call__(self, x: Array, t: Array, y: Array, grid: Array,
                 mask: Optional[Array] = None,
                 size: Optional[Array] = None, train: bool = False,
                 force_drop_ids: Optional[Array] = None) -> Array:
        """x: (B, N, p**2*C_in); t: (B,); y: (B,) int; grid: (B, 2, N) int;
        mask: (B, N); size: (B, 1, 2). Returns (B, N, p**2*C_out).
        Reference semantics: fit_model.py:189-233.

        mask=None means "every token valid" STATICALLY: the mask `where`
        inside the softmax and both padded-output zeroing multiplies drop
        out of the compiled graph. Full-grid sampling (the reference's own
        sampler always builds mask=ones, sample_fitv2_ddp.py:263-271) should
        pass None; identical outputs, fewer HBM passes."""
        x, c, freqs_cos, freqs_sin, global_adaln = embed_pre_trunk(
            self, lambda m, *a: m(*a), x, t, y, grid, size, train,
            force_drop_ids)

        block_kwargs = self.block_kwargs()

        if self.scan_blocks:
            from flax.core import freeze
            body_cls = _ScanBlock
            if self.use_checkpoint:
                body_cls = nn.remat(body_cls, prevent_cse=False,
                                    policy=self._remat_policy())
            ScanBlocks = nn.scan(
                body_cls,
                # quant_calib / quant_weights: per-block int8 activation
                # scales and prequantized kernels (ops/quant.py)
                variable_axes={'params': 0, 'intermediates': 0,
                               'quant_calib': 0, 'quant_weights': 0},
                split_rngs={'params': True, 'label_dropout': True},
                length=self.depth,
                in_axes=nn.broadcast,
            )
            x, _ = ScanBlocks(freeze(block_kwargs),
                              sequence_mesh=self.sequence_mesh,
                              name='blocks')(
                x, c, mask, freqs_cos, freqs_sin, global_adaln)
        else:
            block_cls = FiTBlock
            if self.use_checkpoint:
                block_cls = nn.remat(block_cls, prevent_cse=False,
                                     policy=self._remat_policy())
            for i in range(self.depth):
                x = block_cls(**block_kwargs, name=f'blocks_{i}')(
                    x, c, mask, freqs_cos, freqs_sin, global_adaln)
                x = constrain_sequence(x, self.sequence_mesh)

        return finalize_post_trunk(self, lambda m, *a: m(*a), x, c, mask)

    # -- helpers ----------------------------------------------------------

    def unpatchify(self, x: Array, hw: Tuple[int, int],
                   channel_last: bool = False) -> Array:
        """(B, N, p**2*C_out) -> (B, C_out, H, W) (reference fit_model.py:171-187).

        Set channel_last=True for NHWC (JAX-convolution-friendly).

        Channels are inferred from the token dim (reference einops
        ``(c p1 p2)`` pattern): model outputs carry out_channels, DDPM
        ancestral samples carry in_channels only.
        """
        h, w = hw
        p = self.patch_size
        c = x.shape[-1] // (p * p)
        gh, gw = h // p, w // p
        x = x.reshape(x.shape[0], gh, gw, c, p, p)      # (B, gh, gw, C, p, p)
        x = jnp.einsum('bhwcpq->bhpwqc', x)             # (B, gh, p, gw, q, C)
        x = x.reshape(x.shape[0], h, w, c)
        if channel_last:
            return x
        return jnp.transpose(x, (0, 3, 1, 2))


def forward_with_cfg(model: FiT, params, x: Array, t: Array, y: Array,
                     grid: Array, mask: Array, size: Optional[Array],
                     cfg_scale: float, scale_pow: float = 0.0,
                     cfg_channels: Optional[int] = None,
                     variables: Optional[dict] = None) -> Array:
    """Classifier-free-guidance forward (reference fit_model.py:235-275).

    Inputs are the doubled (2B) batch where the second half carries the null
    class; x's second half is overwritten with the first (reference :246-247).
    CFG is applied to the first ``cfg_channels`` output channels only
    (default 3*p**2, reference :253). ``variables`` overrides the apply
    collections (e.g. to carry quant_calib/quant_weights for int8 serving).
    """
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = model.apply(variables if variables is not None else
                      {'params': params}, combined, t, y, grid, mask, size)
    c_cfg = cfg_channels if cfg_channels is not None \
        else 3 * model.patch_size * model.patch_size
    eps, rest = out[..., :c_cfg], out[..., c_cfg:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    if scale_pow == 0.0:
        real_scale = cfg_scale
    else:
        scale_step = (1 - jnp.cos(
            ((1 - jnp.minimum(t, 1.0)) ** scale_pow) * jnp.pi)) * 0.5
        real_scale = (cfg_scale - 1) * scale_step + 1
        real_scale = real_scale[: x.shape[0] // 2].reshape(-1, 1, 1)
    half_eps = uncond_eps + real_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=-1)
