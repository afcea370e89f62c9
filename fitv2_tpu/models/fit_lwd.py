"""FiTLwD: layer-wise flows / blockwise flow matching (LwD, BFM).

TPU-native reimplementation of the fork's LwD research family
(/root/reference/fit/model/fit_model_lwd.py:20-1516, bfm.py:18-829; shared
semantics summarized in SURVEY.md §2.3):

  - Depth is split into K = ``number_of_perflow`` segments;
    ``sigmas = linspace(0, 1, K+1)`` (fit_model_lwd.py:93). Segment i is a
    flow over [sigma_i, sigma_{i+1}].
  - Training runs ONE segment per step (``forward_run_layer``,
    fit_model_lwd.py:359-416): embed -> that segment's blocks -> final layer.
  - Sampling executes segments sequentially; each does
    ``number_of_step_perflow`` Euler sub-steps with the residual update
    x <- x + (dt) * v (fit_model_lwd.py:285-357) — here each segment's
    sub-step loop is a ``lax.scan`` over its own weights.
  - Optional REPA: representation blocks + 1152->2048->2048->1024 projection
    (fit_model_lwd.py:108-134) trained with cosine alignment to a frozen
    encoder.
  - SDE sampler ``sample_maruyama_cfg`` (fit_model_lwd_bk.py:1297-1404):
    score = (t*v - x)/(1-t), diffusion = (1-t), drift = v + diffusion/2 *
    score, CFG applied inside a [guidance_low, guidance_high] window, noise
    added except at the very last sub-step; the final segment integrates to
    1-0.04 then takes one deterministic step to 1.0.

JAX design notes: segment index is a static python int (each segment is its
own compiled graph — K is small); CFG guidance windows use a static doubled
batch with jnp.where mixing so shapes stay fixed; per-segment block stacks
are nn.scan'd with stacked (L, ...) leaves like the flagship FiT.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import freeze

from fitv2_tpu.models import rope as rope_lib
from fitv2_tpu.models.fit import _ScanBlock
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.models.modules import (
    AdaLNModulation, FiTBlock, FinalLayer, LabelEmbedder, PatchEmbedder,
    TimestepEmbedder,
)
from fitv2_tpu.parallel.mesh import constrain_sequence

Array = jax.Array
Dtype = Any


class BlockStack(nn.Module):
    """L FiTBlocks under nn.scan with stacked (L, ...) parameters."""
    length: int
    block_kwargs: Any  # FrozenDict
    # static Mesh: pins block-boundary activations batch(+token)-sharded
    # (parallel/mesh.constrain_sequence) — under FSDP this forces the
    # ZeRO-3 per-layer weight-gather pattern instead of the TP-style
    # activation re-layout SPMD otherwise picks (same mechanism as the
    # flagship FiT, tests/test_comm_patterns.py)
    sequence_mesh: Any = None

    @nn.compact
    def __call__(self, x, c, mask, freqs_cos, freqs_sin, global_adaln):
        Scan = nn.scan(
            _ScanBlock,
            variable_axes={'params': 0, 'intermediates': 0,
                           'quant_calib': 0, 'quant_weights': 0},
            split_rngs={'params': True, 'label_dropout': True},
            length=self.length,
            in_axes=nn.broadcast,
        )
        x, _ = Scan(self.block_kwargs, self.sequence_mesh, name='stack')(
            x, c, mask, freqs_cos, freqs_sin, global_adaln)
        return x


class ProjectionHead(nn.Module):
    """REPA projection 1152 -> 2048 -> 2048 -> 1024 (fit_model_lwd.py:121-134)."""
    out_dim: int = 1024
    hidden: int = 2048
    dtype: Dtype = jnp.float32
    sequence_mesh: Any = None  # batch-shard pin (parallel/mesh docstring)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pin = lambda h: constrain_sequence(h, self.sequence_mesh)
        x = pin(nn.Dense(self.hidden, dtype=self.dtype, name='fc1')(x))
        x = nn.silu(x)
        x = pin(nn.Dense(self.hidden, dtype=self.dtype, name='fc2')(x))
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, name='fc3')(x)


class FiTLwD(nn.Module):
    """Segmented FiT (reference fit_model_lwd.py:20-176 hyperparams)."""
    context_size: int = 256
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = False
    use_sit: bool = True
    use_checkpoint: bool = False
    use_swiglu: bool = True
    use_swiglu_large: bool = False
    rel_pos_embed: Optional[str] = 'rope'
    norm_type: str = 'layernorm'
    q_norm: Optional[str] = 'layernorm'
    k_norm: Optional[str] = 'layernorm'
    qk_norm_weight: bool = False
    qkv_bias: bool = True
    ffn_bias: bool = True
    adaln_bias: bool = True
    adaln_type: str = 'lora'
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
    number_of_perflow: int = 4
    perlayer_embedder: bool = False
    number_of_shared_blocks: int = 0  # shared trunk run before each segment
    number_of_representation_blocks: int = 0
    repa_dim: int = 1024
    fourier_basis: bool = False
    n_patch_h: int = 16
    n_patch_w: int = 16
    max_cached_len: int = 256
    dtype: Dtype = jnp.float32
    attn_impl: str = 'auto'
    rope_layout: str = 'split'  # TPU-fast basis (see fitv2_tpu/models/rope.py)
    # 'bf16' or 'int8' W8A8 serving mode for block GEMMs (ops/quant.py)
    gemm_precision: str = 'bf16'
    # static Mesh: pins block-boundary activations batch(+token)-sharded
    # (parallel/mesh.constrain_sequence). Same mechanism as the flagship FiT:
    # without the pin, an FSDP mesh compiles TP-style (full-batch activation
    # all-gathers instead of ZeRO-3 per-layer weight gathers) — the exact
    # regression tests/test_comm_patterns.py caught on FiT in round 4.
    sequence_mesh: Any = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def layers_per_flow(self) -> int:
        assert self.depth % self.number_of_perflow == 0
        return self.depth // self.number_of_perflow

    @property
    def rep_layers_per_flow(self) -> int:
        if self.number_of_representation_blocks <= 1:
            return 0
        assert (self.number_of_representation_blocks
                % self.number_of_perflow == 0)
        return self.number_of_representation_blocks // self.number_of_perflow

    @property
    def sigmas(self) -> np.ndarray:
        return np.linspace(0.0, 1.0, self.number_of_perflow + 1)

    def _block_kwargs(self):
        return freeze(dict(
            hidden_size=self.hidden_size, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, swiglu=self.use_swiglu,
            swiglu_large=self.use_swiglu_large, norm_layer=self.norm_type,
            q_norm=self.q_norm, k_norm=self.k_norm,
            qk_norm_weight=self.qk_norm_weight, qkv_bias=self.qkv_bias,
            ffn_bias=self.ffn_bias, adaln_bias=self.adaln_bias,
            adaln_type=self.adaln_type, adaln_lora_dim=self.adaln_lora_dim,
            use_rope=self.rel_pos_embed is not None,
            add_rel_pe_to_v=self.add_rel_pe_to_v, dtype=self.dtype,
            attn_impl=self.attn_impl, rope_layout=self.rope_layout,
            quantized=self.gemm_precision == 'int8'))

    def setup(self):
        K = self.number_of_perflow
        bk = self._block_kwargs()
        n_emb = K if self.perlayer_embedder else 1
        self.x_embedders = [PatchEmbedder(self.hidden_size, dtype=self.dtype)
                            for _ in range(n_emb)]
        self.t_embedders = [TimestepEmbedder(self.hidden_size,
                                             dtype=self.dtype)
                            for _ in range(n_emb)]
        self.y_embedders = [LabelEmbedder(self.num_classes, self.hidden_size,
                                          self.class_dropout_prob,
                                          dtype=self.dtype)
                            for _ in range(n_emb)]
        fl_out = (self.out_channels * 2 if self.fourier_basis
                  else self.out_channels)
        self.final_layers = [FinalLayer(
            self.hidden_size, self.patch_size, fl_out,
            norm_layer=self.norm_type, adaln_bias=self.adaln_bias,
            adaln_type=self.adaln_type, dtype=self.dtype)
            for _ in range(n_emb)]
        self.segments = [BlockStack(self.layers_per_flow, bk,
                                    self.sequence_mesh)
                         for _ in range(K)]
        if self.number_of_shared_blocks > 0:
            # trunk blocks shared by every segment (reference
            # fit_model_lwd_shared.py:21-830 / lwd_ms start_shared_blocks)
            self.start_shared_blocks = BlockStack(
                self.number_of_shared_blocks, bk, self.sequence_mesh)
        if self.adaln_type == 'lora':
            self.global_adaLN_modulation = AdaLNModulation(
                self.hidden_size, 6, adaln_type='normal',
                use_bias=self.adaln_bias, dtype=self.dtype)
        if self.rep_layers_per_flow > 0:
            self.representation_x_embedder = PatchEmbedder(
                self.hidden_size, dtype=self.dtype)
            self.rep_segments = [BlockStack(self.rep_layers_per_flow, bk,
                                            self.sequence_mesh)
                                 for _ in range(K)]
            self.linear_projection = ProjectionHead(
                self.repa_dim, dtype=self.dtype,
                sequence_mesh=self.sequence_mesh)
        if self.fourier_basis:
            # t_next-conditioned [cos||sin] basis; final-layer outputs become
            # basis coefficients (reference fit_model_lwd_ms.py:161-162,
            # 517-522, 470-472)
            out_dim = self.patch_size ** 2 * self.out_channels
            self.fourier_basis_embedder = TimestepEmbedder(
                2 * out_dim, dtype=self.dtype)

    # -- shared helpers ------------------------------------------------------

    def _emb(self, seq, i: int):
        return seq[i if self.perlayer_embedder else 0]

    def _rope(self, grid: Array, size: Optional[Array]):
        if self.rel_pos_embed is None:
            return None, None
        layout = ('interleaved' if self.add_rel_pe_to_v
                  else self.rope_layout)
        cfg = rope_lib.RopeConfig(
            head_dim=self.hidden_size // self.num_heads,
            mode=self.custom_freqs, theta=self.rope_theta,
            max_cached_len=self.max_cached_len,
            max_pe_len_h=self.max_pe_len_h, max_pe_len_w=self.max_pe_len_w,
            decouple=self.decouple, ori_max_pe_len=self.ori_max_pe_len,
            online=self.online_rope, layout=layout)
        if self.online_rope:
            return rope_lib.online_rope_from_grid(cfg, grid, size)
        return rope_lib.rope_from_grid(rope_lib.build_rope_cache(cfg), grid,
                                       layout)

    def _time_shift(self, t: Array) -> Array:
        ts = self.time_shifting
        return jnp.minimum(ts * t / (1.0 + (ts - 1.0) * t), 1.0)

    def _cond(self, i: int, t: Array, y_embed: Array):
        t_emb = self._emb(self.t_embedders, i)(
            self._time_shift(t).astype(self.dtype))
        c = t_emb + y_embed
        if self.adaln_type == 'lora':
            return c, self.global_adaLN_modulation(c)
        return c, 0.0

    def _segment_body(self, i: int, x_tokens: Array, c, mask, f_cos, f_sin,
                      global_adaln, t_next: Optional[Array] = None) -> Array:
        """embed -> [shared trunk] -> segment blocks -> final layer."""
        h = self._emb(self.x_embedders, i)(x_tokens.astype(self.dtype))
        h = constrain_sequence(h, self.sequence_mesh)  # no-op when None
        if self.number_of_shared_blocks > 0:
            h = self.start_shared_blocks(h, c, mask, f_cos, f_sin,
                                         global_adaln)
        h = self.segments[i](h, c, mask, f_cos, f_sin, global_adaln)
        out = self._emb(self.final_layers, i)(h, c)
        if self.fourier_basis:
            assert t_next is not None, 'fourier_basis needs t_next'
            basis = self.fourier_basis_embedder(t_next.astype(self.dtype))
            cos_b, sin_b = jnp.split(basis[:, None, :], 2, axis=-1)
            coeff_cos, coeff_sin = jnp.split(out, 2, axis=-1)
            out = coeff_cos * cos_b + coeff_sin * sin_b
        out = out * mask.astype(out.dtype)[..., None]
        return constrain_sequence(out, self.sequence_mesh)

    def _rep_forward(self, i: int, x_tokens: Array, c, mask, f_cos, f_sin,
                     global_adaln) -> Array:
        r = self.representation_x_embedder(x_tokens.astype(self.dtype))
        r = constrain_sequence(r, self.sequence_mesh)
        r = self.rep_segments[i](r, c, mask, f_cos, f_sin, global_adaln)
        return constrain_sequence(self.linear_projection(r),
                                  self.sequence_mesh)

    def get_segment_index(self, t: float) -> int:
        """t in [0,1] -> segment id (fit_model_lwd_bk.py:254-266)."""
        if t >= 1.0:
            return self.number_of_perflow - 1
        return int(t * self.number_of_perflow)

    # -- training path (reference forward_run_layer, :359-416) ---------------

    def forward_run_layer(self, x: Array, t: Array, y: Array,
                          segment_idx: int, grid: Array, mask: Array,
                          size: Optional[Array] = None, train: bool = False,
                          force_drop_ids: Optional[Array] = None,
                          t_next: Optional[Array] = None
                          ) -> Tuple[Array, Optional[Array]]:
        """One segment forward. Returns (velocity pred, repa projection).
        t_next is required only for fourier_basis models (reference
        forward_run_layer t_next kwarg)."""
        f_cos, f_sin = self._rope(grid, size)
        y_embed = self._emb(self.y_embedders, segment_idx)(
            y, train, force_drop_ids)
        c, global_adaln = self._cond(segment_idx, t, y_embed)
        repr_proj = None
        if self.rep_layers_per_flow > 0:
            repr_proj = self._rep_forward(segment_idx, x, c, mask, f_cos,
                                          f_sin, global_adaln)
        if self.fourier_basis and t_next is None:
            t_next = jnp.ones_like(t)  # init-time default
        out = self._segment_body(segment_idx, x, c, mask, f_cos, f_sin,
                                 global_adaln, t_next)
        return out, repr_proj

    def init_all(self, x: Array, t: Array, y: Array, grid: Array,
                 mask: Array, size: Optional[Array] = None) -> Array:
        """Touch every segment's parameters — the canonical init target.

        flax materializes params lazily per submodule use; initializing via
        forward_run_layer(segment_idx=0) would create only segment 0's
        weights. model.init(rngs, x, t, y, grid, mask, size) calls this.
        """
        out = None
        for i in range(self.number_of_perflow):
            out, _ = self.forward_run_layer(x, t, y, i, grid, mask, size,
                                            train=True)
        return out

    __call__ = init_all

    # -- samplers -------------------------------------------------------------

    def _scan_substeps(self, x: Array, sig, velocity_fn) -> Array:
        """lax.scan the within-segment Euler sub-steps.

        Sub-steps of one segment share that segment's parameters, so the
        step body compiles ONCE per segment instead of S unrolled copies —
        compile time scales with K, not K*S (the unrolled BFM-XL S=16
        graph took ~18 min through the remote-compile tunnel). Bound
        submodule calls are legal inside lax.scan at apply time (params
        are concrete); parity with the unrolled path is pinned in
        tests/test_lwd.py / test_lwd_sharedenc.py.

        velocity_fn(x, t_scalar, t_next_scalar) -> velocity (x-shaped).
        """
        sig = np.asarray(sig, np.float32)
        if self.is_initializing():
            # init-time (model.init(method=sample)): params are CREATED by
            # the body, a side effect lax.scan forbids (UnexpectedTracer).
            # One unrolled sub-step creates this segment's params and
            # preserves the shape flow; sub-steps share those params.
            v = velocity_fn(x, sig[0], sig[1])
            return x + (sig[1] - sig[0]) * v.astype(x.dtype)
        pairs = jnp.stack([jnp.asarray(sig[:-1]), jnp.asarray(sig[1:])], 1)

        def body(xc, pair):
            v = velocity_fn(xc, pair[0], pair[1])
            return xc + (pair[1] - pair[0]) * v.astype(xc.dtype), None

        x, _ = jax.lax.scan(body, x, pairs)
        return x

    def _segment_sigma_list(self, i: int, nspf: int,
                            maruyama_last: bool = False) -> np.ndarray:
        sig = self.sigmas
        if maruyama_last and i == self.number_of_perflow - 1:
            # last segment: integrate to 1-0.04, then one step to 1.0
            # (fit_model_lwd_bk.py forward_maruyama_cfg last-segment ladder)
            lst = np.linspace(sig[i], 1.0 - 0.04, nspf)
            return np.concatenate([lst, [1.0]])
        return np.linspace(sig[i], sig[i + 1], nspf + 1)

    def sample(self, x: Array, y: Array, number_of_step_perflow: int = 1,
               return_intermediates: bool = False,
               return_representations: bool = False):
        """Sequential per-segment Euler (reference forward, :285-357).

        return_intermediates: also return the per-segment states (the
        reference's forward_wo_cfg_int variant). return_representations:
        also return each segment's REPA projection tokens (forward_*_repre
        variants; requires representation blocks)."""
        B = x.shape[0]
        grid, mask, size = make_grid_mask_size(
            B, self.n_patch_h, self.n_patch_w, self.context_size)
        f_cos, f_sin = self._rope(grid, size)
        intermediates, representations = [], []
        for i in range(self.number_of_perflow):
            y_embed = self._emb(self.y_embedders, i)(y)
            sig = self._segment_sigma_list(i, number_of_step_perflow)
            if not (return_intermediates or return_representations):
                def vel(xc, t_s, t_nx_s, i=i, y_embed=y_embed):
                    t = jnp.full((B,), t_s, jnp.float32)
                    t_nx = jnp.full((B,), t_nx_s, jnp.float32)
                    c, g = self._cond(i, t, y_embed)
                    return self._segment_body(i, xc, c, mask, f_cos, f_sin,
                                              g, t_nx)
                x = self._scan_substeps(x, sig, vel)
                continue
            for s in range(number_of_step_perflow):
                t = jnp.full((B,), sig[s], jnp.float32)
                t_nx = jnp.full((B,), sig[s + 1], jnp.float32)
                c, g = self._cond(i, t, y_embed)
                if (return_representations
                        and self.rep_layers_per_flow > 0 and s == 0):
                    representations.append(self._rep_forward(
                        i, x, c, mask, f_cos, f_sin, g))
                v = self._segment_body(i, x, c, mask, f_cos, f_sin, g, t_nx)
                x = x + (sig[s + 1] - sig[s]) * v.astype(x.dtype)
            if return_intermediates:
                intermediates.append(x)
        if return_intermediates or return_representations:
            out = (x,)
            if return_intermediates:
                out += (jnp.stack(intermediates),)
            if return_representations:
                out += (jnp.stack(representations)
                        if representations else None,)
            return out
        return x

    def sample_cfg(self, x: Array, y: Array, cfg_scale: float,
                   number_of_step_perflow: int = 1) -> Array:
        """CFG double-batch variant (reference forward_cfg, :418-495)."""
        B = x.shape[0]
        grid, mask, size = make_grid_mask_size(
            2 * B, self.n_patch_h, self.n_patch_w, self.context_size)
        f_cos, f_sin = self._rope(grid, size)
        y2 = jnp.concatenate([y, jnp.full((B,), self.num_classes, y.dtype)])
        for i in range(self.number_of_perflow):
            y_embed = self._emb(self.y_embedders, i)(y2)
            sig = self._segment_sigma_list(i, number_of_step_perflow)

            def vel(xc, t_s, t_nx_s, i=i, y_embed=y_embed):
                t = jnp.full((2 * B,), t_s, jnp.float32)
                t_nx = jnp.full((2 * B,), t_nx_s, jnp.float32)
                c, g = self._cond(i, t, y_embed)
                x2 = jnp.concatenate([xc, xc], axis=0)
                v = self._segment_body(i, x2, c, mask, f_cos, f_sin, g,
                                       t_nx)
                v_cond, v_uncond = jnp.split(v, 2, axis=0)
                return v_uncond + cfg_scale * (v_cond - v_uncond)

            x = self._scan_substeps(x, sig, vel)
        return x

    def sample_maruyama_cfg(self, rng: Array, x: Array, y: Array,
                            cfg_scale: float,
                            number_of_step_perflow: int = 1,
                            guidance_low: float = 0.0,
                            guidance_high: float = 1.0) -> Array:
        """Per-segment Euler–Maruyama SDE with windowed CFG
        (reference fit_model_lwd_bk.py:1297-1404)."""
        B = x.shape[0]
        grid, mask, size = make_grid_mask_size(
            2 * B, self.n_patch_h, self.n_patch_w, self.context_size)
        f_cos, f_sin = self._rope(grid, size)
        y2 = jnp.concatenate([y, jnp.full((B,), self.num_classes, y.dtype)])
        K = self.number_of_perflow
        for i in range(K):
            y_embed = self._emb(self.y_embedders, i)(y2)
            sig = self._segment_sigma_list(i, number_of_step_perflow,
                                           maruyama_last=True)
            nsub = len(sig) - 1
            for s in range(nsub):
                t_cur = float(sig[s])
                dt = float(sig[s + 1] - sig[s])
                t = jnp.full((2 * B,), t_cur, jnp.float32)
                t_nx = jnp.full((2 * B,), float(sig[s + 1]), jnp.float32)
                c, g = self._cond(i, t, y_embed)
                x2 = jnp.concatenate([x, x], axis=0)
                v = self._segment_body(i, x2, c, mask, f_cos, f_sin, g,
                                       t_nx).astype(jnp.float32)
                x32 = x.astype(jnp.float32)
                diffusion = 1.0 - t_cur
                score = (t_cur * v - jnp.concatenate([x32, x32])) / max(
                    1.0 - t_cur, 1e-4)
                drift = v + 0.5 * diffusion * score
                d_cond, d_uncond = jnp.split(drift, 2, axis=0)
                in_window = (cfg_scale > 1.0 and guidance_low <= t_cur
                             <= guidance_high)
                drift = (d_uncond + cfg_scale * (d_cond - d_uncond)
                         if in_window else d_cond)
                x_next = x32 + drift * dt
                is_last = (i == K - 1) and (s == nsub - 1)
                if not is_last:
                    rng, k = jax.random.split(rng)
                    w = jax.random.normal(k, x.shape, jnp.float32)
                    x_next = x_next + np.sqrt(max(diffusion, 0.0)) \
                        * np.sqrt(abs(dt)) * w
                x = x_next.astype(x.dtype)
        return x

    # -- multi-scale sampler (reference fit_model_lwd_ms.py:312-487) ---------

    def sample_block_noise(self, rng: Array, shape: Tuple[int, ...],
                           gamma: float = 1.0 / 3.0) -> Array:
        """Block-correlated noise: each 2x2 latent block ~ N(0, (1+g)I - g11')
        (reference fit_model_lwd_ms.py:312-319). shape: (B, H, W, C) NHWC."""
        b, hx, wx, ch = shape
        cov = (1 + gamma) * np.eye(4) - gamma * np.ones((4, 4))
        chol = np.linalg.cholesky(cov + 1e-8 * np.eye(4))
        z = jax.random.normal(rng, (b, hx // 2, wx // 2, ch, 4), jnp.float32)
        z = jnp.einsum('...i,ji->...j', z, jnp.asarray(chol, jnp.float32))
        z = z.reshape(b, hx // 2, wx // 2, ch, 2, 2)
        z = jnp.einsum('bhwcpq->bhpwqc', z)
        return z.reshape(b, hx, wx, ch)

    def _repatchify(self, img: Array) -> Array:
        """(B, H, W, C) latent image -> (B, N, p**2*C) token sequence."""
        b, hx, wx, c = img.shape
        p = self.patch_size
        x = img.reshape(b, hx // p, p, wx // p, p, c)
        x = jnp.einsum('bhpwqc->bhwcpq', x)
        return x.reshape(b, (hx // p) * (wx // p), c * p * p)

    def sample_multiscale(self, rng: Array, x: Array, y: Array,
                          number_of_step_perflow: int = 1,
                          multi_scale_indices: Tuple[int, ...] = (2, 7),
                          per_blocks: Tuple[int, ...] = (2, 5, 5),
                          gamma: float = 1.0 / 3.0) -> Array:
        """Coarse-to-fine sampling (reference fit_model_lwd_ms.py:321-487):
        start at n_patch/4 resolution; at each multi-scale boundary
        unpatchify, 2x nearest-upsample, renoise with the alpha/beta/
        corrected-sigma correction and block-correlated noise, and continue
        on the finer grid. x: tokens at the COARSE (n_patch/4) resolution.

        sum(per_blocks) must equal number_of_perflow; len(per_blocks) =
        len(multi_scale_indices) + 1 coarse sigma segments.
        """
        assert sum(per_blocks) == self.number_of_perflow
        K = self.number_of_perflow
        B = x.shape[0]
        p = self.patch_size
        n_h, n_w = self.n_patch_h // 4, self.n_patch_w // 4
        sig = np.linspace(0.0, 1.0, len(per_blocks) + 1)

        def grids(nh, nw):
            g, m, s = make_grid_mask_size(B, nh, nw, nh * nw)
            fc, fs = self._rope(g, s)
            return g, m, fc, fs

        grid, mask, f_cos, f_sin = grids(n_h, n_w)

        sigma_idx, per_block_idx = 0, 0
        sigma_start, sigma_end = float(sig[0]), float(sig[1])
        for i in range(K):
            y_embed = self._emb(self.y_embedders, i)(y)
            if i in multi_scale_indices:
                per_block_idx = 0
                sigma_idx += 1
                sigma_start = float(sig[sigma_idx])
                sigma_end = float(sig[sigma_idx + 1])
                # unpatchify -> 2x nearest upsample -> renoise
                img = x.reshape(B, n_h, n_w, self.out_channels, p, p)
                img = jnp.einsum('bhwcpq->bhpwqc', img).reshape(
                    B, n_h * p, n_w * p, self.out_channels)
                n_h, n_w = n_h * 2, n_w * 2
                img = jax.image.resize(
                    img, (B, n_h * p, n_w * p, self.out_channels),
                    method='nearest')
                ori = sigma_start
                alpha = 1.0 / (np.sqrt(1 + 1 / gamma) * (1 - ori) + ori)
                beta = alpha * (1 - ori) / np.sqrt(gamma)
                sigma_start = alpha * ori  # corrected sigma
                rng, k = jax.random.split(rng)
                noise = self.sample_block_noise(k, img.shape, gamma)
                img = alpha * img + beta * noise.astype(img.dtype)
                x = self._repatchify(img)
                grid, mask, f_cos, f_sin = grids(n_h, n_w)

            frac0 = (per_block_idx % per_blocks[sigma_idx]) \
                / per_blocks[sigma_idx]
            frac1 = ((per_block_idx % per_blocks[sigma_idx]) + 1) \
                / per_blocks[sigma_idx]
            per_block_idx += 1
            s_cur = sigma_start + (sigma_end - sigma_start) * frac0
            s_next = sigma_start + (sigma_end - sigma_start) * frac1
            sub = np.linspace(s_cur, s_next, number_of_step_perflow + 1)
            for s in range(number_of_step_perflow):
                t = jnp.full((B,), sub[s], jnp.float32)
                t_nx = jnp.full((B,), sub[s + 1], jnp.float32)
                c, g = self._cond(i, t, y_embed)
                v = self._segment_body(i, x, c, mask, f_cos, f_sin, g, t_nx)
                x = x + float(sub[s + 1] - sub[s]) * v.astype(x.dtype)
        return x

    def unpatchify(self, x: Array, hw: Tuple[int, int],
                   channel_last: bool = False) -> Array:
        h, w = hw
        p = self.patch_size
        c = self.out_channels
        gh, gw = h // p, w // p
        x = x.reshape(x.shape[0], gh, gw, c, p, p)
        x = jnp.einsum('bhwcpq->bhpwqc', x)
        x = x.reshape(x.shape[0], h, w, c)
        return x if channel_last else jnp.transpose(x, (0, 3, 1, 2))


def repa_alignment_loss(proj: Array, target: Array,
                        mask: Optional[Array] = None) -> Array:
    """REPA: negative cosine similarity between projected representation
    tokens and frozen-encoder features (reference train.py:368-375).

    proj: (B, N, D); target: (B, N, D); mask: (B, N) or None. Returns (B,).
    """
    p = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-8)
    z = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.sum(p * z, axis=-1)  # (B, N)
    if mask is not None:
        cos = jnp.sum(cos * mask, axis=-1) / jnp.maximum(
            jnp.sum(mask, axis=-1), 1.0)
    else:
        cos = jnp.mean(cos, axis=-1)
    return -cos
