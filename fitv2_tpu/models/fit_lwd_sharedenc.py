"""FiTLwD shared-encoder / separate-decoder variant (the 'bk' family).

TPU-native reimplementation of
/root/reference/fit/model/fit_model_lwd_bk.py:20-1878
(FiTLwD_sharedenc_sepdec): a representation ENCODER stack shared across all
segments produces per-token features; conditioning becomes per-token
(c_repre = t_emb[:, None, :] + representation tokens,
fit_model_lwd_bk.py forward_maruyama_cfg) through a second global adaLN head
(global_adaLN_modulation2); per-segment DECODER block stacks then integrate
each sub-flow. Sampler zoo covered: plain per-segment Euler
(forward_wo_cfg), windowed-CFG Euler (forward_cfg), Euler–Maruyama SDE with
guidance windows and optional representation self-guidance
(forward_maruyama_cfg, :1297-1404).

Per-token conditioning rides the generalized modulate() in
fitv2_tpu/models/modules.py (_expand_mod) — FiTBlock accepts (B, N, D) c.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from fitv2_tpu.models.fit_lwd import BlockStack, FiTLwD, ProjectionHead
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.models.modules import AdaLNModulation, PatchEmbedder

Array = jax.Array


class FiTLwDSharedEncSepDec(FiTLwD):
    """Adds the shared representation encoder + per-token conditioning."""
    number_of_representation_blocks: int = 4  # shared trunk length
    self_guidance_scale: float = 1.05         # (:1370-1374)

    @property
    def rep_layers_per_flow(self) -> int:
        # the encoder is SHARED (not per segment) in this variant
        return 0

    def setup(self):
        super().setup()
        R = self.number_of_representation_blocks
        assert R >= 1
        self.representation_x_embedder2 = PatchEmbedder(
            self.hidden_size, dtype=self.dtype)
        self.shared_rep_blocks = BlockStack(R, self._block_kwargs())
        self.rep_projection = ProjectionHead(self.repa_dim, dtype=self.dtype)
        if self.adaln_type == 'lora':
            self.global_adaLN_modulation2 = AdaLNModulation(
                self.hidden_size, 6, adaln_type='normal',
                use_bias=self.adaln_bias, dtype=self.dtype)

    # -- shared encoder -------------------------------------------------------

    def _encode_representation(self, x_tokens: Array, c: Array, mask, f_cos,
                               f_sin, global_adaln) -> Array:
        r = self.representation_x_embedder2(x_tokens.astype(self.dtype))
        return self.shared_rep_blocks(r, c, mask, f_cos, f_sin, global_adaln)

    def _token_cond(self, t_emb: Array, rep: Array):
        """c_repre = t_emb per-token + representation tokens (:1378)."""
        c_repre = t_emb[:, None, :] + rep
        if self.adaln_type == 'lora':
            return c_repre, self.global_adaLN_modulation2(c_repre)
        return c_repre, 0.0

    # -- training: one segment with shared-encoder conditioning ---------------

    def forward_run_layer(self, x: Array, t: Array, y: Array,
                          segment_idx: int, grid: Array, mask: Array,
                          size: Optional[Array] = None, train: bool = False,
                          force_drop_ids: Optional[Array] = None
                          ) -> Tuple[Array, Optional[Array]]:
        f_cos, f_sin = self._rope(grid, size)
        y_embed = self._emb(self.y_embedders, segment_idx)(
            y, train, force_drop_ids)
        c, g = self._cond(segment_idx, t, y_embed)
        t_emb = self._emb(self.t_embedders, segment_idx)(
            self._time_shift(t).astype(self.dtype))
        rep = self._encode_representation(x, c, mask, f_cos, f_sin, g)
        c_repre, g2 = self._token_cond(t_emb, rep)
        h = self._emb(self.x_embedders, segment_idx)(x.astype(self.dtype))
        h = self.segments[segment_idx](h, c_repre, mask, f_cos, f_sin, g2)
        out = self._emb(self.final_layers, segment_idx)(h, c_repre)
        out = out * mask.astype(out.dtype)[..., None]
        return out, self.rep_projection(rep)

    def init_all(self, x, t, y, grid, mask, size=None):
        out = None
        for i in range(self.number_of_perflow):
            out, _ = self.forward_run_layer(x, t, y, i, grid, mask, size,
                                            train=True)
        return out

    __call__ = init_all

    def _segment_velocity(self, i: int, x2: Array, t: Array, y2: Array,
                          mask, f_cos, f_sin) -> Array:
        """One doubled-batch velocity eval with per-token conditioning."""
        y_embed = self._emb(self.y_embedders, i)(y2)
        c, g = self._cond(i, t, y_embed)
        t_emb = self._emb(self.t_embedders, i)(
            self._time_shift(t).astype(self.dtype))
        rep = self._encode_representation(x2, c, mask, f_cos, f_sin, g)
        c_repre, g2 = self._token_cond(t_emb, rep)
        h = self._emb(self.x_embedders, i)(x2.astype(self.dtype))
        h = self.segments[i](h, c_repre, mask, f_cos, f_sin, g2)
        out = self._emb(self.final_layers, i)(h, c_repre)
        return out * mask.astype(out.dtype)[..., None]

    # -- samplers ---------------------------------------------------------------

    def sample_cfg(self, x: Array, y: Array, cfg_scale: float,
                   number_of_step_perflow: int = 1,
                   guidance_low: float = 0.0,
                   guidance_high: float = 1.0) -> Array:
        """Windowed-CFG per-segment Euler (forward_cfg semantics)."""
        B = x.shape[0]
        grid, mask, size = make_grid_mask_size(
            2 * B, self.n_patch_h, self.n_patch_w, self.context_size)
        f_cos, f_sin = self._rope(grid, size)
        y2 = jnp.concatenate([y, jnp.full((B,), self.num_classes, y.dtype)])
        for i in range(self.number_of_perflow):
            sig = self._segment_sigma_list(i, number_of_step_perflow)
            for s in range(number_of_step_perflow):
                t_cur = float(sig[s])
                t = jnp.full((2 * B,), t_cur, jnp.float32)
                x2 = jnp.concatenate([x, x], axis=0)
                v = self._segment_velocity(i, x2, t, y2, mask, f_cos,
                                           f_sin).astype(x.dtype)
                v_cond, v_uncond = jnp.split(v, 2, axis=0)
                if cfg_scale > 1.0 and guidance_low <= t_cur <= guidance_high:
                    v = v_uncond + cfg_scale * (v_cond - v_uncond)
                else:
                    v = v_cond
                x = x + (sig[s + 1] - sig[s]) * v
        return x

    def sample_maruyama_cfg(self, rng: Array, x: Array, y: Array,
                            cfg_scale: float,
                            number_of_step_perflow: int = 1,
                            guidance_low: float = 0.0,
                            guidance_high: float = 1.0) -> Array:
        """Per-segment Euler–Maruyama with guidance windows (:1297-1404)."""
        B = x.shape[0]
        grid, mask, size = make_grid_mask_size(
            2 * B, self.n_patch_h, self.n_patch_w, self.context_size)
        f_cos, f_sin = self._rope(grid, size)
        y2 = jnp.concatenate([y, jnp.full((B,), self.num_classes, y.dtype)])
        K = self.number_of_perflow
        for i in range(K):
            sig = self._segment_sigma_list(i, number_of_step_perflow,
                                           maruyama_last=True)
            nsub = len(sig) - 1
            for s in range(nsub):
                t_cur = float(sig[s])
                dt = float(sig[s + 1] - sig[s])
                t = jnp.full((2 * B,), t_cur, jnp.float32)
                x2 = jnp.concatenate([x, x], axis=0)
                v = self._segment_velocity(i, x2, t, y2, mask, f_cos,
                                           f_sin).astype(jnp.float32)
                x32 = x.astype(jnp.float32)
                diffusion = 1.0 - t_cur
                score = (t_cur * v - jnp.concatenate([x32, x32])) / max(
                    1.0 - t_cur, 1e-4)
                drift = v + 0.5 * diffusion * score
                d_cond, d_uncond = jnp.split(drift, 2, axis=0)
                in_window = (cfg_scale > 1.0
                             and guidance_low <= t_cur <= guidance_high)
                drift = (d_uncond + cfg_scale * (d_cond - d_uncond)
                         if in_window else d_cond)
                x_next = x32 + drift * dt
                if not (i == K - 1 and s == nsub - 1):
                    rng, k = jax.random.split(rng)
                    w = jax.random.normal(k, x.shape, jnp.float32)
                    x_next = x_next + np.sqrt(max(diffusion, 0.0)) \
                        * np.sqrt(abs(dt)) * w
                x = x_next.astype(x.dtype)
        return x
