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
from fitv2_tpu.models.modules_lwd import SRN, TimestepDependentCoefficient
from fitv2_tpu.parallel.mesh import constrain_sequence

Array = jax.Array


class FiTLwDSharedEncSepDec(FiTLwD):
    """Adds the shared representation encoder + per-token conditioning."""
    number_of_representation_blocks: int = 4  # shared trunk length
    number_of_mid_blocks: int = 1             # rep forecaster depth (:163-171)
    # rep-extrapolation scales: forward_maruyama_cfg uses 1.05 (:1367-1369),
    # forward_maruyama_cfg2 uses 1.1 (:1466-1468) — per-sampler fields.
    self_guidance_scale: float = 1.05
    self_guidance_scale_global: float = 1.1

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
        self.shared_rep_blocks = BlockStack(R, self._block_kwargs(),
                                            self.sequence_mesh)
        self.rep_projection = ProjectionHead(self.repa_dim, dtype=self.dtype,
                                             sequence_mesh=self.sequence_mesh)
        if self.adaln_type == 'lora':
            self.global_adaLN_modulation2 = AdaLNModulation(
                self.hidden_size, 6, adaln_type='normal',
                use_bias=self.adaln_bias, dtype=self.dtype)
        # mid-block representation forecaster (finetune stage; reference
        # fit_model_lwd_bk.py:800-1084 mid_block + coefficient_layers)
        self.mid_blocks = BlockStack(self.number_of_mid_blocks,
                                     self._block_kwargs(),
                                     self.sequence_mesh)
        self.mid_coefficient = TimestepDependentCoefficient(
            self.hidden_size, dtype=self.dtype)
        self.mid_gate = SRN(self.hidden_size, self.patch_size,
                            self.hidden_size, adaln_bias=self.adaln_bias,
                            dtype=self.dtype)

    # -- shared encoder -------------------------------------------------------

    def _encode_representation(self, x_tokens: Array, c: Array, mask, f_cos,
                               f_sin, global_adaln) -> Array:
        r = self.representation_x_embedder2(x_tokens.astype(self.dtype))
        r = constrain_sequence(r, self.sequence_mesh)  # no-op when None
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
        # touch the mid-block forecaster so its params materialize at init
        for mode in ('replace', 'residual', 'blend'):
            self.forward_run_layer_finetune(x, t, y, 0, grid, mask,
                                            t_next=t, xt_next=x, size=size,
                                            mode=mode)
        return out

    __call__ = init_all

    def _segment_forward(self, i: int, x2: Array, t: Array, y2: Array,
                         mask, f_cos, f_sin, rep_transform=None
                         ) -> Tuple[Array, Array, Array]:
        """One velocity eval with per-token conditioning.

        Returns (velocity, encoder representation, pre-final hidden) — the
        latter two back the reference's _pca/_repre sampler variants.
        ``rep_transform`` hooks the representation before conditioning
        (self-guidance extrapolation, :1366-1374)."""
        y_embed = self._emb(self.y_embedders, i)(y2)
        c, g = self._cond(i, t, y_embed)
        t_emb = self._emb(self.t_embedders, i)(
            self._time_shift(t).astype(self.dtype))
        rep = self._encode_representation(x2, c, mask, f_cos, f_sin, g)
        if rep_transform is not None:
            rep = rep_transform(rep)
        c_repre, g2 = self._token_cond(t_emb, rep)
        h = self._emb(self.x_embedders, i)(x2.astype(self.dtype))
        h = self.segments[i](h, c_repre, mask, f_cos, f_sin, g2)
        out = self._emb(self.final_layers, i)(h, c_repre)
        return out * mask.astype(out.dtype)[..., None], rep, h

    def _segment_velocity(self, i: int, x2: Array, t: Array, y2: Array,
                          mask, f_cos, f_sin, rep_transform=None) -> Array:
        return self._segment_forward(i, x2, t, y2, mask, f_cos, f_sin,
                                     rep_transform)[0]

    def _self_guidance_transform(self, t_cur: float, cfg_scale: float,
                                 guidance_low: float, guidance_high: float,
                                 self_guidance: bool,
                                 scale: Optional[float] = None):
        """Representation extrapolation cond-vs-null inside the guidance
        window (reference :1366-1374 scale 1.05; cfg2 :1466-1468 scale 1.1)."""
        if not (self_guidance and cfg_scale > 1.0
                and guidance_low <= t_cur <= guidance_high):
            return None
        scale = self.self_guidance_scale if scale is None else scale

        def transform(rep):
            r_cond, r_null = jnp.split(rep, 2, axis=0)
            r_guided = r_null + scale * (r_cond - r_null)
            return jnp.concatenate([r_guided, r_null], axis=0)

        return transform

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
            # the guidance window is static (sig is a host array), so the
            # segment's sub-steps partition into contiguous same-branch
            # runs; each run is one scanned body (compile O(K), not O(K*S)
            # — _scan_substeps)
            flags = [bool(cfg_scale > 1.0
                          and guidance_low <= float(sig[s]) <= guidance_high)
                     for s in range(len(sig) - 1)]
            start = 0
            for end in range(1, len(flags) + 1):
                if end < len(flags) and flags[end] == flags[start]:
                    continue

                def vel(xc, t_s, t_nx_s, i=i, guided=flags[start]):
                    t = jnp.full((2 * B,), t_s, jnp.float32)
                    x2 = jnp.concatenate([xc, xc], axis=0)
                    v = self._segment_velocity(i, x2, t, y2, mask, f_cos,
                                               f_sin)
                    v_cond, v_uncond = jnp.split(v, 2, axis=0)
                    if guided:
                        return v_uncond + cfg_scale * (v_cond - v_uncond)
                    return v_cond

                x = self._scan_substeps(x, sig[start:end + 1], vel)
                start = end
        return x

    def sample(self, x: Array, y: Array, number_of_step_perflow: int = 1,
               return_intermediates: bool = False,
               return_representations: bool = False,
               return_semantics: bool = False,
               return_hidden: bool = False):
        """Per-segment Euler without CFG — the forward_wo_cfg family.

        Flags map to the reference sampler zoo (fit_model_lwd_bk.py):
          return_intermediates  -> forward_wo_cfg_int (:434) x after each
                                   sub-step
          return_representations-> forward_wo_cfg_repre (:534) projected
                                   encoder reps
          return_semantics      -> forward_wo_cfg_pca semantic_list (:403)
                                   raw encoder reps
          return_hidden         -> forward_wo_cfg_pca pca_list (:425)
                                   pre-final-layer hidden states
        Returns x, or (x, dict of requested lists).
        """
        B = x.shape[0]
        grid, mask, size = make_grid_mask_size(
            B, self.n_patch_h, self.n_patch_w, self.context_size)
        f_cos, f_sin = self._rope(grid, size)
        aux = {k: [] for k, on in [
            ('intermediates', return_intermediates),
            ('representations', return_representations),
            ('semantics', return_semantics),
            ('hidden', return_hidden)] if on}
        if not aux:
            # aux-less serving path: scan the sub-steps (compile O(K))
            for i in range(self.number_of_perflow):
                sig = self._segment_sigma_list(i, number_of_step_perflow)

                def vel(xc, t_s, t_nx_s, i=i):
                    t = jnp.full((B,), t_s, jnp.float32)
                    return self._segment_velocity(i, xc, t, y, mask, f_cos,
                                                  f_sin)

                x = self._scan_substeps(x, sig, vel)
            return x
        for i in range(self.number_of_perflow):
            sig = self._segment_sigma_list(i, number_of_step_perflow)
            for s in range(number_of_step_perflow):
                t = jnp.full((B,), float(sig[s]), jnp.float32)
                v, rep, h = self._segment_forward(i, x, t, y, mask, f_cos,
                                                  f_sin)
                x = x + (sig[s + 1] - sig[s]) * v.astype(x.dtype)
                if 'intermediates' in aux:
                    aux['intermediates'].append(x)
                if 'representations' in aux:
                    aux['representations'].append(self.rep_projection(rep))
                if 'semantics' in aux:
                    aux['semantics'].append(rep)
                if 'hidden' in aux:
                    aux['hidden'].append(h)
        return (x, aux) if aux else x

    def sample_maruyama(self, rng: Array, x: Array, y: Array,
                        number_of_step_perflow: int = 1,
                        return_intermediates: bool = False):
        """Per-segment Euler–Maruyama without CFG (forward_maruyama :1191;
        return_intermediates -> forward_maruyama_int :1562)."""
        B = x.shape[0]
        grid, mask, size = make_grid_mask_size(
            B, self.n_patch_h, self.n_patch_w, self.context_size)
        f_cos, f_sin = self._rope(grid, size)
        K = self.number_of_perflow
        inter = []
        for i in range(K):
            sig = self._segment_sigma_list(i, number_of_step_perflow,
                                           maruyama_last=True)
            nsub = len(sig) - 1
            for s in range(nsub):
                t_cur = float(sig[s])
                dt = float(sig[s + 1] - sig[s])
                t = jnp.full((B,), t_cur, jnp.float32)
                v = self._segment_velocity(i, x, t, y, mask, f_cos,
                                           f_sin).astype(jnp.float32)
                x32 = x.astype(jnp.float32)
                # reference forward_maruyama (:1286-1294): drift uses the
                # FULL (1-t)*score with noise sqrt(2*(1-t))*dw — unlike
                # forward_maruyama_cfg, which halves both (see
                # sample_maruyama_cfg below).
                diffusion = 1.0 - t_cur
                score = (t_cur * v - x32) / max(1.0 - t_cur, 1e-4)
                x_next = x32 + (v + diffusion * score) * dt
                if not (i == K - 1 and s == nsub - 1):
                    rng, k = jax.random.split(rng)
                    w = jax.random.normal(k, x.shape, jnp.float32)
                    x_next = x_next + np.sqrt(max(2.0 * diffusion, 0.0)) \
                        * np.sqrt(abs(dt)) * w
                x = x_next.astype(x.dtype)
                if return_intermediates:
                    inter.append(x)
        return (x, inter) if return_intermediates else x

    def sample_maruyama_global_cfg(self, rng: Array, x: Array, y: Array,
                                   cfg_scale: float, num_steps: int = 250,
                                   guidance_low: float = 0.0,
                                   guidance_high: float = 1.0,
                                   self_guidance: bool = False,
                                   t_end: float = 0.96) -> Array:
        """Global-grid Euler–Maruyama CFG (forward_maruyama_cfg2 :1407-1560).

        Unlike the per-segment sampler, the sigma ladder spans [0, t_end]
        globally with ``num_steps`` points (+ a final deterministic Euler
        step to 1.0); the decoder segment is picked per step via
        get_segment_index(t); diffusion = 2(1-t); the batch is doubled only
        inside the guidance window. fp32 state (torch fp64 -> TPU fp32)."""
        B = x.shape[0]
        grid, mask, size = make_grid_mask_size(
            B, self.n_patch_h, self.n_patch_w, self.context_size)
        grid2, mask2, size2 = make_grid_mask_size(
            2 * B, self.n_patch_h, self.n_patch_w, self.context_size)
        f_cos, f_sin = self._rope(grid, size)
        f_cos2, f_sin2 = self._rope(grid2, size2)
        y_null = jnp.full((B,), self.num_classes, y.dtype)
        y2 = jnp.concatenate([y, y_null])
        sig = np.concatenate([np.linspace(0.0, t_end, num_steps), [1.0]])

        def drift_at(t_cur: float, x32: Array) -> Array:
            i = self.get_segment_index(t_cur)
            doubled = cfg_scale > 1.0 and guidance_low <= t_cur <= guidance_high
            if doubled:
                xin = jnp.concatenate([x32, x32]).astype(x.dtype)
                tr = self._self_guidance_transform(
                    t_cur, cfg_scale, guidance_low, guidance_high,
                    self_guidance, scale=self.self_guidance_scale_global)
                t = jnp.full((2 * B,), t_cur, jnp.float32)
                v = self._segment_velocity(i, xin, t, y2, mask2, f_cos2,
                                           f_sin2, tr).astype(jnp.float32)
                xin32 = jnp.concatenate([x32, x32])
            else:
                xin = x32.astype(x.dtype)
                t = jnp.full((B,), t_cur, jnp.float32)
                v = self._segment_velocity(i, xin, t, y, mask, f_cos,
                                           f_sin).astype(jnp.float32)
                xin32 = x32
            diffusion = 2.0 * (1.0 - t_cur)
            score = (t_cur * v - xin32) / max(1.0 - t_cur, 1e-4)
            drift = v + 0.5 * diffusion * score
            if doubled:
                d_cond, d_uncond = jnp.split(drift, 2, axis=0)
                drift = d_uncond + cfg_scale * (d_cond - d_uncond)
            return drift, diffusion

        x32 = x.astype(jnp.float32)
        for t_cur, t_next in zip(sig[:-2], sig[1:-1]):
            dt = float(t_next - t_cur)
            drift, diffusion = drift_at(float(t_cur), x32)
            rng, k = jax.random.split(rng)
            w = jax.random.normal(k, x32.shape, jnp.float32)
            x32 = x32 + drift * dt \
                + np.sqrt(max(diffusion, 0.0)) * np.sqrt(abs(dt)) * w
        # last step: deterministic Euler to 1.0 (:1500-1560)
        t_cur = float(sig[-2])
        drift, _ = drift_at(t_cur, x32)
        x32 = x32 + drift * float(sig[-1] - sig[-2])
        return x32.astype(x.dtype)

    # -- mid-block representation forecasting (finetune stage) ----------------

    def forward_run_layer_finetune(self, x: Array, t: Array, y: Array,
                                   segment_idx: int, grid: Array,
                                   mask: Array, t_next: Array,
                                   xt_next: Array,
                                   size: Optional[Array] = None,
                                   mode: str = 'replace'):
        """Train the cheap mid-block stack to forecast the shared encoder's
        representation at the NEXT sub-step (reference finetune family,
        fit_model_lwd_bk.py:800-1084). The trunk is frozen via
        stop_gradient; only the forecaster path carries gradients.

        mode: 'replace'  rep_t = mid(x)                 (:800-920, finetune)
              'residual' rep_t = rep + coeff(t)*mid(x)  (:1009-1084, ft2)
              'blend'    rep_t = (1-g)*rep + g*mid(x)   (:922-1007, ft3)
        where rep is the frozen encoder output at (t_next, xt_next), coeff
        is the timestep-dependent scalar, g the SRN per-token gate.

        Returns dict(x_pred, x_target, rep_pred, rep_target): x_target /
        rep_target come from the frozen full encoder at (t, x).
        """
        sg = jax.lax.stop_gradient
        f_cos, f_sin = self._rope(grid, size)
        i = segment_idx
        y_embed = self._emb(self.y_embedders, i)(y)
        t_emb = self._emb(self.t_embedders, i)(
            self._time_shift(t).astype(self.dtype))
        c_next, g_next = self._cond(i, t_next, y_embed)
        rep_frozen = sg(self._encode_representation(
            xt_next, c_next, mask, f_cos, f_sin, g_next))

        x_mid = sg(self.representation_x_embedder2(x.astype(self.dtype)))
        c_mid = t_emb[:, None, :] + rep_frozen
        mid_out = self.mid_blocks(x_mid, c_mid, mask, f_cos, f_sin, 0.0)
        if mode == 'replace':
            rep_t = mid_out
        elif mode == 'residual':
            coeff = self.mid_coefficient(t_emb)  # (B, 1) in [0, 1]
            rep_t = rep_frozen + coeff[:, None, :] * mid_out
        elif mode == 'blend':
            gate = self.mid_gate(x_mid, c_mid)   # (B, N, D) in [0, 1]
            rep_t = (1.0 - gate) * rep_frozen + gate * mid_out
        else:
            raise ValueError(f'unknown finetune mode: {mode}')
        rep_pred = self.rep_projection(rep_t)

        # prediction: decoder segment conditioned on the forecast rep
        c_repre, g2 = self._token_cond(t_emb, rep_t)
        h = self._emb(self.x_embedders, i)(x.astype(self.dtype))
        h = self.segments[i](h, c_repre, mask, f_cos, f_sin, g2)
        x_pred = self._emb(self.final_layers, i)(h, c_repre)
        x_pred = x_pred * mask.astype(x_pred.dtype)[..., None]

        # target: frozen full-encoder path at (t, x)
        c, g = self._cond(i, t, y_embed)
        rep2 = self._encode_representation(x, c, mask, f_cos, f_sin, g)
        rep_target = sg(self.rep_projection(rep2))
        c_repre2, g22 = self._token_cond(t_emb, rep2)
        h2 = self._emb(self.x_embedders, i)(x.astype(self.dtype))
        h2 = self.segments[i](h2, c_repre2, mask, f_cos, f_sin, g22)
        x_target = self._emb(self.final_layers, i)(h2, c_repre2)
        x_target = sg(x_target * mask.astype(x_target.dtype)[..., None])

        return {'x_pred': x_pred, 'x_target': x_target,
                'rep_pred': rep_pred, 'rep_target': rep_target}

    def sample_maruyama_cfg(self, rng: Array, x: Array, y: Array,
                            cfg_scale: float,
                            number_of_step_perflow: int = 1,
                            guidance_low: float = 0.0,
                            guidance_high: float = 1.0,
                            self_guidance: bool = False) -> Array:
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
                tr = self._self_guidance_transform(
                    t_cur, cfg_scale, guidance_low, guidance_high,
                    self_guidance)
                v = self._segment_velocity(i, x2, t, y2, mask, f_cos,
                                           f_sin, tr).astype(jnp.float32)
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
