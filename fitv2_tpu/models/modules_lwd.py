"""LwD-specific auxiliary modules.

Ports of the remaining reference LwD module zoo
(/root/reference/fit/model/modules_lwd.py, modules_lwd_bk.py):
  - RepresentationBlock: identical math to FiTBlock (verified against
    modules_lwd.py:286-350 — same adaLN-zero block) -> alias.
  - FinalLayer_nomodulation (modules_lwd.py:373-383): norm + linear, no
    conditioning.
  - TimestepDependentCoefficient (modules_lwd_bk.py:21-58): sigmoid scalar
    from the t embedding, final bias -4.6 (starts near 0.01).
  - SRN (modules_lwd_bk.py:414-443): sigmoid-bounded modulated projection
    (per-token c supported through the generalized modulate).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from fitv2_tpu.models.modules import (
    Dense, FiTBlock, LayerNorm, SwiGLU, modulate, zeros,
)

Array = jax.Array
Dtype = Any

# Same block math; the LwD variant merely drops the attention mask at call
# sites (full square grids) — callers pass mask=None.
RepresentationBlock = FiTBlock


class FinalLayerNoModulation(nn.Module):
    """norm -> linear, no adaLN (reference modules_lwd.py:373-383)."""
    hidden_size: int
    patch_size: int
    out_channels: int
    norm_layer: str = 'layernorm'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, c: Optional[Array] = None) -> Array:
        x = LayerNorm(self.norm_layer, name='norm_final')(x)
        return Dense(self.patch_size * self.patch_size * self.out_channels,
                     dtype=self.dtype, name='linear')(x)


class TimestepDependentCoefficient(nn.Module):
    """sigmoid(MLP(t_emb)) in [0,1]; initialized near 0.01 via bias -4.6."""
    embedding_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: Array) -> Array:
        h = Dense(self.embedding_dim // 2, dtype=self.dtype, name='fc1')(
            t_emb)
        h = nn.silu(h)
        raw = Dense(1, dtype=self.dtype, kernel_init=zeros,
                    bias_init=nn.initializers.constant(-4.6),
                    name='fc2')(h)
        return jax.nn.sigmoid(raw)


class SRN(nn.Module):
    """Sigmoid-bounded modulated projection (reference modules_lwd_bk.py:
    414-443). concat_adaln doubles the conditioning input width."""
    hidden_size: int
    patch_size: int
    out_channels: int
    norm_layer: str = 'layernorm'
    adaln_bias: bool = True
    adaln_type: str = 'normal'
    concat_adaln: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, c: Array) -> Array:
        if self.adaln_type == 'swiglu':
            g = Dense(self.hidden_size // 2, use_bias=self.adaln_bias,
                      dtype=self.dtype, name='adaln_fc1_g')(c)
            v = Dense(self.hidden_size // 2, use_bias=self.adaln_bias,
                      dtype=self.dtype, name='adaln_fc1_x')(c)
            mod = Dense(2 * self.hidden_size, use_bias=self.adaln_bias,
                        dtype=self.dtype, name='adaln_fc2')(nn.silu(g) * v)
        else:
            mod = Dense(2 * self.hidden_size, use_bias=self.adaln_bias,
                        dtype=self.dtype,
                        name='adaln_fc_out')(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(LayerNorm(self.norm_layer, name='norm_final')(x),
                     shift, scale)
        out = Dense(self.out_channels, dtype=self.dtype, kernel_init=zeros,
                    name='linear')(x)
        return jax.nn.sigmoid(out)
