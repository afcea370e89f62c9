"""Frozen ViT representation encoders (I-JEPA and friends) in flax.

Port of the reference's vendored I-JEPA ViT
(/root/reference/fit/encoders/jepa.py:15-546): conv patch embed, fixed 2D
sincos positional embedding, pre-norm transformer blocks with GELU MLPs,
final LayerNorm, returning patch tokens (the representation REPA aligns to).
The same architecture covers MAE/DeiT-style teachers; checkpoints are
imported from local torch files (zero egress).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from fitv2_tpu.models.rope import get_2d_sincos_pos_embed

Array = jax.Array


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-6, name='norm1')(x)
        B, N, C = h.shape
        qkv = nn.Dense(3 * C, name='qkv')(h)
        qkv = qkv.reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits * (C // self.num_heads) ** -0.5, -1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn.astype(v.dtype), v)
        out = nn.Dense(C, name='proj')(out.reshape(B, N, C))
        x = x + out
        h = nn.LayerNorm(epsilon=1e-6, name='norm2')(x)
        h = nn.Dense(int(C * self.mlp_ratio), name='fc1')(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, name='fc2')(h)
        return x + h


class VisionTransformer(nn.Module):
    """Returns patch tokens (B, N, D) — forward_features semantics."""
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (B, H, W, 3) NHWC in encoder-normalized space."""
        p = self.patch_size
        h = nn.Conv(self.embed_dim, (p, p), strides=p, padding='VALID',
                    name='patch_embed')(x)
        B, gh, gw, C = h.shape
        h = h.reshape(B, gh * gw, C)
        pe = get_2d_sincos_pos_embed(self.embed_dim, gh)
        h = h + jnp.asarray(pe, h.dtype)[None]
        for i in range(self.depth):
            h = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         name=f'block{i}')(h)
        return nn.LayerNorm(epsilon=1e-6, name='norm')(h)


def vit_base(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=768, depth=12, num_heads=12, **kw)


def vit_large(**kw) -> VisionTransformer:
    return VisionTransformer(embed_dim=1024, depth=24, num_heads=16, **kw)


def vit_huge(**kw) -> VisionTransformer:
    """I-JEPA ViT-H/14 (reference jepa.py vit_huge)."""
    return VisionTransformer(patch_size=14, embed_dim=1280, depth=32,
                             num_heads=16, **kw)


def convert_vit_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch ViT (timm/jepa naming) -> flax params. Handles
    patch_embed.proj (conv), blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2}, norm."""
    flat: Dict[str, np.ndarray] = {}

    def lin(t, f):
        flat[f + '/kernel'] = np.ascontiguousarray(sd[t + '.weight'].T)
        if t + '.bias' in sd:
            flat[f + '/bias'] = sd[t + '.bias']

    def ln(t, f):
        flat[f + '/scale'] = sd[t + '.weight']
        flat[f + '/bias'] = sd[t + '.bias']

    w = sd['patch_embed.proj.weight']  # (D, 3, p, p)
    flat['patch_embed/kernel'] = np.ascontiguousarray(
        w.transpose(2, 3, 1, 0))
    flat['patch_embed/bias'] = sd['patch_embed.proj.bias']
    i = 0
    while f'blocks.{i}.norm1.weight' in sd:
        pre, f = f'blocks.{i}', f'block{i}'
        ln(f'{pre}.norm1', f'{f}/norm1')
        lin(f'{pre}.attn.qkv', f'{f}/qkv')
        lin(f'{pre}.attn.proj', f'{f}/proj')
        ln(f'{pre}.norm2', f'{f}/norm2')
        lin(f'{pre}.mlp.fc1', f'{f}/fc1')
        lin(f'{pre}.mlp.fc2', f'{f}/fc2')
        i += 1
    ln('norm', 'norm')

    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        parts = path.split('/')
        for pp in parts[:-1]:
            node = node.setdefault(pp, {})
        node[parts[-1]] = v.astype(np.float32)
    return tree
