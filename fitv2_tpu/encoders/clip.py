"""OpenAI CLIP visual tower (ViT) in flax, for the REPA encoder zoo.

Covers the reference's ``clip`` branch of ``load_encoders``
(/root/reference/fit/utils/utils.py:301-320): it wraps
``clip.load('ViT-<cfg>/14').visual`` in REPA's UpdatedVisionTransformer and
uses ``forward_features`` tokens as the frozen representation teacher
(class token dropped, no final projection — REPA convention).

Architecture (CLIP's published ViT visual encoder — differs from the
jepa/mae ViT in encoders/vit.py):
  - patchify conv WITHOUT bias
  - learned class embedding prepended + learned positional embedding
  - pre-transformer LayerNorm (ln_pre)
  - residual blocks with torch.nn.MultiheadAttention packing
    (in_proj_weight) and quickGELU (x * sigmoid(1.702 x)) MLPs
  - ln_post + linear projection matrix (kept for completeness; the teacher
    path stops at tokens)

Weights import from an OpenAI clip / open_clip state dict via
``convert_clip_visual_state_dict`` (keys with or without the ``visual.``
prefix; zero-egress environments pass a local file).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def quick_gelu(x: Array) -> Array:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible self attention."""
    num_heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, N, C = x.shape
        H = self.num_heads
        dh = C // H
        qkv = nn.Dense(3 * C, name='in_proj')(x)
        q, k, v = (p.reshape(B, N, H, dh) for p in jnp.split(qkv, 3, -1))
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32) * dh ** -0.5
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, v).reshape(B, N, C)
        return nn.Dense(C, name='out_proj')(out)


class CLIPBlock(nn.Module):
    """ResidualAttentionBlock: pre-LN attention + quickGELU MLP."""
    num_heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x + CLIPAttention(self.num_heads, name='attn')(
            nn.LayerNorm(epsilon=1e-5, name='ln_1')(x))
        h = nn.LayerNorm(epsilon=1e-5, name='ln_2')(x)
        h = nn.Dense(4 * x.shape[-1], name='c_fc')(h)
        h = quick_gelu(h)
        return x + nn.Dense(x.shape[-1], name='c_proj')(h)


class CLIPVisionTransformer(nn.Module):
    """CLIP .visual. __call__ returns (tokens_with_cls, pooled_projection)."""
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    output_dim: int = 768

    @nn.compact
    def __call__(self, x: Array):
        """x: (B, H, W, 3) NHWC, CLIP-normalized."""
        p = self.patch_size
        h = nn.Conv(self.width, (p, p), strides=p, padding='VALID',
                    use_bias=False, name='conv1')(x)
        B, gh, gw, C = h.shape
        h = h.reshape(B, gh * gw, C)
        cls = self.param('class_embedding', nn.initializers.normal(0.02),
                         (C,), jnp.float32)
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(h.dtype), (B, 1, C)), h], axis=1)
        pos = self.param('positional_embedding',
                         nn.initializers.normal(0.01),
                         (gh * gw + 1, C), jnp.float32)
        h = h + pos.astype(h.dtype)[None]
        h = nn.LayerNorm(epsilon=1e-5, name='ln_pre')(h)
        for i in range(self.depth):
            h = CLIPBlock(self.num_heads, name=f'resblock{i}')(h)
        tokens = h
        pooled = nn.LayerNorm(epsilon=1e-5, name='ln_post')(h[:, 0])
        proj = self.param('proj', nn.initializers.normal(0.01),
                          (C, self.output_dim), jnp.float32)
        return tokens, pooled @ proj.astype(pooled.dtype)

    def forward_features(self, x: Array) -> Array:
        """REPA teacher tokens: class token dropped, no projection."""
        tokens, _ = self(x)
        return tokens[:, 1:]


def clip_vit_b16(**kw) -> CLIPVisionTransformer:
    return CLIPVisionTransformer(patch_size=16, width=768, depth=12,
                                 num_heads=12, output_dim=512, **kw)


def clip_vit_l14(**kw) -> CLIPVisionTransformer:
    return CLIPVisionTransformer(patch_size=14, width=1024, depth=24,
                                 num_heads=16, output_dim=768, **kw)


def convert_clip_visual_state_dict(sd: Dict[str, np.ndarray],
                                   depth: Optional[int] = None
                                   ) -> Dict[str, Any]:
    """OpenAI clip state dict (full model or .visual subtree) -> flax params.

    Accepts keys with or without the 'visual.' prefix; text-tower keys are
    ignored. torch MultiheadAttention packs qkv as in_proj_weight (3W, W).
    """
    if any(k.startswith('visual.') for k in sd):
        # full CLIP checkpoint: keep the visual tower, drop the text tower
        sd = {k[len('visual.'):]: v for k, v in sd.items()
              if k.startswith('visual.')}
    flat: Dict[str, np.ndarray] = {}

    def lin(t, f):
        w = sd[t + '.weight']
        flat[f + '/kernel'] = np.ascontiguousarray(w.T)
        if t + '.bias' in sd:
            flat[f + '/bias'] = sd[t + '.bias']

    def ln(t, f):
        flat[f + '/scale'] = sd[t + '.weight']
        flat[f + '/bias'] = sd[t + '.bias']

    w = sd['conv1.weight']  # (C, 3, p, p) -> (p, p, 3, C)
    flat['conv1/kernel'] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    flat['class_embedding'] = sd['class_embedding']
    flat['positional_embedding'] = sd['positional_embedding']
    flat['proj'] = sd['proj']
    ln('ln_pre', 'ln_pre')
    ln('ln_post', 'ln_post')
    if depth is None:
        depth = 1 + max(int(k.split('.')[2]) for k in sd
                        if k.startswith('transformer.resblocks.'))
    for i in range(depth):
        t = f'transformer.resblocks.{i}'
        f = f'resblock{i}'
        ln(f'{t}.ln_1', f'{f}/ln_1')
        ln(f'{t}.ln_2', f'{f}/ln_2')
        wq = sd[f'{t}.attn.in_proj_weight']  # (3W, W)
        flat[f'{f}/attn/in_proj/kernel'] = np.ascontiguousarray(wq.T)
        if f'{t}.attn.in_proj_bias' in sd:
            flat[f'{f}/attn/in_proj/bias'] = sd[f'{t}.attn.in_proj_bias']
        lin(f'{t}.attn.out_proj', f'{f}/attn/out_proj')
        lin(f'{t}.mlp.c_fc', f'{f}/c_fc')
        lin(f'{t}.mlp.c_proj', f'{f}/c_proj')

    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        parts = path.split('/')
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = np.asarray(v, np.float32)
    return tree
