"""DINOv2 vision transformer (flax) for the REPA encoder zoo.

Covers the reference's ``dinov2`` branch of ``load_encoders``
(/root/reference/fit/utils/utils.py:267-300: ``torch.hub.load('dinov2')``,
``del encoder.head``, pos-embed resampled to the training resolution); the
frozen representation is ``forward_features``'s ``x_norm_patchtokens``.

Architectural differences from the generic pre-norm ViT (encoders/vit.py),
per the published DINOv2 code:
  - learned positional embedding (cls + patches) with bicubic
    interpolation to the input grid, plus a learned cls token and optional
    register tokens (dinov2_with_registers);
  - LayerScale on both residual branches (ls1/ls2 gamma);
  - MLP is GELU for S/B/L and SwiGLU-fused for the giant (w12/w3 naming).

Weights import from a torch hub state dict via
``convert_dinov2_state_dict`` (zero-egress environments pass a local file).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class DinoV2Block(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    swiglu_ffn: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, N, C = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name='norm1')(x)
        qkv = nn.Dense(3 * C, name='qkv')(h)
        q, k, v = (p.reshape(B, N, self.num_heads, C // self.num_heads)
                   for p in jnp.split(qkv, 3, axis=-1))
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(
            logits * (C // self.num_heads) ** -0.5, axis=-1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn.astype(v.dtype), v)
        out = nn.Dense(C, name='proj')(out.reshape(B, N, C))
        ls1 = self.param('ls1_gamma', nn.initializers.ones_init(), (C,),
                         jnp.float32)
        x = x + ls1.astype(out.dtype) * out

        h = nn.LayerNorm(epsilon=1e-6, name='norm2')(x)
        if self.swiglu_ffn:
            # dinov2 SwiGLUFFNFused: hidden = round8(2/3 * mlp_ratio * C)
            hidden = (int(C * self.mlp_ratio * 2 / 3) + 7) // 8 * 8
            w12 = nn.Dense(2 * hidden, name='w12')(h)
            a, b = jnp.split(w12, 2, axis=-1)
            m = nn.Dense(C, name='w3')(nn.silu(a) * b)
        else:
            m = nn.Dense(int(C * self.mlp_ratio), name='fc1')(h)
            m = nn.gelu(m, approximate=False)
            m = nn.Dense(C, name='fc2')(m)
        ls2 = self.param('ls2_gamma', nn.initializers.ones_init(), (C,),
                         jnp.float32)
        return x + ls2.astype(m.dtype) * m


class DinoV2ViT(nn.Module):
    """Returns normalized patch tokens (x_norm_patchtokens semantics)."""
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    swiglu_ffn: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (B, H, W, 3) NHWC, encoder-normalized."""
        p = self.patch_size
        h = nn.Conv(self.embed_dim, (p, p), strides=p, padding='VALID',
                    name='patch_embed')(x)
        B, gh, gw, C = h.shape
        h = h.reshape(B, gh * gw, C)

        n_base = (self.img_size // p) ** 2
        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, 1 + n_base, self.embed_dim), jnp.float32)
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if gh * gw != n_base:
            side = int(np.sqrt(n_base))
            pp = patch_pos.reshape(1, side, side, C)
            pp = jax.image.resize(pp, (1, gh, gw, C), method='cubic')
            patch_pos = pp.reshape(1, gh * gw, C)
        h = h + patch_pos.astype(h.dtype)

        cls = self.param('cls_token', nn.initializers.zeros_init(),
                         (1, 1, self.embed_dim), jnp.float32)
        tokens = [jnp.broadcast_to((cls + cls_pos).astype(h.dtype),
                                   (B, 1, C))]
        if self.num_register_tokens:
            reg = self.param('register_tokens',
                             nn.initializers.zeros_init(),
                             (1, self.num_register_tokens, self.embed_dim),
                             jnp.float32)
            tokens.append(jnp.broadcast_to(
                reg.astype(h.dtype), (B, self.num_register_tokens, C)))
        h = jnp.concatenate(tokens + [h], axis=1)

        for i in range(self.depth):
            h = DinoV2Block(self.num_heads, self.mlp_ratio,
                            self.swiglu_ffn, name=f'block{i}')(h)
        h = nn.LayerNorm(epsilon=1e-6, name='norm')(h)
        return h[:, 1 + self.num_register_tokens:]  # patch tokens only


def dinov2_vits14(**kw) -> DinoV2ViT:
    return DinoV2ViT(embed_dim=384, depth=12, num_heads=6, **kw)


def dinov2_vitb14(**kw) -> DinoV2ViT:
    return DinoV2ViT(embed_dim=768, depth=12, num_heads=12, **kw)


def dinov2_vitl14(**kw) -> DinoV2ViT:
    return DinoV2ViT(embed_dim=1024, depth=24, num_heads=16, **kw)


def dinov2_vitg14(**kw) -> DinoV2ViT:
    return DinoV2ViT(embed_dim=1536, depth=40, num_heads=24,
                     swiglu_ffn=True, **kw)


def convert_dinov2_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch-hub dinov2 state dict -> flax params."""
    flat: Dict[str, np.ndarray] = {}

    def lin(t, f):
        flat[f + '/kernel'] = np.ascontiguousarray(sd[t + '.weight'].T)
        if t + '.bias' in sd:
            flat[f + '/bias'] = sd[t + '.bias']

    def ln(t, f):
        flat[f + '/scale'] = sd[t + '.weight']
        flat[f + '/bias'] = sd[t + '.bias']

    flat['cls_token'] = sd['cls_token']
    flat['pos_embed'] = sd['pos_embed']
    if 'register_tokens' in sd:
        flat['register_tokens'] = sd['register_tokens']
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
        flat[f'{f}/ls1_gamma'] = sd[f'{pre}.ls1.gamma']
        flat[f'{f}/ls2_gamma'] = sd[f'{pre}.ls2.gamma']
        ln(f'{pre}.norm2', f'{f}/norm2')
        if f'{pre}.mlp.w12.weight' in sd:
            lin(f'{pre}.mlp.w12', f'{f}/w12')
            lin(f'{pre}.mlp.w3', f'{f}/w3')
        else:
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
        node[parts[-1]] = np.asarray(v, np.float32)
    return tree
