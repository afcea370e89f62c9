"""SD-VAE (AutoencoderKL) in flax — on-device latent decode/encode.

The reference loads ``diffusers`` ``AutoencoderKL.from_pretrained(
'stabilityai/sd-vae-ft-ema')`` and decodes on GPU after the denoise loop
(/root/reference/sample_fitv2_ddp.py:108-113, 319-322). Here the decoder is a
flax module so the decode fuses into the jitted sampling program (NHWC layout
— TPU conv-friendly), with a weight importer from the published diffusers
torch checkpoints (fitv2_tpu/vae/torch_import.py).

Architecture (SD v1 KL-f8): 4x down/up factor 8, block_out_channels
(128, 256, 512, 512), 2 encoder / 3 decoder resnets per level, single-head
mid-block attention, GroupNorm(32) + SiLU, latent_channels=4,
scaling_factor 0.18215.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any

SD_VAE_SCALE = 0.18215  # reference sample_fitv2_ddp.py:322 (z / 0.18215)


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32 (torch parity, eps 1e-6).

    Falls back to C groups for tiny test configs with C < 32 channels
    (production SD-VAE channel counts are all multiples of 32)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dtype = x.dtype
        groups = 32 if x.shape[-1] >= 32 else x.shape[-1]
        out = nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                           dtype=jnp.float32, param_dtype=jnp.float32,
                           name='norm')(x.astype(jnp.float32))
        return out.astype(dtype)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = GroupNorm32(name='norm1')(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv1')(h)
        h = GroupNorm32(name='norm2')(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name='conv2')(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name='conv_shortcut')(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over the spatial grid (mid block)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        h = GroupNorm32(name='group_norm')(x).reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name='to_q')(h)
        k = nn.Dense(C, dtype=self.dtype, name='to_k')(h)
        v = nn.Dense(C, dtype=self.dtype, name='to_v')(h)
        attn = jnp.einsum('bqc,bkc->bqk', q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (C ** -0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum('bqk,bkc->bqc', attn, v)
        out = nn.Dense(C, dtype=self.dtype, name='to_out')(out)
        return x + out.reshape(B, H, W, C)


class Downsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # torch: asymmetric pad (0,1,0,1) then stride-2 conv, no padding
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=2, padding='VALID',
                       dtype=self.dtype, name='conv')(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method='nearest')
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name='conv')(x)


class MidBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = ResnetBlock(self.channels, self.dtype, name='resnets_0')(x)
        x = AttnBlock(self.dtype, name='attentions_0')(x)
        return ResnetBlock(self.channels, self.dtype, name='resnets_1')(x)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (B, H, W, 3) -> moments (B, H/8, W/8, 2*latent)."""
        ch = self.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(x)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock(c, self.dtype,
                                name=f'down_{i}_resnets_{j}')(h)
            if i < len(ch) - 1:
                h = Downsample(c, self.dtype, name=f'down_{i}_downsample')(h)
        h = MidBlock(ch[-1], self.dtype, name='mid_block')(h)
        h = GroupNorm32(name='conv_norm_out')(h)
        h = nn.silu(h)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name='conv_out')(h)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        """z: (B, h, w, latent) -> image (B, 8h, 8w, 3)."""
        ch = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        h = nn.Conv(ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name='conv_in')(z)
        h = MidBlock(ch[0], self.dtype, name='mid_block')(h)
        for i, c in enumerate(ch):
            for j in range(self.layers_per_block):
                h = ResnetBlock(c, self.dtype, name=f'up_{i}_resnets_{j}')(h)
            if i < len(ch) - 1:
                h = Upsample(c, self.dtype, name=f'up_{i}_upsample')(h)
        h = GroupNorm32(name='conv_norm_out')(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name='conv_out')(h)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode latent -> image. NHWC."""
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels,
                               latent_channels=self.latent_channels,
                               dtype=self.dtype)
        self.decoder = Decoder(self.block_out_channels, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype, name='quant_conv')
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       name='post_quant_conv')

    def encode(self, x: Array) -> Tuple[Array, Array]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: Array) -> Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: Array, rng: Optional[Array] = None) -> Array:
        mean, logvar = self.encode(x)
        if rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        else:
            z = mean
        return self.decode(z)


def sample_latent(rng: Array, mean: Array, logvar: Array) -> Array:
    """Reparameterized latent draw (DiagonalGaussianDistribution.sample)."""
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(
        rng, mean.shape, mean.dtype)


def latents_to_images_uint8(images: Array) -> Array:
    """[-1,1] float -> uint8 HWC (reference sample_fitv2_ddp.py:324-328)."""
    x = jnp.clip(images * 127.5 + 128.0, 0, 255)
    return jnp.floor(x).astype(jnp.uint8)
