"""Perceptual / GAN losses: LPIPS, PatchGAN discriminator, hinge/vanilla.

TPU-native reimplementation of /root/reference/fit/losses/perceptual.py:9-388:
  - ``NLayerDiscriminator``: PatchGAN (the reference's SyncBatchNorm becomes
    flax BatchNorm with ``axis_name`` so stats sync across the mesh).
  - ``hinge_d_loss`` / ``vanilla_d_loss`` / ``adopt_weight`` /
    ``calculate_adaptive_weight`` (grad-norm-ratio weighting, done with two
    jax.grad calls instead of torch autograd.grad).
  - ``LPIPS``: VGG16-feature distance with linear heads; weights imported
    from a local torchvision/taming checkpoint (zero-egress: no download).
  - ``LPIPSWithDiscriminator2D``: the combined generator/discriminator loss.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# GAN losses (reference perceptual.py hinge_d_loss / vanilla_d_loss)
# ---------------------------------------------------------------------------

def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def adopt_weight(weight: float, global_step: Array, threshold: int = 0,
                 value: float = 0.0) -> Array:
    """Zero the weight until ``threshold`` steps (reference adopt_weight)."""
    return jnp.where(global_step < threshold, value, weight)


def calculate_adaptive_weight(nll_grad: Array, g_grad: Array,
                              discriminator_weight: float = 1.0) -> Array:
    """d_weight = |grad nll| / (|grad g| + eps), clamped to [0, 1e4]
    (reference calculate_adaptive_weight); inputs are gradients of each loss
    w.r.t. the generator's last-layer kernel."""
    d_weight = (jnp.linalg.norm(nll_grad)
                / (jnp.linalg.norm(g_grad) + 1e-4))
    return jnp.clip(d_weight, 0.0, 1e4) * discriminator_weight


# ---------------------------------------------------------------------------
# PatchGAN discriminator (reference NLayerDiscriminator)
# ---------------------------------------------------------------------------

class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN. NHWC. BatchNorm syncs over ``axis_name`` when set."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        kw, padw = 4, 1
        h = nn.Conv(self.ndf, (kw, kw), strides=2, padding=padw,
                    name='conv0')(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (kw, kw), strides=2, padding=padw,
                        use_bias=False, name=f'conv{n}')(h)
            h = nn.BatchNorm(use_running_average=not train,
                             axis_name=self.axis_name,
                             name=f'bn{n}')(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (kw, kw), strides=1, padding=padw,
                    use_bias=False, name=f'conv{self.n_layers}')(h)
        h = nn.BatchNorm(use_running_average=not train,
                         axis_name=self.axis_name,
                         name=f'bn{self.n_layers}')(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (kw, kw), strides=1, padding=padw,
                       name='conv_out')(h)


class NLayerDiscriminator3D(nn.Module):
    """3D PatchGAN over (B, T, H, W, C) video clips
    (reference perceptual.py NLayerDiscriminator3D)."""
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        kw, padw = 4, 1
        h = nn.Conv(self.ndf, (kw, kw, kw), strides=(1, 2, 2),
                    padding=padw, name='conv0')(x)
        h = nn.leaky_relu(h, 0.2)
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (kw, kw, kw), strides=(1, 2, 2),
                        padding=padw, use_bias=False, name=f'conv{n}')(h)
            h = nn.BatchNorm(use_running_average=not train,
                             axis_name=self.axis_name, name=f'bn{n}')(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (kw, kw, kw), strides=1, padding=padw,
                    use_bias=False, name=f'conv{self.n_layers}')(h)
        h = nn.BatchNorm(use_running_average=not train,
                         axis_name=self.axis_name,
                         name=f'bn{self.n_layers}')(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (kw, kw, kw), strides=1, padding=padw,
                       name='conv_out')(h)


# ---------------------------------------------------------------------------
# LPIPS (VGG16 features + linear heads)
# ---------------------------------------------------------------------------

_VGG16_CFG = (64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
              512, 512, 512, 'M', 512, 512, 512)
# relu indices (after which conv of each stage LPIPS taps): relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3
_LPIPS_TAPS = (1, 3, 6, 9, 12)  # conv indices in the sequential cfg
_LPIPS_CHANNELS = (64, 128, 256, 512, 512)

# ImageNet scaling used by LPIPS (taming convention)
_SHIFT = np.array([-.030, -.088, -.188], np.float32)
_SCALE = np.array([.458, .448, .450], np.float32)


class _VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: Array):
        feats = []
        conv_i = 0
        for v in _VGG16_CFG:
            if v == 'M':
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, name=f'conv{conv_i}')(x)
                x = nn.relu(x)
                if conv_i in _LPIPS_TAPS:
                    feats.append(x)
                conv_i += 1
        return feats


class LPIPS(nn.Module):
    """Perceptual distance; expects inputs in [-1, 1], NHWC."""

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xn = (x - shift) / scale
        yn = (y - shift) / scale
        vgg = _VGG16Features(name='vgg')
        fx = vgg(xn)
        fy = vgg(yn)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f'lin{i}')(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def convert_lpips_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """taming-transformers LPIPS checkpoint -> flax params.

    torch keys: net.slice{1..5}.<idx>.weight/bias (vgg convs, sequential
    indices) and lin{0..4}.model.1.weight (1x1 heads)."""
    flat: Dict[str, np.ndarray] = {}
    # rebuild the flat conv ordering from slices
    conv_i = 0
    torch_slice_convs = {
        1: (0, 2), 2: (5, 7), 3: (10, 12, 14), 4: (17, 19, 21),
        5: (24, 26, 28)}
    for s in range(1, 6):
        for idx in torch_slice_convs[s]:
            w = sd[f'net.slice{s}.{idx}.weight']
            b = sd[f'net.slice{s}.{idx}.bias']
            flat[f'vgg/conv{conv_i}/kernel'] = np.ascontiguousarray(
                w.transpose(2, 3, 1, 0))
            flat[f'vgg/conv{conv_i}/bias'] = b
            conv_i += 1
    for i in range(5):
        w = sd[f'lin{i}.model.1.weight']  # (1, C, 1, 1)
        flat[f'lin{i}/kernel'] = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        parts = path.split('/')
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v.astype(np.float32)
    return tree


# ---------------------------------------------------------------------------
# Combined loss (reference LPIPSWithDiscriminator2D)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LPIPSWithDiscriminator2D:
    """Generator/discriminator loss facade.

    Pure-functional: the caller owns params/batch-stats for the
    discriminator (and LPIPS), passes them in, and handles the two optimizer
    groups; this class only computes the loss terms
    (reference perceptual.py:69-260 forward semantics).
    """
    disc_start: int = 0
    disc_factor: float = 1.0
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_loss: str = 'hinge'
    pixel_loss: str = 'l1'

    def reconstruction_loss(self, lpips_fn: Optional[Callable],
                            inputs: Array, recons: Array) -> Array:
        if self.pixel_loss == 'l1':
            rec = jnp.abs(inputs - recons)
        else:
            rec = (inputs - recons) ** 2
        rec = jnp.mean(rec, axis=tuple(range(1, rec.ndim)))
        if lpips_fn is not None and self.perceptual_weight > 0:
            rec = rec + self.perceptual_weight * lpips_fn(inputs, recons)
        return rec

    def generator_loss(self, logits_fake: Array, nll: Array,
                       d_weight: Array, global_step: Array) -> Array:
        g_loss = -jnp.mean(logits_fake)
        factor = adopt_weight(self.disc_factor, global_step,
                              self.disc_start)
        return jnp.mean(nll) + d_weight * factor * g_loss

    def discriminator_loss(self, logits_real: Array, logits_fake: Array,
                           global_step: Array) -> Array:
        fn = hinge_d_loss if self.disc_loss == 'hinge' else vanilla_d_loss
        factor = adopt_weight(self.disc_factor, global_step,
                              self.disc_start)
        return factor * fn(logits_real, logits_fake)


# The 3D loss facade is identical math over video batches — the per-sample
# reduction in reconstruction_loss already averages over every non-batch
# dim, and the discriminator side just consumes NLayerDiscriminator3D
# logits (reference LPIPSWithDiscriminator3D, perceptual.py).
LPIPSWithDiscriminator3D = LPIPSWithDiscriminator2D
