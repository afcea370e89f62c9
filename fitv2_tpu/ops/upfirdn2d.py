"""upfirdn2d: upsample -> FIR filter -> downsample (StyleGAN resampling).

TPU-native equivalent of the reference CUDA plugin
(/root/reference/torch_utils/ops/upfirdn2d.{cpp,cu} + upfirdn2d.py): zero-
insertion upsampling by (upx, upy), 2D FIR filtering, crop/pad, and strided
downsampling by (downx, downy) — expressed as one
``lax.conv_general_dilated`` (lhs_dilation = upsampling, window_stride =
downsampling), which XLA lowers to a single fused conv; gradients come from
JAX autodiff (the reference hand-writes the transpose pass).

Also provides filtered 2x up/downsample wrappers and ``filtered_lrelu``-less
``conv2d_resample`` equivalent used by the GAN discriminator path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def _parse_scaling(scaling) -> Tuple[int, int]:
    if isinstance(scaling, int):
        return scaling, scaling
    sx, sy = scaling
    return int(sx), int(sy)


def _parse_padding(padding) -> Tuple[int, int, int, int]:
    if isinstance(padding, int):
        return padding, padding, padding, padding
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def setup_filter(f, normalize: bool = True, flip_filter: bool = False,
                 gain: float = 1.0, separable: Optional[bool] = None
                 ) -> jnp.ndarray:
    """Build a 2D FIR kernel (reference upfirdn2d.py setup_filter parity)."""
    if f is None:
        f = 1
    f = np.asarray(f, np.float32)
    if f.ndim == 0:
        f = f[None]
    assert f.ndim in (1, 2)
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(np.ascontiguousarray(f))


def upfirdn2d(x: Array, f: Optional[Array], up=1, down=1, padding=0,
              flip_filter: bool = False, gain: float = 1.0) -> Array:
    """x: (B, C, H, W) NCHW (reference layout). Returns filtered/resampled."""
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)

    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)
    fh, fw = f.shape
    f = f * gain  # callers fold the up-energy factor into gain (ref parity)
    if not flip_filter:
        f = f[::-1, ::-1]  # conv vs correlation

    b, c, h, w = x.shape
    x = x.reshape(b * c, 1, h, w)
    kernel = f.astype(x.dtype).reshape(1, 1, fh, fw)

    # The reference zero-inserts to h*up (trailing zeros after the last
    # sample, upfirdn2d.py reference impl); lax lhs_dilation produces
    # (h-1)*up+1, so add the missing (up-1) trailing zeros as padding.
    # Asymmetric padding can be negative (crop) — lax.conv handles both.
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(downy, downx),
        padding=((py0, py1 + upy - 1), (px0, px1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    _, _, oh, ow = out.shape
    return out.reshape(b, c, oh, ow)


def upsample2d(x: Array, f: Optional[Array], up: int = 2,
               padding: int = 0, flip_filter: bool = False,
               gain: float = 1.0) -> Array:
    upx, upy = _parse_scaling(up)
    px0, px1, py0, py1 = _parse_padding(padding)
    fh = 1 if f is None else f.shape[0]
    fw = 1 if f is None else f.shape[-1]
    p = (px0 + (fw + upx - 1) // 2, px1 + (fw - upx) // 2,
         py0 + (fh + upy - 1) // 2, py1 + (fh - upy) // 2)
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x: Array, f: Optional[Array], down: int = 2,
                 padding: int = 0, flip_filter: bool = False,
                 gain: float = 1.0) -> Array:
    downx, downy = _parse_scaling(down)
    px0, px1, py0, py1 = _parse_padding(padding)
    fh = 1 if f is None else f.shape[0]
    fw = 1 if f is None else f.shape[-1]
    p = (px0 + (fw - downx + 1) // 2, px1 + (fw - downx) // 2,
         py0 + (fh - downy + 1) // 2, py1 + (fh - downy) // 2)
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter,
                     gain=gain)


def filter2d(x: Array, f: Array, padding=0, flip_filter: bool = False,
             gain: float = 1.0) -> Array:
    px0, px1, py0, py1 = _parse_padding(padding)
    fh, fw = (f.shape[0], f.shape[-1])
    p = (px0 + fw // 2, px1 + (fw - 1) // 2,
         py0 + fh // 2, py1 + (fh - 1) // 2)
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)
