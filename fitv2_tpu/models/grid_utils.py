"""Grid/mask/size constructors for full (unpadded) token grids.

Port of /root/reference/fit/model/utils.py:34-64 (make_grid_mask_size /
make_grid_mask_size_online): given image pixel sizes, build the token grid
coordinates, validity mask, and (n_h, n_w) size tensors the FiT forward
consumes. Host-side numpy (shapes are static per bucket).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp


def make_grid(n_h: int, n_w: int) -> np.ndarray:
    """(2, N) grid with W index first (reference rope.py:308-318 order)."""
    gw, gh = np.meshgrid(np.arange(n_w), np.arange(n_h))  # indexing='xy'
    return np.stack([gw.reshape(-1), gh.reshape(-1)], axis=0)


def make_grid_mask_size(batch: int, n_h: int, n_w: int, context_len: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-grid inputs padded to context_len.

    Returns grid (B, 2, L) int32, mask (B, L) float32, size (B, 1, 2) int32.
    Reference: fit/model/utils.py:34-45 (there H*W always == context there;
    here we allow padding up to the bucket's static context length).
    """
    n = n_h * n_w
    assert n <= context_len, (n, context_len)
    grid = np.pad(make_grid(n_h, n_w), ((0, 0), (0, context_len - n)))
    mask = np.zeros((context_len,), np.float32)
    mask[:n] = 1.0
    grid_b = np.broadcast_to(grid, (batch, 2, context_len))
    mask_b = np.broadcast_to(mask, (batch, context_len))
    size_b = np.broadcast_to(np.array([[n_h, n_w]], np.int32),
                             (batch, 1, 2))
    return (jnp.asarray(grid_b, jnp.int32), jnp.asarray(mask_b, jnp.float32),
            jnp.asarray(size_b.reshape(batch, 1, 2), jnp.int32))


def pixels_to_tokens(height: int, width: int, patch_size: int = 2,
                     vae_factor: int = 8) -> Tuple[int, int]:
    """Image pixels -> (n_h, n_w) token-grid dims (latent/patch downsample)."""
    assert height % (patch_size * vae_factor) == 0
    assert width % (patch_size * vae_factor) == 0
    return height // (patch_size * vae_factor), width // (patch_size * vae_factor)
