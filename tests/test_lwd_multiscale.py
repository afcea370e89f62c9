"""Multi-scale LwD sampler: coarse-to-fine growth, block noise statistics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit_lwd import FiTLwD
from fitv2_tpu.models.grid_utils import make_grid_mask_size


def _model():
    # 4 segments: per_blocks (1, 1, 2), boundaries at segments 1 and 2
    return FiTLwD(context_size=64, patch_size=2, in_channels=4,
                  hidden_size=32, depth=4, num_heads=2, num_classes=10,
                  number_of_perflow=4, n_patch_h=8, n_patch_w=8,
                  adaln_type='lora', adaln_lora_dim=8, max_cached_len=16)


def test_block_noise_covariance():
    model = _model()
    rng = jax.random.PRNGKey(0)
    noise = model.sample_block_noise(rng, (256, 4, 4, 8), gamma=1/3)
    arr = np.asarray(noise)
    # cov = (1+g)I - g*11' has unit diagonal (the ones matrix includes it)
    np.testing.assert_allclose(arr.var(), 1.0, rtol=0.05)
    # block sums have variance 4*1 + 12*(-g) = 0 for g=1/3: the correlated
    # noise is zero-sum per 2x2 block, preserving the upsampled block means
    blocks = arr.reshape(256, 2, 2, 2, 2, 8)
    bsum = blocks.sum(axis=(2, 4))
    assert bsum.var() < 0.01


def test_sample_multiscale_runs():
    model = _model()
    B = 2
    # init params (touch all segments)
    grid, mask, size = make_grid_mask_size(B, 8, 8, 64)
    x_full = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 16))
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        x_full, jnp.zeros((B,)), jnp.zeros((B,), jnp.int32), grid, mask,
        size)['params']
    # coarse start: n_patch/4 = 2x2 tokens
    x0 = jax.random.normal(jax.random.PRNGKey(3), (B, 4, 16))
    y = jnp.zeros((B,), jnp.int32)
    out = model.apply({'params': params}, jax.random.PRNGKey(4), x0, y, 1,
                      (1, 2), (1, 1, 2), method=model.sample_multiscale)
    # final resolution: 8x8 tokens
    assert out.shape == (B, 64, 16)
    assert np.isfinite(np.asarray(out)).all()
