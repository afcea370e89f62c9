"""Attention capture via sow + rollout math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.eval.attention_viz import (
    attention_rollout, collect_attention_maps, overlay_heatmap,
    run_with_attention, token_heatmap,
)
from fitv2_tpu.models.fit import FiT
from fitv2_tpu.models.grid_utils import make_grid_mask_size


def test_capture_and_rollout():
    model = FiT(context_size=16, patch_size=2, in_channels=4, hidden_size=32,
                depth=2, num_heads=2, num_classes=10, learn_sigma=False,
                use_sit=True, max_cached_len=8, save_attention=True,
                scan_blocks=False)
    grid, mask, size = make_grid_mask_size(2, 4, 4, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16))
    t = jnp.zeros((2,))
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t, y, grid, mask,
                        size)['params']
    out, maps = run_with_attention(model, params, x, t, y, grid, mask, size)
    assert len(maps) == 2  # one per block
    assert maps[0].shape == (2, 2, 16, 16)
    # rows sum to 1 (softmax)
    np.testing.assert_allclose(maps[0].sum(-1), 1.0, rtol=1e-4)

    roll = attention_rollout(maps)
    assert roll.shape == (2, 16, 16)
    np.testing.assert_allclose(roll.sum(-1), 1.0, rtol=1e-4)

    hm = token_heatmap(roll, (4, 4))
    assert hm.shape == (2, 4, 4)
    img = np.zeros((32, 32, 3), np.uint8)
    over = overlay_heatmap(img, hm[0])
    assert over.shape == (32, 32, 3) and over.dtype == np.uint8


def test_capture_with_scanned_blocks():
    model = FiT(context_size=16, patch_size=2, in_channels=4, hidden_size=32,
                depth=3, num_heads=2, num_classes=10, learn_sigma=False,
                use_sit=True, max_cached_len=8, save_attention=True,
                scan_blocks=True)
    grid, mask, size = make_grid_mask_size(1, 4, 4, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
    t = jnp.zeros((1,))
    y = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t, y, grid, mask,
                        size)['params']
    _, maps = run_with_attention(model, params, x, t, y, grid, mask, size)
    assert len(maps) == 3  # stacked (depth, ...) leaf expands per block
    assert maps[0].shape == (1, 2, 16, 16)
