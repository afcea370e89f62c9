"""Shared-encoder/separate-decoder LwD: per-token conditioning + samplers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit_lwd_sharedenc import FiTLwDSharedEncSepDec
from fitv2_tpu.models.grid_utils import make_grid_mask_size


def _model():
    return FiTLwDSharedEncSepDec(
        context_size=16, patch_size=2, in_channels=4, hidden_size=32,
        depth=4, num_heads=2, num_classes=10, number_of_perflow=2,
        n_patch_h=4, n_patch_w=4, adaln_type='lora', adaln_lora_dim=8,
        max_cached_len=8, number_of_representation_blocks=2, repa_dim=16)


def _init(model, B=2):
    grid, mask, size = make_grid_mask_size(B, 4, 4, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 16, 16))
    t = jnp.zeros((B,))
    y = (jnp.arange(B) % 10).astype(jnp.int32)
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        x, t, y, grid, mask, size)['params']
    return params, (x, t, y, grid, mask, size)


def test_forward_run_layer_returns_projection():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    out, proj = model.apply({'params': params}, x, t, y, 0, grid, mask, size,
                            method=model.forward_run_layer)
    assert out.shape == (2, 16, 16)
    assert proj.shape == (2, 16, 16)  # repa_dim=16
    assert np.isfinite(np.asarray(out)).all()
    # shared encoder + second global adaLN exist in the tree
    assert 'shared_rep_blocks' in params
    assert 'global_adaLN_modulation2' in params


def test_sample_cfg_guidance_window():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    out = model.apply({'params': params}, x, y, 1.5, 2,
                      method=model.sample_cfg)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    # a window that excludes everything = conditional-only sampling
    out_nw = model.apply({'params': params}, x, y, 1.5, 2, 0.9, 0.95,
                         method=model.sample_cfg)
    assert np.isfinite(np.asarray(out_nw)).all()


def test_sample_maruyama_cfg_runs():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    out = model.apply({'params': params}, jax.random.PRNGKey(3), x, y,
                      1.4, 2, method=model.sample_maruyama_cfg)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
