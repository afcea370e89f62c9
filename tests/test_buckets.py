"""Bucketed sampling: per-resolution jit cache, interpolation selection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit import FiT
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.sample.buckets import STANDARD_BUCKETS, BucketedSampler
from fitv2_tpu.sample.pipeline import SamplingConfig


def _model_and_params():
    model = FiT(context_size=64, patch_size=2, in_channels=4,
                hidden_size=64, depth=2, num_heads=4, num_classes=10,
                learn_sigma=False, use_sit=True, use_swiglu=True,
                adaln_type='lora', adaln_lora_dim=16, max_cached_len=32)
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 16)),
                        jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                        grid, mask, size)['params']
    return model, params


def test_bucket_config_selection():
    model, params = _model_and_params()
    bs = BucketedSampler(model, params, ori_max_pe_len=8)
    # within the training grid -> no interpolation
    cfg = bs.config_for(128, 128)
    assert cfg.interpolation == 'no'
    # beyond -> dynntk with decoupled axes
    cfg = bs.config_for(128, 256)
    assert cfg.interpolation == 'dynntk'
    assert cfg.decouple and cfg.ori_max_pe_len == 8
    # explicit override
    cfg = bs.config_for(128, 256, interpolation='yarn')
    assert cfg.interpolation == 'yarn'


def test_bucket_sampling_two_resolutions():
    model, params = _model_and_params()
    base = SamplingConfig(num_sampling_steps=2, per_device_batch=2,
                          num_classes=10, dtype=jnp.float32)
    bs = BucketedSampler(model, params, base_config=base, ori_max_pe_len=8)
    out1 = bs.sample(jax.random.PRNGKey(0), jnp.arange(2), 128, 128)
    assert out1.shape == (2, 4, 16, 16)
    # a larger bucket grows the context automatically (8x16=128 tokens)
    out2 = bs.sample(jax.random.PRNGKey(0), jnp.arange(2), 128, 256)
    assert out2.shape == (2, 4, 16, 32)
    assert np.isfinite(np.asarray(out2)).all()
    # cache: same bucket returns the same compiled callable
    assert bs.get(128, 128) is bs.get(128, 128)
    assert len(bs._cache) == 2


def test_standard_buckets_table():
    assert STANDARD_BUCKETS[(256, 256)] == 'no'
    assert STANDARD_BUCKETS[(512, 512)] == 'dynntk'
