"""Inline eval hook + per-group optimizer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fitv2_tpu.models.fit import FiT
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.sample.pipeline import SamplingConfig
from fitv2_tpu.train.eval_hook import InlineEvalHook
from fitv2_tpu.train.train_step import make_grouped_optimizer


def test_inline_eval_hook_preview(tmp_path):
    model = FiT(context_size=64, patch_size=2, in_channels=4,
                hidden_size=32, depth=2, num_heads=2, num_classes=10,
                learn_sigma=False, use_sit=True, max_cached_len=32)
    grid, mask, size = make_grid_mask_size(1, 8, 8, 64)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 16)),
                        jnp.zeros((1,)), jnp.zeros((1,), jnp.int32),
                        grid, mask, size)['params']
    cfg = SamplingConfig(image_height=128, image_width=128,
                         num_sampling_steps=2, per_device_batch=2,
                         num_classes=10, dtype=jnp.float32)
    hook = InlineEvalHook(model, cfg, every=5,
                          out_dir=str(tmp_path)).attach(lambda: params)
    metrics = {}
    hook(3, metrics)          # not an eval step
    assert 'inline_fid' not in metrics
    hook(5, metrics)          # eval step: writes a preview npz (latents)
    import os
    assert os.path.exists(tmp_path / 'preview_5.npz')
    arr = np.load(tmp_path / 'preview_5.npz')['arr_0']
    assert arr.shape[0] == 2


def test_grouped_optimizer_distinct_lrs():
    params = {'a': {'kernel': jnp.ones((4, 4))},
              'b': {'bias': jnp.ones((4,))}}
    tx = make_grouped_optimizer(
        params,
        lambda path, leaf: 'decay' if 'kernel' in path else 'no_decay',
        {'decay': optax.sgd(1.0), 'no_decay': optax.sgd(0.1)})
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates['a']['kernel']), -1.0)
    np.testing.assert_allclose(np.asarray(updates['b']['bias']), -0.1)
