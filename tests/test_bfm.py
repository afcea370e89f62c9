"""BFM (block flow matching) — shared-encoder architecture + config parity.

The reference bfm.py (/root/reference/fit/model/bfm.py:295-305) runs a
SHARED representation-block encoder over the noisy tokens at every segment
step and conditions the per-segment decoder on the per-token
c_repre = t_emb[:, None] + rep tokens through global_adaLN_modulation2 —
the sharedenc family, not the per-flow REPA heads of plain FiTLwD. These
tests pin that mapping (models/bfm.py -> FiTLwDSharedEncSepDec) and the
published config geometries.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.bfm import BFM, split_decay_param_labels
from fitv2_tpu.models.fit_lwd_sharedenc import FiTLwDSharedEncSepDec
from fitv2_tpu.models.grid_utils import make_grid_mask_size


def _small_bfm():
    return BFM(context_size=16, hidden_size=64, depth=6, num_heads=4,
               num_classes=10, number_of_perflow=3,
               number_of_representation_blocks=4, repa_dim=32,
               n_patch_h=4, n_patch_w=4, adaln_lora_dim=16, max_cached_len=8)


def _init(model, B=2):
    grid, mask, size = make_grid_mask_size(B, model.n_patch_h,
                                           model.n_patch_w,
                                           model.context_size)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (B, model.context_size, 16))
    y = (jnp.arange(B) % 10).astype(jnp.int32)
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        x, jnp.zeros((B,)), y, grid, mask, size)['params']
    return params, (x, y, grid, mask, size)


def test_bfm_is_sharedenc():
    """BFM must carry the shared encoder (reference bfm.py:100-106) — 20
    rep blocks at XL do NOT divide K=6, which only the shared-stack layout
    supports (config_bfm_XL.yaml:43)."""
    m = _small_bfm()
    assert isinstance(m, FiTLwDSharedEncSepDec)
    params, _ = _init(m)
    assert 'shared_rep_blocks' in params
    assert 'representation_x_embedder2' in params
    assert 'global_adaLN_modulation2' in params
    # XL geometry constructs (rep blocks not divisible by K)
    BFM(hidden_size=1152, depth=30, num_heads=16, use_swiglu=False,
        q_norm='rmsnorm', k_norm='rmsnorm', adaln_type='normal',
        number_of_perflow=6, number_of_representation_blocks=20)


def test_bfm_reference_yaml_target_remap():
    """Published reference BFM YAMLs (target: fit.model.bfm.FiT) must load
    through utils/config into the sharedenc BFM."""
    from fitv2_tpu.utils.config import config_to_model
    cfg = {'target': 'fit.model.bfm.FiT',
           'params': {'context_size': 16, 'hidden_size': 64, 'depth': 6,
                      'num_heads': 4, 'num_classes': 10,
                      'number_of_perflow': 3,
                      'number_of_representation_blocks': 4,
                      'n_patch_h': 4, 'n_patch_w': 4,
                      'adaln_lora_dim': 16, 'max_cached_len': 8}}
    m = config_to_model(cfg)
    assert isinstance(m, FiTLwDSharedEncSepDec)
    assert m.number_of_perflow == 3
    # the bk sharedenc target maps to the same family
    m2 = config_to_model({
        'target': 'fit.model.fit_model_lwd_bk.FiTLwD_sharedenc_sepdec',
        'params': {'context_size': 16, 'hidden_size': 64, 'depth': 6,
                   'num_heads': 4, 'num_classes': 10,
                   'number_of_perflow': 3, 'n_patch_h': 4, 'n_patch_w': 4}})
    assert isinstance(m2, FiTLwDSharedEncSepDec)


def test_bfm_samplers_run():
    m = _small_bfm()
    params, (x, y, grid, mask, size) = _init(m)
    # randomize: AdaLN-zero init makes the velocity identically zero, which
    # would hide whether the rep encoder conditions the decoder
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(keys, leaves)])
    out = m.apply({'params': params}, x, y, 2, method=m.sample)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    out_cfg = m.apply({'params': params}, x, y, 1.4, 2, method=m.sample_cfg)
    assert out_cfg.shape == x.shape
    assert np.isfinite(np.asarray(out_cfg)).all()
    # the shared encoder CONDITIONS the decoder: zeroing the rep-encoder
    # params must change the sampler output
    import flax
    p2 = flax.core.unfreeze(jax.tree_util.tree_map(lambda v: v, params))
    p2['shared_rep_blocks'] = jax.tree_util.tree_map(
        jnp.zeros_like, p2['shared_rep_blocks'])
    out_zeroed = m.apply({'params': p2}, x, y, 2, method=m.sample)
    assert np.abs(np.asarray(out_zeroed) - np.asarray(out)).max() > 0


def test_bfm_forward_run_layer_and_repa():
    m = _small_bfm()
    params, (x, y, grid, mask, size) = _init(m)
    pred, rep = m.apply(
        {'params': params}, x, jnp.full((2,), 0.3), y, 1, grid, mask, size,
        True, rngs={'label_dropout': jax.random.PRNGKey(3)},
        method=m.forward_run_layer)
    assert pred.shape == x.shape
    assert rep is not None and rep.shape == (2, 16, 32)  # repa_dim


def test_split_decay_param_labels():
    m = _small_bfm()
    params, _ = _init(m)
    labels = split_decay_param_labels(params)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    assert {l for _, l in flat} == {'decay', 'no_decay'}
    for path, label in flat:
        name = '/'.join(str(getattr(k, 'key', k)) for k in path).lower()
        if 'bias' in name or 'embedding_table' in name:
            assert label == 'no_decay', name
