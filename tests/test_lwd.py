"""FiTLwD: segment forwards, samplers, REPA, and segment training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit_lwd import FiTLwD, repa_alignment_loss
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.train import OptimizerConfig, create_train_state, make_optimizer
from fitv2_tpu.train.lwd_train_step import SegmentSampler, make_lwd_train_step


def _model(**kw):
    cfg = dict(context_size=16, patch_size=2, in_channels=4, hidden_size=64,
               depth=4, num_heads=4, num_classes=10, number_of_perflow=2,
               n_patch_h=4, n_patch_w=4, adaln_type='lora',
               adaln_lora_dim=16, max_cached_len=8)
    cfg.update(kw)
    return FiTLwD(**cfg)


def _init(model, B=2):
    n_ctx = model.context_size
    grid, mask, size = make_grid_mask_size(B, model.n_patch_h,
                                           model.n_patch_w, n_ctx)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, n_ctx, 16))
    t = jnp.zeros((B,))
    y = (jnp.arange(B) % 10).astype(jnp.int32)
    params = model.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        x, t, y, grid, mask, size)['params']
    return params, (x, t, y, grid, mask, size)


def test_forward_run_layer_segments_differ():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    # adaLN-zero init (reference parity) makes fresh blocks identity and
    # final outputs exactly zero; randomize ALL params to expose that the
    # two segments route through different weights
    rng = np.random.default_rng(0)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            rng.standard_normal(v.shape).astype(np.float32) * 0.05), params)
    out0, rep0 = model.apply({'params': params}, x, t, y, 0, grid, mask, size,
                             method=model.forward_run_layer)
    out1, _ = model.apply({'params': params}, x, t, y, 1, grid, mask, size,
                          method=model.forward_run_layer)
    assert out0.shape == (2, 16, 16)
    assert rep0 is None
    # different segments use different weights -> different outputs
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-6


def test_sample_and_cfg_shapes():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    out = model.apply({'params': params}, x, y, 2, method=model.sample)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    out_cfg = model.apply({'params': params}, x, y, 1.5, 2,
                          method=model.sample_cfg)
    assert out_cfg.shape == x.shape
    assert np.isfinite(np.asarray(out_cfg)).all()
    # cfg=1 equals plain sampling
    out_cfg1 = model.apply({'params': params}, x, y, 1.0, 2,
                           method=model.sample_cfg)
    np.testing.assert_allclose(np.asarray(out_cfg1), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_sample_maruyama_cfg():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    out = model.apply({'params': params}, jax.random.PRNGKey(3), x, y, 1.4, 2,
                      method=model.sample_maruyama_cfg)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # deterministic given the key
    out2 = model.apply({'params': params}, jax.random.PRNGKey(3), x, y,
                       1.4, 2, method=model.sample_maruyama_cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_repa_head_and_alignment():
    model = _model(number_of_representation_blocks=2, repa_dim=32)
    params, (x, t, y, grid, mask, size) = _init(model)
    out, proj = model.apply({'params': params}, x, t, y, 0, grid, mask, size,
                            method=model.forward_run_layer)
    assert proj.shape == (2, 16, 32)
    # alignment loss: perfectly aligned targets give -1
    loss = repa_alignment_loss(proj, proj, mask)
    np.testing.assert_allclose(np.asarray(loss), -1.0, rtol=1e-5)


def test_perlayer_embedder_param_structure():
    model = _model(perlayer_embedder=True)
    params, _ = _init(model)
    # two segments -> two x_embedders
    assert 'x_embedders_0' in params and 'x_embedders_1' in params


def test_lwd_train_step_reduces_loss():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model, B=4)
    batch = {
        'feature': jax.random.normal(jax.random.PRNGKey(5), (4, 16, 16)),
        'grid': grid,
        'mask': mask,
        'label': (jnp.arange(4) % 10).astype(jnp.int32),
        'size': size,
    }
    tx = make_optimizer(OptimizerConfig(learning_rate=3e-3))
    state = create_train_state(params, tx)
    step = make_lwd_train_step(model, tx)
    jitted = {k: jax.jit(lambda s, b, r, k=k: step(s, b, r, k))
              for k in range(model.number_of_perflow)}
    seg = SegmentSampler(model.number_of_perflow, seed=0)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(30):
        state, m = jitted[seg()](state, batch, rng)
        losses.append(float(m['loss']))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_shared_trunk_blocks():
    model = _model(number_of_shared_blocks=1)
    params, (x, t, y, grid, mask, size) = _init(model)
    assert 'start_shared_blocks' in params
    out, _ = model.apply({'params': params}, x, t, y, 0, grid, mask, size,
                         method=model.forward_run_layer)
    assert out.shape == (2, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_fourier_basis_output():
    """fourier_basis: final layer emits 2x channels combined with a
    t_next-conditioned cos/sin basis (reference fit_model_lwd_ms.py:470-472,
    517-522)."""
    model = _model(fourier_basis=True)
    params, (x, t, y, grid, mask, size) = _init(model)
    assert 'fourier_basis_embedder' in params
    out, _ = model.apply({'params': params}, x, t, y, 0, grid, mask, size,
                         False, None, jnp.ones_like(t),
                         method=model.forward_run_layer)
    # output collapses back to p**2 * C_out channels
    assert out.shape == (2, 16, 16)
    s = model.apply({'params': params}, x, y, 2, method=model.sample)
    assert s.shape == x.shape and np.isfinite(np.asarray(s)).all()


def test_get_segment_index():
    model = _model(number_of_perflow=2)
    assert model.get_segment_index(0.0) == 0
    assert model.get_segment_index(0.49) == 0
    assert model.get_segment_index(0.51) == 1
    assert model.get_segment_index(1.0) == 1


def test_sample_intermediates_and_representations():
    """forward_wo_cfg_int/_repre parity: per-segment states + REPA tokens."""
    model = _model(number_of_representation_blocks=2, repa_dim=16)
    params, (x, t, y, grid, mask, size) = _init(model)
    out, inter, reps = model.apply(
        {'params': params}, x, y, 1, True, True, method=model.sample)
    assert out.shape == x.shape
    assert inter.shape == (2,) + x.shape          # K=2 segment states
    assert reps.shape == (2, 2, 16, 16)           # (K, B, N, repa_dim)
    np.testing.assert_allclose(np.asarray(inter[-1]), np.asarray(out),
                               rtol=1e-6)


def test_sample_scan_matches_unrolled():
    """The scanned within-segment sub-step path (FiTLwD._scan_substeps)
    must produce the same trajectory as the unrolled aux path — same math,
    one compiled body per segment instead of S copies."""
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(treedef, [
        0.05 * jax.random.normal(k, l.shape, l.dtype)
        for k, l in zip(keys, leaves)])
    z = jax.random.normal(jax.random.PRNGKey(3),
                          (2, model.context_size, 16))
    out_scan = model.apply({'params': params}, z, y, 3, method=model.sample)
    out_unrolled, inter = model.apply(
        {'params': params}, z, y, 3, True, method=model.sample)
    np.testing.assert_allclose(np.asarray(out_scan),
                               np.asarray(out_unrolled), rtol=2e-5,
                               atol=2e-5)

    # sample_cfg scan parity vs a hand-rolled unrolled loop over the same
    # segment velocities
    cfgs = 1.4
    out_cfg = model.apply({'params': params}, z, y, cfgs, 3,
                          method=model.sample_cfg)

    def manual(mod, z0, y, S):
        B = z0.shape[0]
        from fitv2_tpu.models.grid_utils import make_grid_mask_size
        grid, mask, size = make_grid_mask_size(
            2 * B, mod.n_patch_h, mod.n_patch_w, mod.context_size)
        f_cos, f_sin = mod._rope(grid, size)
        y2 = jnp.concatenate([y, jnp.full((B,), mod.num_classes, y.dtype)])
        xx = z0
        for i in range(mod.number_of_perflow):
            y_embed = mod._emb(mod.y_embedders, i)(y2)
            sig = mod._segment_sigma_list(i, S)
            for s in range(S):
                tv = jnp.full((2 * B,), float(sig[s]), jnp.float32)
                tn = jnp.full((2 * B,), float(sig[s + 1]), jnp.float32)
                c, g = mod._cond(i, tv, y_embed)
                x2 = jnp.concatenate([xx, xx], axis=0)
                v = mod._segment_body(i, x2, c, mask, f_cos, f_sin, g, tn)
                vc, vu = jnp.split(v, 2, axis=0)
                v = vu + cfgs * (vc - vu)
                xx = xx + (float(sig[s + 1]) - float(sig[s])) \
                    * v.astype(xx.dtype)
        return xx

    ref = model.apply({'params': params}, z, y, 3, method=manual)
    np.testing.assert_allclose(np.asarray(out_cfg), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
