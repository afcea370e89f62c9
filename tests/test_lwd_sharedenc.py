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
    # representation self-guidance path: randomize params first — adaLN-zero
    # fresh init makes velocities 0, hiding the rep extrapolation
    rng_np = np.random.default_rng(0)
    rparams = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            rng_np.standard_normal(v.shape).astype(np.float32) * 0.05),
        params)
    base = model.apply({'params': rparams}, jax.random.PRNGKey(3), x, y,
                       1.4, 2, method=model.sample_maruyama_cfg)
    out_sg = model.apply({'params': rparams}, jax.random.PRNGKey(3), x, y,
                         1.4, 2, 0.0, 1.0, True,
                         method=model.sample_maruyama_cfg)
    assert np.isfinite(np.asarray(out_sg)).all()
    assert not np.allclose(np.asarray(out_sg), np.asarray(base))


def test_sample_wo_cfg_family_returns():
    """Flags cover forward_wo_cfg{,_pca,_int,_repre,_int_repre}."""
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    out = model.apply({'params': params}, x, y, 2, method=model.sample)
    assert out.shape == x.shape
    out2, aux = model.apply(
        {'params': params}, x, y, 2, True, True, True, True,
        method=model.sample)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               rtol=2e-5, atol=2e-5)
    K = model.number_of_perflow * 2  # segments x sub-steps
    assert len(aux['intermediates']) == K
    assert len(aux['semantics']) == K
    assert aux['representations'][0].shape == (2, 16, 16)  # repa_dim
    assert aux['hidden'][0].shape == (2, 16, 32)           # hidden_size
    np.testing.assert_array_equal(np.asarray(aux['intermediates'][-1]),
                                  np.asarray(out2))


def test_sample_maruyama_plain_and_intermediates():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    out = model.apply({'params': params}, jax.random.PRNGKey(4), x, y, 2,
                      method=model.sample_maruyama)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    out2, inter = model.apply({'params': params}, jax.random.PRNGKey(4),
                              x, y, 2, True, method=model.sample_maruyama)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))
    assert len(inter) >= model.number_of_perflow


def test_sample_maruyama_global_cfg():
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    out = model.apply({'params': params}, jax.random.PRNGKey(5), x, y,
                      1.5, 6, method=model.sample_maruyama_global_cfg)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    # self-guidance changes the trajectory
    out_sg = model.apply({'params': params}, jax.random.PRNGKey(5), x, y,
                         1.5, 6, 0.0, 1.0, True,
                         method=model.sample_maruyama_global_cfg)
    assert np.isfinite(np.asarray(out_sg)).all()


@pytest.mark.parametrize('mode', ['replace', 'residual', 'blend'])
def test_forward_run_layer_finetune_modes(mode):
    model = _model()
    params, (x, t, y, grid, mask, size) = _init(model)
    t_next = jnp.full_like(t, 0.25)
    xt_next = x + 0.1
    out = model.apply({'params': params}, x, t, y, 0, grid, mask, t_next,
                      xt_next, size, mode,
                      method=model.forward_run_layer_finetune)
    assert set(out) == {'x_pred', 'x_target', 'rep_pred', 'rep_target'}
    assert out['x_pred'].shape == out['x_target'].shape == (2, 16, 16)
    assert out['rep_pred'].shape == out['rep_target'].shape == (2, 16, 16)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()
    # gradients flow ONLY through the forecaster path: frozen-target grads
    # must be exactly zero
    def loss(p):
        o = model.apply({'params': p}, x, t, y, 0, grid, mask, t_next,
                        xt_next, size, mode,
                        method=model.forward_run_layer_finetune)
        return jnp.sum(o['x_target'] ** 2) + jnp.sum(o['rep_target'] ** 2)
    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)

    def loss_pred(p):
        o = model.apply({'params': p}, x, t, y, 0, grid, mask, t_next,
                        xt_next, size, mode,
                        method=model.forward_run_layer_finetune)
        return jnp.sum(o['x_pred'] ** 2)
    g2 = jax.grad(loss_pred)(params)
    assert float(jnp.abs(
        jax.tree_util.tree_leaves(g2['mid_blocks'])[0]).max()) >= 0.0
    total = sum(float(jnp.abs(l).sum())
                for l in jax.tree_util.tree_leaves(g2['mid_blocks']))
    assert np.isfinite(total)


def test_sharedenc_scan_matches_unrolled():
    """Scanned sub-steps (sample aux-less path, windowed sample_cfg runs)
    match the unrolled math bit-for-tolerance."""
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
    out_unrolled = model.apply({'params': params}, z, y, 3, True,
                               method=model.sample)[0]
    np.testing.assert_allclose(np.asarray(out_scan),
                               np.asarray(out_unrolled), rtol=2e-5,
                               atol=2e-5)

    # windowed sample_cfg: runs partition at the window edges; compare vs
    # a hand-rolled per-step loop with the same static branch
    lo, hi, cfgs, S = 0.3, 0.9, 1.4, 4
    out_cfg = model.apply({'params': params}, z, y, cfgs, S,
                          guidance_low=lo, guidance_high=hi,
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
            sig = mod._segment_sigma_list(i, S)
            for s in range(S):
                t_cur = float(sig[s])
                tv = jnp.full((2 * B,), t_cur, jnp.float32)
                x2 = jnp.concatenate([xx, xx], axis=0)
                v = mod._segment_velocity(i, x2, tv, y2, mask, f_cos, f_sin)
                vc, vu = jnp.split(v, 2, axis=0)
                v = vu + cfgs * (vc - vu) if lo <= t_cur <= hi else vc
                xx = xx + (float(sig[s + 1]) - t_cur) * v.astype(xx.dtype)
        return xx

    ref = model.apply({'params': params}, z, y, S, method=manual)
    np.testing.assert_allclose(np.asarray(out_cfg), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
