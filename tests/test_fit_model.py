"""FiT forward parity vs torch golden (tools/gen_goldens.py) + model invariants."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fitv2_tpu.ckpt.torch_import import convert_fit_state_dict
from fitv2_tpu.models.fit import FiT, forward_with_cfg

GOLD = np.load(os.path.join(os.path.dirname(__file__), 'goldens',
                            'fit_forward.npz'))


def _golden_model(scan_blocks=True):
    return FiT(
        context_size=32, patch_size=int(GOLD['p']), in_channels=int(GOLD['in_ch']),
        hidden_size=int(GOLD['dim']), depth=int(GOLD['depth']),
        num_heads=int(GOLD['heads']), class_dropout_prob=0.1,
        num_classes=int(GOLD['ncls']), learn_sigma=False, use_sit=True,
        use_swiglu=True, q_norm='layernorm', k_norm='layernorm',
        qk_norm_weight=False, adaln_type='lora', adaln_lora_dim=16,
        custom_freqs='normal', max_cached_len=64, scan_blocks=scan_blocks)


def _golden_sd():
    return {k[len('sd.'):]: GOLD[k] for k in GOLD.files if k.startswith('sd.')}


def _golden_inputs():
    return (jnp.asarray(GOLD['x']), jnp.asarray(GOLD['t']),
            jnp.asarray(GOLD['y']), jnp.asarray(GOLD['grid']),
            jnp.asarray(GOLD['mask']))


@pytest.mark.parametrize('scan_blocks', [True, False])
def test_forward_matches_torch_reference(scan_blocks):
    model = _golden_model(scan_blocks)
    params = convert_fit_state_dict(
        _golden_sd(), depth=int(GOLD['depth']), adaln_type='lora',
        scan_blocks=scan_blocks, num_heads=int(GOLD['heads']),
        rope_layout='split')
    x, t, y, grid, mask = _golden_inputs()
    out = model.apply({'params': params}, x, t, y, grid, mask)
    np.testing.assert_allclose(np.asarray(out), GOLD['out'],
                               rtol=2e-4, atol=2e-4)


def test_importer_covers_initialized_params():
    """The converted tree must exactly cover the model's own init tree."""
    model = _golden_model(True)
    x, t, y, grid, mask = _golden_inputs()
    variables = model.init(jax.random.PRNGKey(0), x, t, y, grid, mask)
    init_flat = jax.tree_util.tree_leaves_with_path(variables['params'])
    imported = convert_fit_state_dict(_golden_sd(), depth=int(GOLD['depth']),
                                      adaln_type='lora', scan_blocks=True,
                                      num_heads=int(GOLD['heads']),
                                      rope_layout='split')
    imp_flat = jax.tree_util.tree_leaves_with_path(imported)
    init_paths = {jax.tree_util.keystr(p): v.shape for p, v in init_flat}
    imp_paths = {jax.tree_util.keystr(p): v.shape for p, v in imp_flat}
    assert init_paths == imp_paths


def test_padded_tokens_do_not_affect_valid_outputs():
    """Changing the content of padded positions must not change valid outputs."""
    model = _golden_model(True)
    x, t, y, grid, mask = _golden_inputs()
    params = convert_fit_state_dict(_golden_sd(), depth=int(GOLD['depth']),
                                    adaln_type='lora', scan_blocks=True,
                                    num_heads=int(GOLD['heads']),
                                    rope_layout='split')
    out1 = model.apply({'params': params}, x, t, y, grid, mask)
    x2 = x.at[:, 24:].set(123.0)  # valid region is the first 24 tokens
    out2 = model.apply({'params': params}, x2, t, y, grid, mask)
    np.testing.assert_allclose(np.asarray(out1[:, :24]),
                               np.asarray(out2[:, :24]), rtol=1e-5, atol=1e-5)
    # padded outputs must be exactly zero
    assert np.all(np.asarray(out1[:, 24:]) == 0.0)


def test_forward_with_cfg_halves_agree():
    model = _golden_model(True)
    params = convert_fit_state_dict(_golden_sd(), depth=int(GOLD['depth']),
                                    adaln_type='lora', scan_blocks=True,
                                    num_heads=int(GOLD['heads']),
                                    rope_layout='split')
    x, t, y, grid, mask = _golden_inputs()
    x2 = jnp.concatenate([x, x], 0)
    t2 = jnp.concatenate([t, t], 0)
    y2 = jnp.concatenate([y, jnp.full_like(y, int(GOLD['ncls']))], 0)
    grid2 = jnp.concatenate([grid, grid], 0)
    mask2 = jnp.concatenate([mask, mask], 0)
    out = forward_with_cfg(model, params, x2, t2, y2, grid2, mask2, None,
                           cfg_scale=1.5)
    assert out.shape == x2.shape[:2] + (int(GOLD['p']) ** 2 * int(GOLD['in_ch']),)
    half = out.shape[0] // 2
    c_cfg = 3 * int(GOLD['p']) ** 2
    np.testing.assert_allclose(np.asarray(out[:half, :, :c_cfg]),
                               np.asarray(out[half:, :, :c_cfg]), rtol=1e-6)


def test_label_dropout_requires_rng_and_hits_null_class():
    model = _golden_model(True)
    x, t, y, grid, mask = _golden_inputs()
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'label_dropout': jax.random.PRNGKey(1)},
        x, t, y, grid, mask, train=True)
    # force-drop reproduces the null embedding
    params = variables['params']
    out_forced = model.apply({'params': params}, x, t, y, grid, mask,
                             force_drop_ids=jnp.ones_like(y))
    out_null = model.apply({'params': params}, x, t,
                           jnp.full_like(y, int(GOLD['ncls'])), grid, mask)
    np.testing.assert_allclose(np.asarray(out_forced), np.asarray(out_null),
                               rtol=1e-6)


def test_unpatchify_roundtrip():
    model = _golden_model(True)
    p, c = int(GOLD['p']), int(GOLD['in_ch'])
    h, w = 8, 12
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, h, w, c)).astype(np.float32)
    # patchify with the reference token layout: last dim ordered (c, p1, p2)
    # (reference fit_model.py:182-183, rearrange 'b h w (c p1 p2)')
    x = img.transpose(0, 3, 1, 2)                       # (B, c, h, w)
    x = x.reshape(2, c, h // p, p, w // p, p)           # (B, c, gh, p1, gw, p2)
    x = x.transpose(0, 2, 4, 1, 3, 5)                   # (B, gh, gw, c, p1, p2)
    x = x.reshape(2, (h // p) * (w // p), c * p * p)
    back = model.unpatchify(jnp.asarray(x), (h, w), channel_last=True)
    np.testing.assert_allclose(np.asarray(back), img, rtol=1e-6)
