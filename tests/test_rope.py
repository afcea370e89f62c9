"""RoPE parity vs golden tensors generated from the reference implementation
(/root/reference/fit/model/rope.py via tools/gen_goldens.py)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from fitv2_tpu.models.rope import (
    RopeConfig, apply_rope, build_rope_cache, online_rope_from_grid,
    rope_from_grid, rotate_half,
)

GOLD = np.load(os.path.join(os.path.dirname(__file__), 'goldens', 'rope.npz'))

MODES = ['normal', 'linear', 'ntk-aware', 'ntk-aware-pro1', 'ntk-aware-pro2',
         'ntk-by-parts', 'yarn']


def _cfg(mode, decouple, online=False):
    kw = dict(head_dim=int(GOLD['head_dim']), mode=mode, theta=10000.0,
              max_cached_len=64, online=online)
    if mode != 'normal':
        kw.update(max_pe_len_h=32, max_pe_len_w=48, decouple=decouple,
                  ori_max_pe_len=16)
    return RopeConfig(**kw)


@pytest.mark.parametrize('mode', MODES)
@pytest.mark.parametrize('decouple', [False, True])
def test_cached_rope_matches_reference(mode, decouple):
    if mode == 'normal' and decouple:
        pytest.skip('normal mode has no decouple variant')
    key = f'{mode}_dec{int(decouple)}'
    cache = build_rope_cache(_cfg(mode, decouple))
    cos, sin = rope_from_grid(cache, jnp.asarray(GOLD['grid']))
    np.testing.assert_allclose(np.asarray(cos), GOLD[f'cos_{key}'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), GOLD[f'sin_{key}'],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('mode', ['linear', 'ntk-aware', 'ntk-by-parts'])
@pytest.mark.parametrize('decouple', [False, True])
def test_online_rope_matches_reference(mode, decouple):
    key = f'{mode}_dec{int(decouple)}'
    cfg = _cfg(mode, decouple, online=True)
    cos, sin = online_rope_from_grid(cfg, jnp.asarray(GOLD['grid']),
                                     jnp.asarray(GOLD['size']))
    np.testing.assert_allclose(np.asarray(cos), GOLD[f'cos_online_{key}'],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), GOLD[f'sin_online_{key}'],
                               rtol=1e-5, atol=1e-5)


def test_rotate_half_interleaved_pairs():
    x = jnp.arange(8.0)
    out = rotate_half(x)
    expect = np.array([-1., 0., -3., 2., -5., 4., -7., 6.], np.float32)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_split_layout_preserves_attention_scores():
    """q.k dot products after rotation must be identical between the
    interleaved (reference) layout and the TPU-fast split layout when q/k
    live in the permuted basis (the importer's transformation)."""
    from fitv2_tpu.models.rope import split_permutation

    head_dim = int(GOLD['head_dim'])
    grid = jnp.asarray(GOLD['grid'])
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, grid.shape[-1], 1, head_dim)).astype(
        np.float32)
    k = rng.standard_normal((2, grid.shape[-1], 1, head_dim)).astype(
        np.float32)

    cfg_i = _cfg('ntk-aware', True)
    cache_i = build_rope_cache(cfg_i)
    cos_i, sin_i = rope_from_grid(cache_i, grid, 'interleaved')
    q_i = apply_rope(jnp.asarray(q), cos_i[:, :, None], sin_i[:, :, None])
    k_i = apply_rope(jnp.asarray(k), cos_i[:, :, None], sin_i[:, :, None])
    scores_i = np.einsum('bqhd,bkhd->bhqk', np.asarray(q_i), np.asarray(k_i))

    import dataclasses
    cfg_s = dataclasses.replace(cfg_i, layout='split')
    cache_s = build_rope_cache(cfg_s)
    cos_s, sin_s = rope_from_grid(cache_s, grid, 'split')
    perm = split_permutation(head_dim)
    q_s = apply_rope(jnp.asarray(q[..., perm]), cos_s[:, :, None],
                     sin_s[:, :, None], 'split')
    k_s = apply_rope(jnp.asarray(k[..., perm]), cos_s[:, :, None],
                     sin_s[:, :, None], 'split')
    scores_s = np.einsum('bqhd,bkhd->bhqk', np.asarray(q_s), np.asarray(k_s))
    np.testing.assert_allclose(scores_s, scores_i, rtol=1e-4, atol=1e-4)


def test_apply_rope_is_a_rotation_for_normal_mode():
    # rotating q and k by the same angles preserves dot products between
    # tokens at equal relative offsets
    cfg = _cfg('normal', False)
    cache = build_rope_cache(cfg)
    grid = jnp.asarray(GOLD['grid'])
    cos, sin = rope_from_grid(cache, grid)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, grid.shape[-1], 1,
                                         int(GOLD['head_dim']))), jnp.float32)
    q_rot = apply_rope(q, cos[:, :, None, :], sin[:, :, None, :])
    # norms preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_rot), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5)


def test_rope_21d_time_offset():
    """2+1D video rope: time index shifts both spatial lookups
    (reference rope.py:335-361)."""
    from fitv2_tpu.models.rope import rope_21d_from_grid
    cfg = _cfg('normal', False)
    cache = build_rope_cache(cfg)
    # 2x2 spatial grid at t=0 and t=1
    g2 = np.array([[0, 1, 0, 1], [0, 0, 1, 1]])
    grid3 = np.concatenate([
        np.concatenate([g2, np.zeros((1, 4))], 0),
        np.concatenate([g2, np.ones((1, 4))], 0)], axis=1)[None]
    cos, sin = rope_21d_from_grid(cache, jnp.asarray(grid3, jnp.int32))
    # t=1 tokens must equal the 2D lookup of the (+1,+1)-shifted grid
    shifted = jnp.asarray(g2 + 1, jnp.int32)[None]
    cos2, sin2 = rope_from_grid(cache, shifted)
    np.testing.assert_allclose(np.asarray(cos[:, 4:]), np.asarray(cos2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[:, 4:]), np.asarray(sin2),
                               rtol=1e-6)
