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
