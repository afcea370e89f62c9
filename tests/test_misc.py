"""Misc utilities."""

import numpy as np
import pytest

import jax.numpy as jnp

from fitv2_tpu.utils.misc import (
    EasyDict, assert_shape, count_params, flop_count_forward, nan_to_num,
    print_module_summary,
)


def test_easydict():
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d['b'] == 2
    with pytest.raises(AttributeError):
        _ = d.missing


def test_assert_shape():
    x = jnp.zeros((2, 3, 4))
    assert_shape(x, (2, None, 4))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3, 5))


def test_nan_to_num():
    x = jnp.asarray([1.0, float('nan'), float('inf')])
    out = np.asarray(nan_to_num(x))
    assert out[1] == 0.0 and np.isfinite(out).all()


def test_param_summary_and_count():
    params = {'a': {'w': jnp.zeros((4, 8))}, 'b': jnp.zeros((3,))}
    assert count_params(params) == 35
    out = print_module_summary(params)
    assert 'TOTAL' in out and '35' in out


def test_flop_count_close_to_reference_xl():
    """FiTv2-XL/2: reference reports 147 GFLOPs (README.md:54) counting
    MACs-as-FLOPs/2 conventions aside; our analytic count should land in
    the same ballpark (within 2x)."""
    flops = flop_count_forward(hidden=1152, depth=36, n_tokens=256)
    # fvcore counts MACs; ours counts 2*MACs: 304G/2 = 152G vs published 147G
    assert abs(flops / 2 - 147e9) / 147e9 < 0.1
