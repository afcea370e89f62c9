"""Config instantiation + training stats."""

import numpy as np
import pytest

import jax.numpy as jnp

from fitv2_tpu.utils import instantiate_from_config, load_config
from fitv2_tpu.utils.training_stats import Collector, moments, report


def test_instantiate_from_config():
    cfg = {'target': 'fitv2_tpu.models.fit.FiT',
           'params': {'hidden_size': 64, 'depth': 2, 'num_heads': 4,
                      'context_size': 16}}
    model = instantiate_from_config(cfg)
    assert model.hidden_size == 64 and model.depth == 2
    # extra kwargs override
    model = instantiate_from_config(cfg, depth=3)
    assert model.depth == 3


def test_instantiate_missing_target():
    with pytest.raises(KeyError):
        instantiate_from_config({'params': {}})


def test_load_config_merge(tmp_path):
    omegaconf = pytest.importorskip('omegaconf')
    a = tmp_path / 'a.yaml'
    b = tmp_path / 'b.yaml'
    a.write_text('model:\n  depth: 2\n  hidden: 64\n')
    b.write_text('model:\n  depth: 4\n')
    cfg = load_config([str(a), str(b)])
    assert cfg.model.depth == 4      # right wins
    assert cfg.model.hidden == 64


def test_moments_and_collector():
    m = np.asarray(moments(jnp.asarray([1.0, 2.0, 3.0])))
    np.testing.assert_allclose(m, [3.0, 6.0, 14.0])

    report('loss', jnp.asarray([2.0, 4.0]))
    report('loss', jnp.asarray([6.0]))
    c = Collector(regex='loss')
    c.update()
    assert c.num('loss') == 3
    np.testing.assert_allclose(c.mean('loss'), 4.0)
    np.testing.assert_allclose(c.std('loss'), np.std([2, 4, 6]), rtol=1e-6)
