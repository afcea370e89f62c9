"""CLI: config loading, target remapping, trainer construction, smoke train."""

import numpy as np
import pytest

from fitv2_tpu.utils import config_to_model, load_config
from fitv2_tpu.utils.config import deep_merge


def test_deep_merge_right_wins():
    a = {'m': {'depth': 2, 'hidden': 64}, 'x': 1}
    b = {'m': {'depth': 4}}
    out = deep_merge(a, b)
    assert out['m']['depth'] == 4 and out['m']['hidden'] == 64
    assert out['x'] == 1


def test_load_config_yaml_fallback_and_tuple(tmp_path):
    p = tmp_path / 'a.yaml'
    p.write_text('opt:\n  betas: ${tuple:0.9, 0.999}\n  lr: 1.0e-4\n')
    cfg = load_config(str(p))
    cfg = dict(cfg)
    assert tuple(cfg['opt']['betas']) == (0.9, 0.999)


def test_config_to_model_remaps_reference_target():
    cfg = {'target': 'fit.model.fit_model.FiT',
           'params': {'hidden_size': 64, 'depth': 2, 'num_heads': 4,
                      'context_size': 16, 'abs_pos_embed': None,
                      'pretrain_ckpt': None, 'learn_sigma': False,
                      'use_sit': True}}
    model = config_to_model(cfg)
    from fitv2_tpu.models.fit import FiT
    assert isinstance(model, FiT)
    assert model.hidden_size == 64


def test_shipped_configs_build_models():
    import os
    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'configs')
    for name in ('fitv2_xl.yaml', 'fitv2_hr_xl.yaml', 'fitv2_3b.yaml',
                 'fitv2_hr_3b.yaml', 'fitv2_small_cifar.yaml', 'bfm.yaml',
                 'bfm_xl.yaml', 'fitv2_xl_lwd.yaml', 'fit_xl.yaml'):
        cfg = load_config(os.path.join(cfg_dir, name))
        model = config_to_model(dict(cfg)['diffusion']['network_config'])
        assert model is not None, name


def test_cli_train_smoke(tmp_path):
    """python -m fitv2_tpu.cli.train on synthetic data, 3 steps."""
    from fitv2_tpu.cli.train import build_trainer, parse_args
    from fitv2_tpu.data import make_synthetic_latent_shards

    data_dir = str(tmp_path / 'data')
    make_synthetic_latent_shards(data_dir, n=8, target_len=16, n_classes=10)
    cfg_file = tmp_path / 'cfg.yaml'
    cfg_file.write_text(f"""
diffusion:
  network_config:
    target: fitv2_tpu.models.fit.FiT
    params:
      context_size: 16
      patch_size: 2
      hidden_size: 32
      depth: 2
      num_heads: 2
      num_classes: 10
      learn_sigma: false
      use_sit: true
      max_cached_len: 8
data:
  params:
    train:
      data_path: {data_dir}
      target_len: 16
      loader:
        batch_size: 8
        num_workers: 2
accelerate:
  max_train_steps: 3
  learning_rate: 1.0e-3
  lr_scheduler: constant
  checkpointing_steps: 3
  output_dir: {tmp_path / 'run'}
""")
    args = parse_args(['--cfgdir', str(cfg_file), '--max-steps', '3',
                       '--no-resume'])
    from fitv2_tpu.utils.config import _to_plain
    trainer = build_trainer(_to_plain(load_config(args.cfgdir)), args)
    state = trainer.train(max_steps=3, resume=False)
    assert int(state.step) == 3


def test_cli_evaluate_smoke(tmp_path):
    """evaluate CLI over two tiny image npzs and over precomputed stats
    (the ADM evaluator invocation surface, reference fit/utils/evaluator.py)."""
    import json
    import numpy as np
    from fitv2_tpu.cli import evaluate as ev_cli

    rng = np.random.RandomState(0)
    a = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    b = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    pa, pb = str(tmp_path / 'ref.npz'), str(tmp_path / 'samp.npz')
    np.savez(pa, arr_0=a)
    np.savez(pb, arr_0=b)
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        ev_cli.main([pa, pb, '--batch-size', '4'])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    for k in ('fid', 'sfid', 'inception_score', 'precision', 'recall'):
        assert k in out and np.isfinite(out[k]), (k, out)
    assert out['comparable_to_published'] is False

    # precomputed-stats reference path
    from fitv2_tpu.eval import statistics as stats
    from fitv2_tpu.eval.evaluator import Evaluator
    e = Evaluator(batch_size=4)
    acts = e.read_activations(a)
    mu, sigma = stats.activation_statistics(acts['pool3'])
    ps = str(tmp_path / 'ref_stats.npz')
    np.savez(ps, mu=mu, sigma=sigma)
    buf = io.StringIO()
    with redirect_stdout(buf):
        ev_cli.main([ps, pb, '--batch-size', '4'])
    out2 = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(out2['fid'])
    assert 'precision' not in out2
