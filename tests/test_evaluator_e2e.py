"""Evaluator facade end-to-end: images -> activations -> metrics.

Uses a randomly initialized InceptionV3 (zero-egress environment): the
numbers have no external meaning, but the full plumbing — batched
activation extraction with padding, statistics, FID/IS/precision/recall —
must run and satisfy basic identities (FID(x, x) ~ 0).
"""

import numpy as np
import pytest

from fitv2_tpu.eval.evaluator import Evaluator


@pytest.fixture(scope='module')
def evaluator():
    return Evaluator(inception_weights=None, batch_size=4)


def test_compute_all_identical_batches(evaluator, tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (6, 32, 32, 3), np.uint8).astype(np.uint8)
    # via npz path too (reference npz workflow)
    p = str(tmp_path / 'batch.npz')
    np.savez(p, arr_0=imgs)
    metrics = evaluator.compute_all(imgs, p)
    assert set(metrics) >= {'fid', 'sfid', 'inception_score', 'precision',
                            'recall'}
    assert abs(metrics['fid']) < 1e-3
    assert abs(metrics['sfid']) < 1e-3
    assert metrics['precision'] > 0.9 and metrics['recall'] > 0.9


def test_activation_batch_padding(evaluator):
    """n not divisible by batch_size exercises the pad-and-trim path."""
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (5, 32, 32, 3), np.uint8).astype(np.uint8)
    acts = evaluator.read_activations(imgs)
    assert acts['pool3'].shape == (5, 2048)
    assert acts['spatial'].shape[0] == 5
    assert acts['softmax'].shape == (5, 1008)
    np.testing.assert_allclose(acts['softmax'].sum(-1), 1.0, rtol=1e-4)


def test_statistics_shapes(evaluator):
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (4, 32, 32, 3), np.uint8).astype(np.uint8)
    stats = evaluator.compute_statistics(evaluator.read_activations(imgs))
    assert stats['mu'].shape == (2048,)
    assert stats['sigma'].shape == (2048, 2048)
