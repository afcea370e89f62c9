"""Checkpoint manager: save/restore round trip, rotation, milestones."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from fitv2_tpu.ckpt import (
    CheckpointManager, latest_checkpoint_step, list_checkpoints,
)


def _state(v: float):
    return {
        'step': jnp.asarray(int(v), jnp.int32),
        'params': {'w': jnp.full((4, 4), v), 'b': jnp.full((4,), v)},
    }


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / 'ckpts'))
    state = _state(3.0)
    mgr.save(10, state)
    assert list_checkpoints(str(tmp_path / 'ckpts')) == [10]

    template = jax.tree_util.tree_map(np.zeros_like, state)
    restored, step = mgr.restore(template)
    assert step == 10
    np.testing.assert_allclose(np.asarray(restored['params']['w']), 3.0)
    assert int(restored['step']) == 3  # the stored state's own step field


def test_rotation_and_milestones(tmp_path):
    d = str(tmp_path / 'ckpts')
    mgr = CheckpointManager(d, total_limit=2, milestone_steps=[20])
    for s in (10, 20, 30, 40):
        mgr.save(s, _state(float(s)))
    steps = list_checkpoints(d)
    # milestone 20 kept; rotation keeps the last 2 non-milestones (30, 40)
    assert steps == [20, 30, 40]
    assert latest_checkpoint_step(d) == 40


def test_async_save_rotation_and_wait(tmp_path):
    d = str(tmp_path / 'ckpts')
    mgr = CheckpointManager(d, total_limit=2, async_save=True)
    for s in (10, 20, 30):
        mgr.save(s, _state(float(s)))
    mgr.wait()  # last write durable + final rotation
    assert list_checkpoints(d) == [20, 30]
    template = jax.tree_util.tree_map(np.zeros_like, _state(0.0))
    restored, step = mgr.restore(template)
    assert step == 30
    np.testing.assert_allclose(np.asarray(restored['params']['w']), 30.0)


def test_restore_missing_returns_none(tmp_path):
    mgr = CheckpointManager(str(tmp_path / 'empty'))
    restored, step = mgr.restore(_state(0.0))
    assert restored is None and step == 0


def test_resume_feeds_sampler(tmp_path):
    """The recovered step must slot into the deterministic sampler."""
    from fitv2_tpu.data import get_train_sampler
    d = str(tmp_path / 'ckpts')
    mgr = CheckpointManager(d)
    mgr.save(7, _state(1.0))
    step = latest_checkpoint_step(d)
    stream = get_train_sampler(100, 4, 50, resume_step=step, seed=0)
    full = get_train_sampler(100, 4, 50, resume_step=0, seed=0)
    np.testing.assert_array_equal(stream, full[step * 4:])
