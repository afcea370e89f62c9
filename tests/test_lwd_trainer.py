"""LwD trainer loop: segment training over synthetic batches + REPA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit_lwd import FiTLwD
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.train.lwd_trainer import LwDTrainer, LwDTrainerConfig


def test_lwd_trainer_loop(tmp_path):
    model = FiTLwD(context_size=16, patch_size=2, in_channels=4,
                   hidden_size=32, depth=2, num_heads=2, num_classes=10,
                   number_of_perflow=2, n_patch_h=4, n_patch_w=4,
                   adaln_type='lora', adaln_lora_dim=8, max_cached_len=8,
                   number_of_representation_blocks=2, repa_dim=16)
    cfg = LwDTrainerConfig(max_steps=4, learning_rate=1e-3,
                           segments_per_step=2, log_every=2,
                           checkpointing_steps=4,
                           output_dir=str(tmp_path / 'run'), seed=0)
    trainer = LwDTrainer(model, cfg)

    B = 8
    grid, mask, size = make_grid_mask_size(B, 4, 4, 16)
    rng = np.random.default_rng(0)

    def batches():
        for _ in range(10):
            yield {
                'feature': rng.standard_normal((B, 16, 16)).astype(np.float32),
                'grid': np.asarray(grid), 'mask': np.asarray(mask),
                'label': (np.arange(B) % 10).astype(np.int32),
                'size': np.asarray(size),
                'repa_target': rng.standard_normal(
                    (B, 16, 16)).astype(np.float32),
            }

    metrics_log = []
    state = trainer.train(batches(), resume=False,
                          metric_hook=lambda s, m: metrics_log.append(m))
    assert int(state.step) == 8  # 4 steps x 2 segments_per_step
    assert all(np.isfinite(m['loss']) for m in metrics_log)
    assert all(np.isfinite(m['proj_loss']) for m in metrics_log)
    import os
    assert 'checkpoint-4' in os.listdir(str(tmp_path / 'run' / 'checkpoints'))


def test_lwd_trainer_resume_without_caller_state(tmp_path):
    """Resume with state=None must RESTORE from the checkpoint (it used to
    silently skip restore and re-init), through the abstract template (no
    materialized init state next to the restored one)."""
    def mk_model():
        return FiTLwD(context_size=16, patch_size=2, in_channels=4,
                      hidden_size=32, depth=2, num_heads=2, num_classes=10,
                      number_of_perflow=2, n_patch_h=4, n_patch_w=4,
                      adaln_type='lora', adaln_lora_dim=8, max_cached_len=8,
                      number_of_representation_blocks=2, repa_dim=16)

    cfg = LwDTrainerConfig(max_steps=2, learning_rate=1e-3,
                           segments_per_step=2, log_every=1,
                           checkpointing_steps=2,
                           output_dir=str(tmp_path / 'run'), seed=0)

    B = 8
    grid, mask, size = make_grid_mask_size(B, 4, 4, 16)

    def batches(n):
        rng = np.random.default_rng(0)
        for _ in range(n):
            yield {
                'feature': rng.standard_normal((B, 16, 16)).astype(
                    np.float32),
                'grid': np.asarray(grid), 'mask': np.asarray(mask),
                'label': (np.arange(B) % 10).astype(np.int32),
                'size': np.asarray(size),
                'repa_target': rng.standard_normal(
                    (B, 16, 16)).astype(np.float32),
            }

    s1 = LwDTrainer(mk_model(), cfg).train(batches(2), resume=False)
    # fresh trainer, NO caller state: must pick up checkpoint-2
    t2 = LwDTrainer(mk_model(), cfg)
    s2 = t2.train(batches(2), resume=True, max_steps=4)
    assert int(s2.step) > int(s1.step)
    # abstract-template restore returns exactly the saved state
    t3 = LwDTrainer(mk_model(), cfg)
    template = t3.abstract_init_state(next(batches(1)))
    restored, found = t3.ckpt.restore(template, step=2)
    assert restored is not None and found == 2
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(restored.params)
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in
               zip(a, b))
