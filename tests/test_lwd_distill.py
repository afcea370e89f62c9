"""Teacher-trajectory distillation: LwD student learns from a frozen FiT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fitv2_tpu.models.fit import FiT
from fitv2_tpu.models.fit_lwd import FiTLwD
from fitv2_tpu.models.grid_utils import make_grid_mask_size
from fitv2_tpu.train import (
    OptimizerConfig, create_train_state, make_optimizer,
)
from fitv2_tpu.train.lwd_train_step import make_lwd_distill_step


def test_distill_step_runs_and_reduces_loss():
    B, n_ctx = 4, 16
    grid, mask, size = make_grid_mask_size(B, 4, 4, n_ctx)

    teacher = FiT(context_size=n_ctx, patch_size=2, in_channels=4,
                  hidden_size=32, depth=2, num_heads=2, num_classes=10,
                  learn_sigma=False, use_sit=True, max_cached_len=8)
    t_params = teacher.init(jax.random.PRNGKey(0), jnp.zeros((B, n_ctx, 16)),
                            jnp.zeros((B,)), jnp.zeros((B,), jnp.int32),
                            grid, mask, size)['params']
    # adaLN-zero init makes a fresh teacher output exactly 0 (trajectory
    # targets degenerate) — give the teacher random weights
    rng_np = np.random.default_rng(0)
    t_params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            rng_np.standard_normal(v.shape).astype(np.float32) * 0.05),
        t_params)

    def teacher_apply(x, t, batch):
        return teacher.apply({'params': t_params}, x, t, batch['label'],
                             batch['grid'], batch['mask'], batch.get('size'))

    student = FiTLwD(context_size=n_ctx, patch_size=2, in_channels=4,
                     hidden_size=32, depth=2, num_heads=2, num_classes=10,
                     number_of_perflow=2, n_patch_h=4, n_patch_w=4,
                     adaln_type='lora', adaln_lora_dim=8, max_cached_len=8)
    s_params = student.init(
        {'params': jax.random.PRNGKey(1),
         'label_dropout': jax.random.PRNGKey(2)},
        jnp.zeros((B, n_ctx, 16)), jnp.zeros((B,)),
        jnp.zeros((B,), jnp.int32), grid, mask, size)['params']

    tx = make_optimizer(OptimizerConfig(learning_rate=3e-3))
    state = create_train_state(s_params, tx)
    step = make_lwd_distill_step(student, teacher_apply, tx, solver_steps=2)
    jitted = {k: jax.jit(lambda s, b, r, k=k: step(s, b, r, k))
              for k in range(2)}

    batch = {
        'feature': jax.random.normal(jax.random.PRNGKey(3), (B, n_ctx, 16)),
        'grid': grid, 'mask': mask,
        'label': (jnp.arange(B) % 10).astype(jnp.int32), 'size': size,
    }
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(20):
        state, m = jitted[i % 2](state, batch, rng)
        losses.append(float(m['loss']))
    assert np.isfinite(losses).all()
    # the student should start fitting the teacher's (frozen) trajectories
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
