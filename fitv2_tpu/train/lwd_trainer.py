"""LwD/BFM training loop: random-segment reflow training with REPA.

TPU-native equivalent of the reference LwD/BFM trainers
(/root/reference/train.py:128-548, train_fitv2_lwd.py:680-790): per step,
draw a segment index on the host (train.py:335), run the jitted segment
train step (fitv2_tpu/train/lwd_train_step.py), EMA, checkpoints.

Distillation (reference train_fitv2_lwd.py --distillation :212-219,414-453):
when a teacher apply-fn is provided, the flow target interpolation endpoints
are replaced by teacher trajectories — supported through the
``teacher_fn`` hook that maps (x0, x1, rng) -> (xt_in, xt) endpoints.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from fitv2_tpu.ckpt.checkpoint import CheckpointManager, latest_checkpoint_step
from fitv2_tpu.parallel.mesh import (
    MeshConfig, batch_sharding, build_mesh, is_main_process)
from fitv2_tpu.train.lwd_train_step import SegmentSampler, make_lwd_train_step
from fitv2_tpu.train.train_step import (
    OptimizerConfig, create_train_state, make_optimizer)

logger = logging.getLogger('fitv2_tpu.lwd_trainer')


@dataclasses.dataclass
class LwDTrainerConfig:
    max_steps: int = 400_000
    learning_rate: float = 1e-4
    max_grad_norm: float = 1.0
    weight_decay: float = 0.0
    ema_decay: float = 0.9999
    repa_weight: float = 0.5
    segments_per_step: int = 3      # reference for_loop=3 (train.py:330)
    seed: int = 42
    output_dir: str = 'runs/lwd'
    checkpointing_steps: int = 4000
    checkpoints_total_limit: Optional[int] = 4
    log_every: int = 100
    mesh_fsdp: int = 1
    mesh_tensor: int = 1
    # overlap checkpoint writes with training (see TrainerConfig)
    async_checkpointing: bool = False
    # preemption-safe exit (see TrainerConfig / train/preemption.py)
    handle_preemption: bool = True
    preemption_sync_every: int = 16


class LwDTrainer:
    def __init__(self, model, config: LwDTrainerConfig,
                 teacher_apply=None, distill_solver_steps: int = 8,
                 recipe: str = 'reflow', finetune_mode: str = 'replace',
                 multi_scale_indices=(2, 7)):
        """Recipes mirror the reference's LwD training entry scripts:
          'reflow'      random-segment reflow + REPA (train_fitv2_lwd.py,
                        train.py); with ``teacher_apply(x, t, batch) ->
                        velocity`` targets come from rolling the frozen
                        teacher (--distillation, train_fitv2_lwd.py:212-219)
          'multiscale'  per-tier resolution schedule
                        (train_fitv2_lwd_ms.py:682-886)
          'finetune'    frozen-trunk mid-block representation forecaster
                        (train_fitv2_lwd_finetune.py; mode replace/
                        residual/blend)
        """
        self.cfg = config
        self.mesh = build_mesh(MeshConfig(
            data=-1, fsdp=config.mesh_fsdp, tensor=config.mesh_tensor))
        if (any(self.mesh.shape.get(a, 1) > 1
                for a in ('data', 'fsdp', 'sequence'))
                and hasattr(model, 'sequence_mesh')
                and model.sequence_mesh is None):
            # pin block-boundary activations batch-sharded
            # (parallel/mesh.constrain_sequence): under FSDP this forces the
            # ZeRO-3 per-layer weight all-gather pattern instead of the
            # TP-style activation re-layout SPMD propagation otherwise picks
            # — the exact failure mode round 4 caught on FiT, now pinned for
            # the LwD family too (tests/test_comm_patterns.py).
            model = model.clone(sequence_mesh=self.mesh)
        self.model = model
        self.tx = make_optimizer(OptimizerConfig(
            learning_rate=config.learning_rate,
            max_grad_norm=config.max_grad_norm,
            weight_decay=config.weight_decay))
        self.ckpt = CheckpointManager(
            os.path.join(config.output_dir, 'checkpoints'),
            total_limit=config.checkpoints_total_limit,
            async_save=config.async_checkpointing)
        if teacher_apply is not None:
            from fitv2_tpu.train.lwd_train_step import make_lwd_distill_step
            step_fn = make_lwd_distill_step(model, teacher_apply, self.tx,
                                            distill_solver_steps,
                                            config.ema_decay)
        elif recipe == 'multiscale':
            from fitv2_tpu.train.lwd_train_step import (
                make_lwd_multiscale_train_step)
            step_fn = make_lwd_multiscale_train_step(
                model, self.tx, config.ema_decay,
                multi_scale_indices=multi_scale_indices)
        elif recipe == 'finetune':
            from fitv2_tpu.train.lwd_train_step import make_lwd_finetune_step
            step_fn = make_lwd_finetune_step(model, self.tx,
                                             config.ema_decay,
                                             mode=finetune_mode)
        elif recipe == 'reflow':
            step_fn = make_lwd_train_step(model, self.tx, config.ema_decay,
                                          config.repa_weight)
        else:
            raise ValueError(f'unknown LwD recipe: {recipe!r}')
        # one compiled variant per (static) segment index; the state is
        # donated and threads call-to-call, so params/moments never hold a
        # second HBM copy (same contract as Trainer's jitted step)
        self._jitted = {
            k: jax.jit(lambda s, b, r, k=k: step_fn(s, b, r, k),
                       donate_argnums=(0,))
            for k in range(model.number_of_perflow)}
        self._segment_sampler = SegmentSampler(model.number_of_perflow,
                                               seed=config.seed)
        self.preempted = False  # set True when train() exits on a signal

    def init_state(self, example_batch: Dict[str, np.ndarray]):
        b = {k: jnp.asarray(v[:1]) for k, v in example_batch.items()
             if k != 'repa_target'}
        params = self.model.init(
            {'params': jax.random.PRNGKey(self.cfg.seed),
             'label_dropout': jax.random.PRNGKey(self.cfg.seed + 1)},
            b['feature'], jnp.zeros((1,)), b['label'], b['grid'], b['mask'],
            b.get('size'))['params']
        state = create_train_state(params, self.tx)
        return jax.device_put(state, self.state_shardings(state))

    def abstract_init_state(self, example_batch: Dict[str, np.ndarray]):
        """Shape-only sharded TrainState template (jax.eval_shape — zero
        device buffers) for restoring WITHOUT materializing a fresh init
        state next to the restored copy (double-residency OOMs at the
        single-chip memory ceiling; same fix as Trainer.abstract_init_state,
        caught by the round-5 hardware e2e resume run)."""
        b = {k: jax.ShapeDtypeStruct((1,) + tuple(np.asarray(v).shape[1:]),
                                     np.asarray(v).dtype)
             for k, v in example_batch.items() if k != 'repa_target'}

        def init_fn(feature, label, grid, mask, size):
            params = self.model.init(
                {'params': jax.random.PRNGKey(self.cfg.seed),
                 'label_dropout': jax.random.PRNGKey(self.cfg.seed + 1)},
                feature, jnp.zeros((1,)), label, grid, mask, size)['params']
            return create_train_state(params, self.tx)

        abstract = jax.eval_shape(init_fn, b['feature'], b['label'],
                                  b['grid'], b['mask'], b.get('size'))
        shardings = self.state_shardings(abstract)
        return jax.tree_util.tree_map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            abstract, shardings)

    def state_shardings(self, state):
        """Params (and params-shaped adam moments / EMA) sharded by the
        fsdp/tensor rules (parallel/mesh.fit_param_shardings — the rule
        layer generalizes to the LwD per-segment stacks: '<seg>/stack/...'
        leaves skip the scan depth axis exactly like FiT's 'blocks/...');
        scalars replicated. Same layout contract as Trainer.state_shardings.
        """
        from fitv2_tpu.parallel.mesh import fit_param_shardings, replicated
        from fitv2_tpu.train.train_step import TrainState
        param_sh = fit_param_shardings(self.mesh, state.params)

        def opt_sharding(x):
            if hasattr(x, 'shape') and getattr(x, 'ndim', 0) > 0:
                return fit_param_shardings(self.mesh, {'x': x})['x']
            return replicated(self.mesh)

        return TrainState(
            step=replicated(self.mesh), params=param_sh, ema_params=param_sh,
            opt_state=jax.tree_util.tree_map(
                opt_sharding, state.opt_state,
                is_leaf=lambda x: hasattr(x, 'shape')))

    def train(self, batch_iterator, state=None, max_steps: Optional[int] = None,
              resume: bool = True,
              metric_hook: Optional[Callable[[int, Dict], None]] = None):
        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        rng = jax.random.PRNGKey(cfg.seed)
        bsh = batch_sharding(self.mesh)
        if state is not None:
            # caller-provided states arrive unsharded; lay them out before
            # the restore template / jitted steps see them
            state = jax.device_put(state, self.state_shardings(state))

        step = 0
        if resume:
            found = latest_checkpoint_step(self.ckpt.ckpt_dir)
            if found:
                if state is not None:
                    template = self._abstract_state(state)
                else:
                    # no caller state: build the template abstractly from
                    # the first batch's shapes (pre-round-5 this path
                    # silently SKIPPED the restore and re-initialized)
                    batch_iterator = iter(batch_iterator)
                    first = next(batch_iterator, None)
                    if first is not None:
                        import itertools
                        batch_iterator = itertools.chain([first],
                                                         batch_iterator)
                        template = self.abstract_init_state(first)
                    else:
                        template = None  # empty iterator: nothing to train
                if template is not None:
                    restored, step = self.ckpt.restore(template, step=found)
                    if restored is not None:
                        state = restored

        from fitv2_tpu.train.preemption import PreemptionGuard
        guard = PreemptionGuard(enabled=cfg.handle_preemption,
                                sync_every=cfg.preemption_sync_every)
        self.preempted = False

        t0 = time.time()
        try:
            for batch_np in batch_iterator:
                if state is None:
                    state = self.init_state(batch_np)
                batch = jax.device_put(
                    {k: jnp.asarray(v) for k, v in batch_np.items()}, bsh)
                agg: Dict[str, float] = {}
                for _ in range(cfg.segments_per_step):
                    seg = self._segment_sampler()
                    state, metrics = self._jitted[seg](state, batch, rng)
                    for k, v in metrics.items():
                        agg[k] = (agg.get(k, 0.0)
                                  + float(v) / cfg.segments_per_step)
                step += 1
                if step % cfg.log_every == 0:
                    agg['steps_per_sec'] = cfg.log_every / max(
                        time.time() - t0, 1e-9)
                    t0 = time.time()
                    if is_main_process():
                        logger.info('step %d: %s', step, json.dumps(agg))
                    if metric_hook:
                        metric_hook(step, agg)
                preempted = guard.should_stop(step)
                if (step % cfg.checkpointing_steps == 0 or step >= max_steps
                        or preempted):
                    # Sharded global arrays saved directly (each host writes
                    # its shards — no full-state allgather spike); EVERY
                    # process calls save — orbax's save is a collective;
                    # rank0-only deadlocks on a pod
                    # (tests/test_multiprocess.py, same fix as Trainer)
                    self.ckpt.save(step, state)
                if preempted:
                    if cfg.async_checkpointing:
                        self.ckpt.wait()  # all processes, matching Trainer
                    self.preempted = True
                    logger.warning('preemption checkpoint written at step '
                                   '%d; exiting the LwD train loop', step)
                    break
                if step >= max_steps:
                    break
        finally:
            guard.restore()
        if self.cfg.async_checkpointing:
            # every process: the async commit barrier is collective
            self.ckpt.wait()
        return state

    @staticmethod
    def _abstract_state(state):
        """Sharding-carrying abstract restore template (no host gather;
        same as Trainer._abstract_state)."""
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding), state)
