"""Config-driven FiTv2 training loop.

TPU-native equivalent of /root/reference/train_fitv2.py:139-526: wires the
deterministic resumable data stream, the jitted sharded train step, EMA,
rotating orbax checkpoints, and metric logging into one loop.

Differences by design (SURVEY.md §7):
  - One mesh + NamedShardings replace Accelerate DDP/FSDP plumbing; the
    train step is jitted once with donated state.
  - The reference's token-trim to max-in-batch (train_fitv2.py:441-442) is
    replaced by fixed target_len padding — one compiled step, no recompiles.
  - Resume = orbax restore + sampler slice (reference :317-341, :394-411).
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
from fitv2_tpu.data.latent_dataset import INLatentLoader
from fitv2_tpu.flow.transport import Transport, create_transport
from fitv2_tpu.parallel.mesh import (
    MeshConfig, batch_sharding, build_mesh, fit_param_shardings,
    is_main_process, replicated)
from fitv2_tpu.train.lr_scheduler import get_scheduler
from fitv2_tpu.train.train_step import (
    OptimizerConfig, TrainState, create_train_state, make_optimizer,
    make_train_step, scale_lr_by_global_batch)

logger = logging.getLogger('fitv2_tpu.trainer')


@dataclasses.dataclass
class TrainerConfig:
    # data
    data_path: str = ''
    target_len: int = 256
    random_mode: str = 'random'
    global_batch_size: int = 256
    num_workers: int = 8
    # schedule
    max_steps: int = 2_000_000
    learning_rate: float = 1e-4
    scale_lr: bool = False
    lr_schedule: str = 'constant_with_warmup'
    lr_warmup_steps: int = 1000
    max_grad_norm: float = 1.0
    weight_decay: float = 0.0
    grad_accum_steps: int = 1
    # 'adamw' or 'came' (reference --came, train_fitv2.py:43,351-356)
    optimizer: str = 'adamw'
    # Adam first-moment dtype. bf16 halves that state's HBM traffic
    # (optimizer/EMA passes are memory-bound, ~18% of the XL step);
    # grad-scale information lives in the fp32 second moment, so the
    # training trajectory is unchanged to within bf16 rounding of mu.
    # Set None for the reference-exact fp32.
    mu_dtype: Optional[str] = 'bfloat16'
    ema_decay: float = 0.9999
    seed: int = 42
    # objective: 'flow' (FiTv2 transport) or 'ddpm' (FiTv1 improved
    # diffusion, reference train_fit.py)
    objective: str = 'flow'
    diffusion_steps: int = 1000
    # transport (reference create_transport defaults for FiTv2)
    path_type: str = 'Linear'
    prediction: str = 'velocity'
    snr_type: str = 'lognorm'
    # 'bf16' = bfloat16 compute with fp32 params/optimizer (the reference's
    # accelerate mixed_precision='bf16', train_fitv2.py:240-246); 'no' = fp32
    mixed_precision: str = 'bf16'
    # mesh: stage>1 turns on GPipe pipeline parallelism over the block
    # stack (parallel/pipeline.py) with pp_microbatches per data shard;
    # sequence>1 shards the token axis (SP for the HR/long-token path)
    mesh_data: int = -1
    mesh_stage: int = 1
    mesh_fsdp: int = 1
    mesh_sequence: int = 1
    mesh_tensor: int = 1
    pp_microbatches: int = 4
    # checkpoints / logging
    output_dir: str = 'runs/fitv2'
    checkpointing_steps: int = 4000
    checkpoints_total_limit: Optional[int] = 4
    milestone_steps: tuple = ()
    # overlap the checkpoint disk write with training (beyond reference
    # parity; accelerate.save_state blocks). The device->host gather still
    # happens inline; only the serialisation/write is deferred.
    async_checkpointing: bool = False
    # Preemption-safe exit (beyond reference; TPU VMs are commonly
    # preemptible/spot): on SIGTERM/SIGINT finish the in-flight step,
    # agree across processes, write a checkpoint at the interrupted step,
    # and return — instead of losing everything since the last cadence
    # save (the reference's only protection, train_fitv2.py:478-511).
    # A second signal exits immediately. After a preempted run,
    # Trainer.preempted is True — callers gating follow-on work (eval,
    # export) on a COMPLETED run must check it. Multi-process: the flag
    # is all-gathered every preemption_sync_every steps (never per step:
    # that host-blocking collective would kill dispatch run-ahead) so
    # every process enters the collective orbax save together.
    handle_preemption: bool = True
    preemption_sync_every: int = 16
    log_every: int = 100


class Trainer:
    def __init__(self, model, config: TrainerConfig,
                 transport: Optional[Transport] = None,
                 loader: Optional[Any] = None):
        if config.mixed_precision == 'bf16' and model.dtype == jnp.float32:
            model = model.clone(dtype=jnp.bfloat16)
        if getattr(model, 'gemm_precision', 'bf16') == 'int8':
            # int8 rounding has zero gradient — the W8A8 path is a
            # sampling/serving speed mode only (ops/quant.py)
            raise ValueError("gemm_precision='int8' is inference-only; "
                             "train in bf16 and quantize for serving")
        self.cfg = config
        self.preempted = False  # set True when train() exits on a signal
        self.transport = transport or create_transport(
            config.path_type, config.prediction, snr_type=config.snr_type)
        self.mesh = build_mesh(MeshConfig(
            data=config.mesh_data, stage=config.mesh_stage,
            fsdp=config.mesh_fsdp, sequence=config.mesh_sequence,
            tensor=config.mesh_tensor))
        if (config.mesh_stage == 1
                and any(self.mesh.shape.get(a, 1) > 1
                        for a in ('data', 'fsdp', 'sequence'))
                and hasattr(model, 'sequence_mesh')
                and model.sequence_mesh is None):
            # pin block-boundary activations batch(+token)-sharded
            # (parallel/mesh.constrain_sequence): under FSDP this forces the
            # ZeRO-3 per-layer weight all-gather pattern instead of the
            # TP-style activation re-layout SPMD propagation otherwise picks
            # (tests/test_comm_patterns.py). PP schedules its own sharding
            # (parallel/pipeline.py) and excludes this.
            model = model.clone(sequence_mesh=self.mesh)
        self.model = model
        self.loader = loader
        self.ckpt = CheckpointManager(
            os.path.join(config.output_dir, 'checkpoints'),
            total_limit=config.checkpoints_total_limit,
            milestone_steps=config.milestone_steps,
            async_save=config.async_checkpointing)

        lr = config.learning_rate
        if config.scale_lr:  # reference train_fitv2.py:276-284
            lr = scale_lr_by_global_batch(lr, config.global_batch_size)
        schedule = get_scheduler(config.lr_schedule, lr,
                                 num_warmup_steps=config.lr_warmup_steps,
                                 num_training_steps=config.max_steps)
        self.tx = make_optimizer(OptimizerConfig(
            learning_rate=lr, max_grad_norm=config.max_grad_norm,
            weight_decay=config.weight_decay,
            grad_accum_steps=config.grad_accum_steps,
            optimizer=config.optimizer,
            mu_dtype=(jnp.dtype(config.mu_dtype)
                      if config.mu_dtype else None),
            lr_schedule=schedule))
        if config.mesh_stage > 1 and config.objective == 'ddpm':
            raise ValueError('pipeline parallelism supports the flow '
                             'objective only')
        if config.mesh_stage > 1:
            data_shards = self.mesh.shape['data'] * self.mesh.shape['fsdp']
            if (config.global_batch_size % data_shards or
                    (config.global_batch_size // data_shards)
                    % config.pp_microbatches):
                raise ValueError(
                    f'global_batch_size={config.global_batch_size} must '
                    f'split into {data_shards} data shard(s) x '
                    f'pp_microbatches={config.pp_microbatches}')
        if config.objective == 'ddpm':
            # FiTv1 path: improved-diffusion epsilon/vb objective
            # (reference train_fit.py; learn_sigma models)
            from fitv2_tpu.sched.gaussian_diffusion import create_diffusion
            from fitv2_tpu.train.ddpm_train_step import make_ddpm_train_step
            diffusion = create_diffusion(
                timestep_respacing='',
                diffusion_steps=config.diffusion_steps,
                learn_sigma=model.learn_sigma)
            self._train_step = make_ddpm_train_step(
                self.model, diffusion, self.tx, config.ema_decay)
        else:
            apply_fn = None
            if config.mesh_stage > 1:
                from fitv2_tpu.parallel.pipeline import make_pipelined_forward
                apply_fn = make_pipelined_forward(
                    self.model, self.mesh, config.pp_microbatches,
                    train=True)
            self._train_step = make_train_step(self.model, self.transport,
                                               self.tx, config.ema_decay,
                                               apply_fn=apply_fn)

    # -- state ----------------------------------------------------------------

    def init_state(self, example_batch: Dict[str, np.ndarray]) -> TrainState:
        b = {k: jnp.asarray(v[:1]) for k, v in example_batch.items()}
        params = self.model.init(
            {'params': jax.random.PRNGKey(self.cfg.seed),
             'label_dropout': jax.random.PRNGKey(self.cfg.seed + 1)},
            b['feature'], jnp.zeros((1,)), b['label'], b['grid'], b['mask'],
            b.get('size'), train=True)['params']
        state = create_train_state(params, self.tx)
        shardings = self.state_shardings(state)
        return jax.device_put(state, shardings)

    def state_shardings(self, state: TrainState):
        if self.cfg.mesh_stage > 1:
            # PP: block stack split depth/S over 'stage'; params live where
            # their stage runs, and params-shaped optimizer moments (adam
            # mu/nu, accumulators) follow the same split — the per-stage
            # memory saving PP exists for
            from fitv2_tpu.parallel.pipeline import (
                pipeline_opt_shardings, pipeline_param_shardings)
            param_sh = pipeline_param_shardings(self.mesh, state.params)
            return TrainState(
                step=replicated(self.mesh), params=param_sh,
                ema_params=param_sh,
                opt_state=pipeline_opt_shardings(self.mesh,
                                                 state.opt_state))
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

    def abstract_init_state(self, example_batch: Dict[str, np.ndarray]
                            ) -> TrainState:
        """Shape-only TrainState (jax.eval_shape — zero device buffers)
        with the mesh shardings attached.

        The resume path restores straight into this template. Restoring
        into a MATERIALIZED fresh init state (the pre-round-5 flow) holds
        init + restored copies resident at once — at the XL fp32 state
        (9.45 GB) that double-residency OOMs the single-chip HBM, and on
        an FSDP pod it doubles every shard. Caught by the round-5
        hardware e2e resume run (tools/train_real_e2e.py)."""
        b = {k: jax.ShapeDtypeStruct((1,) + tuple(v.shape[1:]),
                                     np.asarray(v).dtype)
             for k, v in example_batch.items()}

        def init_fn(feature, label, grid, mask, size):
            params = self.model.init(
                {'params': jax.random.PRNGKey(self.cfg.seed),
                 'label_dropout': jax.random.PRNGKey(self.cfg.seed + 1)},
                feature, jnp.zeros((1,)), label, grid, mask, size,
                train=True)['params']
            return create_train_state(params, self.tx)

        abstract = jax.eval_shape(init_fn, b['feature'], b['label'],
                                  b['grid'], b['mask'], b.get('size'))
        shardings = self.state_shardings(abstract)
        return jax.tree_util.tree_map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            abstract, shardings)

    @staticmethod
    def _abstract_state(state):
        """Sharding-carrying abstract template for checkpoint restore.

        Orbax restores directly into each leaf's global sharding, so no
        host gather and no post-restore device_put is needed — each host
        reads only its shards (the inverse of the sharded save below)."""
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding), state)


    # -- loop -------------------------------------------------------------------

    def train(self, max_steps: Optional[int] = None,
              resume: bool = True,
              metric_hook: Optional[Callable[[int, Dict], None]] = None
              ) -> TrainState:
        cfg = self.cfg
        max_steps = max_steps or cfg.max_steps
        if self.loader is None:
            self.loader = INLatentLoader(
                cfg.data_path, cfg.target_len, cfg.random_mode,
                batch_size=cfg.global_batch_size // jax.process_count(),
                num_workers=cfg.num_workers)

        resume_step = 0
        state = None
        if resume:
            resume_step = latest_checkpoint_step(self.ckpt.ckpt_dir) or 0

        it = iter(self.loader.train_dataloader(
            cfg.global_batch_size, max_steps, resume_step, cfg.seed))
        first = next(it)
        if resume_step:
            # restore into an ABSTRACT template: the fresh init state is
            # never materialized next to the restored one (see
            # abstract_init_state — double-residency OOMs at the
            # single-chip memory ceiling)
            restored, found = self.ckpt.restore(
                self.abstract_init_state(first), step=resume_step)
            if restored is not None:
                state = restored  # arrives in the template's shardings
                logger.info('resumed from step %d', found)
        if state is None:
            state = self.init_state(first)

        bsh = batch_sharding(self.mesh)
        jitted = jax.jit(self._train_step, donate_argnums=(0,))
        rng = jax.random.PRNGKey(cfg.seed)
        t0 = time.time()

        def run_one(batch_np, state):
            batch = jax.device_put(
                {k: jnp.asarray(v) for k, v in batch_np.items()}, bsh)
            return jitted(state, batch, rng)

        # preemption handling: catch the first SIGTERM/SIGINT, finish the
        # in-flight step, checkpoint, return (see TrainerConfig docstring
        # and train/preemption.py)
        from fitv2_tpu.train.preemption import PreemptionGuard
        guard = PreemptionGuard(enabled=cfg.handle_preemption,
                                sync_every=cfg.preemption_sync_every)
        self.preempted = False

        try:
            state, metrics = run_one(first, state)
            step = resume_step + 1
            for batch_np in it:
                state, metrics = run_one(batch_np, state)
                step += 1
                if step % cfg.log_every == 0:
                    # vector-valued entries (ddpm per_t_loss/t feeding the
                    # importance resampler) are not loggable scalars
                    m = {k: float(v) for k, v in metrics.items()
                         if getattr(v, 'ndim', 0) == 0}
                    m['steps_per_sec'] = cfg.log_every / max(
                        time.time() - t0, 1e-9)
                    t0 = time.time()
                    if is_main_process():
                        logger.info('step %d: %s', step, json.dumps(m))
                    if metric_hook:
                        metric_hook(step, m)
                preempted = guard.should_stop(step)
                if (step % cfg.checkpointing_steps == 0 or step >= max_steps
                        or preempted):
                    # Save the sharded global jax.Arrays DIRECTLY: each host
                    # writes only its addressable shards (no full-state
                    # allgather — for the 3B fp32 state that gather was a
                    # tens-of-GB host-RAM + DCN spike on every host, every
                    # checkpoint). Orbax's save contract copies device data
                    # out before returning, so the donated-state training
                    # loop can continue immediately. EVERY process calls
                    # save: orbax's save is a collective (internal barriers)
                    # and elects writers itself — a rank0-only call
                    # deadlocks on a real pod (tests/test_multiprocess.py).
                    self.ckpt.save(step, state)
                if preempted:
                    if self.cfg.async_checkpointing:
                        self.ckpt.wait()
                    self.preempted = True
                    logger.warning(
                        'preemption checkpoint written at step %d; '
                        'exiting the train loop (Trainer.preempted=True)',
                        step)
                    break
                if step >= max_steps:
                    break
        finally:
            guard.restore()
        if self.cfg.async_checkpointing:
            # EVERY process waits: the async commit barrier is collective —
            # a main-only wait lets non-main processes exit with the commit
            # in flight, hanging process 0 / leaving the save uncommitted
            self.ckpt.wait()
        return state
