"""Jitted FiTv2 train step: flow loss, grads, clip, AdamW, EMA.

TPU-native equivalent of the reference train loop body
(/root/reference/train_fitv2.py:430-476): one compiled function performs
  loss = transport.training_losses(...)           (transport.py:132-175)
  backward + grad clip                            (train_fitv2.py:453-455)
  AdamW update + LR schedule                      (:456-459)
  EMA lerp decay 0.9999                           (:466-468, utils.py:96-110)
Gradient accumulation is expressed with optax.MultiSteps when requested
(reference accelerator.accumulate, train_fitv2.py:439).

Everything is pure: the caller jits ``train_step`` with donated state under
a mesh; shardings come from fitv2_tpu.parallel.mesh.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fitv2_tpu.flow.transport import Transport

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    ema_params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Reference AdamW defaults (configs/fitv2/config_fitv2_xl.yaml optimizer)."""
    learning_rate: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    grad_accum_steps: int = 1
    lr_schedule: Optional[Callable] = None  # step -> lr; overrides learning_rate
    # 'adamw' (default) or 'came' (reference --came flag,
    # train_fitv2.py:43,351-356; betas then default to CAME's (0.9, 0.999,
    # 0.9999) with eps (1e-30, 1e-16) unless overridden).
    optimizer: str = 'adamw'
    # dtype of Adam's first moment. bfloat16 halves that state's HBM
    # footprint/traffic (profiled: optimizer+EMA elementwise passes are
    # ~18% of the XL train step, memory-bound); fp32 (default) matches the
    # reference exactly.
    mu_dtype: Optional[Any] = None


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    lr = cfg.lr_schedule if cfg.lr_schedule is not None else cfg.learning_rate
    if cfg.optimizer == 'adamw':
        inner = optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                            weight_decay=cfg.weight_decay,
                            mu_dtype=cfg.mu_dtype)
    elif cfg.optimizer == 'came':
        from fitv2_tpu.train.came import came
        inner = came(lr, b1=cfg.betas[0], b2=cfg.betas[1],
                     weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f'unknown optimizer {cfg.optimizer!r} '
                         "(expected 'adamw' or 'came')")
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      ema_params=jax.tree_util.tree_map(jnp.copy, params),
                      opt_state=tx.init(params))


def update_ema(ema_params, params, decay: float = 0.9999):
    """ema <- decay*ema + (1-decay)*p (reference fit/utils/utils.py:96-110).

    ema_params must be float32: in bf16 the per-step increment
    (1-decay)*(p-ema) falls below the ~2^-8 relative precision, so the EMA
    silently never moves off its initial value while the training loss
    converges normally. Checked at trace time below.
    """
    for leaf in jax.tree_util.tree_leaves(ema_params):
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        eps = float(jnp.finfo(leaf.dtype).eps)
        if eps > (1.0 - decay):
            warnings.warn(
                f'update_ema: EMA dtype {leaf.dtype} has machine eps '
                f'{eps:.1e} > 1-decay {1.0 - decay:.1e}; the EMA update '
                'underflows and ema_params stays frozen at its initial '
                'value. Keep EMA (and params) in float32.',
                stacklevel=2)
            break
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params, params)


def make_train_step(model, transport: Transport,
                    tx: optax.GradientTransformation,
                    ema_decay: float = 0.9999,
                    apply_fn: Optional[Callable] = None,
                    ) -> Callable[[TrainState, Dict[str, Array], Array],
                                  Tuple[TrainState, Dict[str, Array]]]:
    """Build the pure train-step fn for a FiT model.

    batch dict: feature (B, N, C_tok), grid (B, 2, N), mask (B, N),
    label (B,), size (B, 1, 2). rng is folded with the step counter so one
    key serves the whole run.

    ``apply_fn(params, x, t, y, grid, mask, size, rngs=...)`` overrides
    ``model.apply`` with an alternative executor of the same network —
    e.g. the GPipe pipelined forward (parallel/pipeline.py) built with
    train=True.
    """

    def loss_fn(params, batch, rng):
        k_transport, k_drop = jax.random.split(rng)

        def model_fn(xt, t):
            if apply_fn is not None:
                return apply_fn(params, xt, t, batch['label'],
                                batch['grid'], batch['mask'],
                                batch.get('size'),
                                rngs={'label_dropout': k_drop})
            return model.apply(
                {'params': params}, xt, t, batch['label'], batch['grid'],
                batch['mask'], batch.get('size'), train=True,
                rngs={'label_dropout': k_drop})

        out = transport.training_losses(k_transport, model_fn,
                                        batch['feature'],
                                        mask=batch['mask'])
        return jnp.mean(out['loss']), out

    def train_step(state: TrainState, batch: Dict[str, Array], rng: Array
                   ) -> Tuple[TrainState, Dict[str, Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng)
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = update_ema(state.ema_params, new_params, ema_decay)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               ema_params=new_ema,
                               opt_state=new_opt_state)
        metrics = {'loss': loss, 'grad_norm': grad_norm}
        return new_state, metrics

    return train_step


def scale_lr_by_global_batch(base_lr: float, global_batch_size: int,
                             base_batch_size: int = 256) -> float:
    """Linear LR scaling (reference train_fitv2.py:276-284)."""
    return base_lr * global_batch_size / base_batch_size


def make_grouped_optimizer(params, group_fn: Callable,
                           group_txs: Dict[str, optax.GradientTransformation]
                           ) -> optax.GradientTransformation:
    """Per-group optimizer (reference fit/utils/utils.py:175-265 per-group
    lr helper): ``group_fn(path_str, leaf) -> label`` assigns each param to
    a transformation in ``group_txs`` via optax.multi_transform."""
    import jax as _jax

    def label_tree(p):
        def label(path_tuple, leaf):
            path = '/'.join(str(getattr(k, 'key', k)) for k in path_tuple)
            lbl = group_fn(path, leaf)
            assert lbl in group_txs, (lbl, list(group_txs))
            return lbl
        return _jax.tree_util.tree_map_with_path(label, p)

    return optax.multi_transform(group_txs, label_tree)


def make_finetune_optimizer(tx: optax.GradientTransformation,
                            unfreeze: Sequence[str],
                            finetune_type: str = 'partial'
                            ) -> optax.GradientTransformation:
    """Substring freeze-by-pattern (reference fit_model.py:292-300
    ``FiT.finetune(type, unfreeze)``): with ``finetune_type='full'`` every
    parameter trains; otherwise every parameter is FROZEN except those whose
    '/'-joined path contains any substring in ``unfreeze`` (the reference
    matches against torch parameter names, e.g. 'adaLN' or 'norm').

    Frozen parameters get optax.set_to_zero() updates, so optimizer state
    for them is empty and their values are bit-preserved across steps.
    """
    if finetune_type == 'full':
        return tx

    unfreeze = tuple(unfreeze)

    def group_fn(path: str, leaf) -> str:
        return 'train' if any(u in path for u in unfreeze) else 'frozen'

    def label_tree(p):
        return jax.tree_util.tree_map_with_path(
            lambda path_tuple, leaf: group_fn(
                '/'.join(str(getattr(k, 'key', k)) for k in path_tuple),
                leaf), p)

    return optax.multi_transform(
        {'train': tx, 'frozen': optax.set_to_zero()}, label_tree)
