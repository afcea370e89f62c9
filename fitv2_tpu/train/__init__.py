"""Training infra: jitted train step, optimizers, LR schedules, EMA."""

from fitv2_tpu.train.lr_scheduler import get_scheduler
from fitv2_tpu.train.lwd_train_step import SegmentSampler, make_lwd_train_step
from fitv2_tpu.train.train_step import (
    OptimizerConfig, TrainState, create_train_state, make_finetune_optimizer,
    make_grouped_optimizer, make_optimizer, make_train_step,
    scale_lr_by_global_batch, update_ema,
)

__all__ = [
    'get_scheduler', 'SegmentSampler', 'make_lwd_train_step',
    'OptimizerConfig', 'TrainState', 'create_train_state',
    'make_finetune_optimizer', 'make_grouped_optimizer',
    'make_optimizer', 'make_train_step', 'scale_lr_by_global_batch',
    'update_ema',
]
