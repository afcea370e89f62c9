"""Checkpointing: orbax train-state manager + PyTorch weight importer."""

from fitv2_tpu.ckpt.checkpoint import (
    CheckpointManager, latest_checkpoint_step, list_checkpoints,
)
from fitv2_tpu.ckpt.torch_import import (
    convert_fit_state_dict, init_from_ckpt, load_torch_state_dict,
)

__all__ = [
    'CheckpointManager', 'latest_checkpoint_step', 'list_checkpoints',
    'convert_fit_state_dict', 'init_from_ckpt', 'load_torch_state_dict',
]
