"""Model zoo: FiT/FiTv2 backbone, LwD/BFM segment-flow family, modules."""

from fitv2_tpu.models.bfm import BFM, split_decay_param_labels
from fitv2_tpu.models.fit import FiT, forward_with_cfg
from fitv2_tpu.models.fit_lwd import FiTLwD, repa_alignment_loss
from fitv2_tpu.models.fit_lwd_sharedenc import FiTLwDSharedEncSepDec
from fitv2_tpu.models.grid_utils import (
    make_grid, make_grid_mask_size, pixels_to_tokens,
)

__all__ = [
    'BFM', 'split_decay_param_labels', 'FiT', 'forward_with_cfg', 'FiTLwD',
    'FiTLwDSharedEncSepDec', 'repa_alignment_loss', 'make_grid',
    'make_grid_mask_size', 'pixels_to_tokens',
]
