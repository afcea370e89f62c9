"""Compute ops: mask-aware attention (XLA + Pallas flash), fused elementwise.

Native-op parity map (SURVEY.md §2.8):
  bias_act CUDA plugin    -> fitv2_tpu.ops.bias_act (XLA-fused elementwise)
  upfirdn2d CUDA plugin   -> fitv2_tpu.ops.upfirdn2d (conv_general_dilated)
  SDPA flash attention    -> fitv2_tpu.ops.flash_attention (Pallas TPU)
  conv2d_gradfix          -> N/A (JAX autodiff has no double-backward bug)
  custom_ops JIT loader   -> N/A (kernels are jitted Pallas, no runtime C++)
"""

from fitv2_tpu.ops.attention import masked_attention
from fitv2_tpu.ops.bias_act import ACTIVATION_FUNCS, bias_act
from fitv2_tpu.ops.upfirdn2d import (
    downsample2d, filter2d, setup_filter, upfirdn2d, upsample2d,
)

__all__ = [
    'masked_attention', 'ACTIVATION_FUNCS',
    'bias_act', 'downsample2d', 'filter2d', 'setup_filter', 'upfirdn2d',
    'upsample2d',
]
