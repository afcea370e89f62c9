"""Utilities: config instantiation, distributed stats, misc helpers."""

from fitv2_tpu.utils.config import (
    config_to_model, deep_merge, get_obj_from_str, instantiate_from_config,
    load_config,
)
from fitv2_tpu.utils.misc import (
    EasyDict, assert_shape, count_params, nan_to_num, print_module_summary,
    profiled_function,
)

__all__ = [
    'config_to_model', 'deep_merge', 'get_obj_from_str',
    'instantiate_from_config', 'load_config',
    'EasyDict', 'assert_shape', 'count_params', 'nan_to_num',
    'print_module_summary', 'profiled_function',
]
