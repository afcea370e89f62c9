"""Device mesh, sharding rules, and multihost helpers."""

from fitv2_tpu.parallel.hlo_check import (
    collective_counts, collective_shapes,
)
from fitv2_tpu.parallel.mesh import (
    MeshConfig, batch_sharding, build_mesh, constrain_sequence,
    fit_param_shardings, is_main_process, print0, process_allgather,
    replicated, sequence_sharding, shard_params, sync_global_devices,
)
from fitv2_tpu.parallel.pipeline import (
    make_pipelined_forward, pipeline_param_shardings,
)

__all__ = [
    'MeshConfig', 'batch_sharding', 'build_mesh', 'collective_counts',
    'collective_shapes', 'constrain_sequence', 'fit_param_shardings',
    'is_main_process', 'make_pipelined_forward', 'pipeline_param_shardings',
    'print0', 'process_allgather', 'replicated', 'sequence_sharding',
    'shard_params', 'sync_global_devices',
]
