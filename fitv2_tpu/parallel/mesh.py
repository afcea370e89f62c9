"""Device-mesh construction and named sharding helpers.

TPU-native replacement for the reference's NCCL/torchrun distributed layer
(/root/reference/fit — DDP: sample_fitv2_ddp.py:51; FSDP: train_fitv2.py:
195-239; collectives inventory SURVEY.md §2.9). One ``jax.sharding.Mesh``
spans all chips; parallelism strategies are expressed as axis names:

  - ``data``   : data parallel (batch sharding) — DDP equivalent
  - ``fsdp``   : parameter sharding along the same replica group — the
                 FULL_SHARD / ZeRO-3 equivalent; XLA inserts all-gather /
                 reduce-scatter over ICI at each layer boundary
  - ``tensor`` : tensor parallel (attention heads / mlp hidden) — beyond
                 reference parity, the idiomatic TPU scale-out for 3B+

Multi-host: call ``jax.distributed.initialize()`` before ``build_mesh``; the
mesh is laid out so ``data`` spans DCN (across slices) and ``fsdp``/``tensor``
ride ICI within a slice.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Axis sizes; -1 means 'remaining devices'.

    Order: (data, stage, fsdp, sequence, tensor). 'sequence' shards the
    TOKEN axis of activations (sequence parallelism for the HR/long-token
    path — XLA inserts the per-layer k/v all-gathers); 'stage' is GPipe
    pipeline parallelism over the depth-stacked block params
    (parallel/pipeline.py). Both go beyond reference parity (the reference
    has no SP or PP, SURVEY.md §2.9/§5)."""
    data: int = -1
    stage: int = 1
    fsdp: int = 1
    sequence: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> Tuple[int, int, int, int, int]:
        sizes = [self.data, self.stage, self.fsdp, self.sequence, self.tensor]
        free = [i for i, s in enumerate(sizes) if s == -1]
        fixed = int(np.prod([s for s in sizes if s != -1]))
        assert len(free) <= 1, 'at most one axis may be -1'
        if free:
            assert n_devices % fixed == 0, (n_devices, sizes)
            sizes[free[0]] = n_devices // fixed
        assert int(np.prod(sizes)) == n_devices, (
            f'mesh {sizes} != {n_devices} devices')
        return tuple(sizes)


def build_mesh(config: Optional[MeshConfig] = None,
               devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, stage, fsdp, sequence, tensor) mesh over the devices.

    Device order follows jax.devices(), which enumerates ICI-contiguous
    chips first — so the innermost axes (tensor, sequence, fsdp) map to ICI
    neighbors, 'stage' neighbors (the ppermute ring) stay within a slice,
    and 'data' (outermost) absorbs DCN hops on multi-slice.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    d, st, f, sq, t = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(d, st, f, sq, t)
    return Mesh(dev_array, ('data', 'stage', 'fsdp', 'sequence', 'tensor'))


# ---------------------------------------------------------------------------
# Sharding rules
# ---------------------------------------------------------------------------

def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the batch over data AND fsdp axes (ZeRO-style: every chip gets
    a batch shard; fsdp only additionally shards params)."""
    return NamedSharding(mesh, P(('data', 'fsdp')))


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, tokens, ...) activations sharded over batch AND token axes —
    sequence parallelism for long-token (HR) workloads. Tolerates meshes
    without a data/fsdp axis (e.g. a plain ('data','sequence') user mesh)."""
    batch_axes = tuple(a for a in ('data', 'fsdp') if a in mesh.shape)
    return NamedSharding(mesh, P(batch_axes or None, 'sequence'))


def constrain_sequence(x, mesh: Optional[Mesh]):
    """Apply the per-block activation sharding constraint inside jit.

    x: (batch, tokens, ...) activations. No-op when mesh is None or has
    neither a 'sequence' extent nor a batch ('data'/'fsdp') extent — models
    carry an optional ``sequence_mesh`` and call this unconditionally
    (fitv2_tpu/models/fit.py).

    With a sequence axis, activations STAY token-sharded through the
    MLP/norm/modulation chain; XLA inserts the attention k/v all-gathers at
    the softmax einsum and re-partitions afterward (the Ulysses-style SP
    layout for the long-token HR path; the reference has no SP at all,
    SURVEY.md §2.9).

    With only batch axes (DP/FSDP meshes), activations are PINNED
    batch-sharded at every block boundary. This is what makes FSDP compile
    to the intended ZeRO-3 pattern — per-layer WEIGHT all-gathers with
    batch-sharded compute. Without the pin, SPMD propagation is free to
    keep the fsdp-sharded weights in place and re-shard the activations
    instead (a TP-style layout with full-batch activation all-gathers and
    all-to-all storms between blocks — observed on the 8-device virtual
    mesh, tests/test_comm_patterns.py)."""
    if mesh is None:
        return x
    seq = mesh.shape.get('sequence', 1)
    batch_axes = tuple(a for a in ('data', 'fsdp')
                       if mesh.shape.get(a, 1) > 1)
    if seq == 1 and not batch_axes:
        return x
    batch_extent = int(np.prod([mesh.shape[a] for a in batch_axes],
                               dtype=np.int64)) if batch_axes else 1
    if (x.ndim < 2
            or x.shape[0] % batch_extent != 0
            or x.shape[1] % seq != 0):
        return x  # e.g. batch-1 init traces; constraint would be invalid
    spec = P(batch_axes or None, 'sequence' if seq > 1 else None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: str, shape: Tuple[int, ...], fsdp: int,
                    tensor: int) -> P:
    """Partition rule for one FiT parameter leaf.

    Layout knowledge (fitv2_tpu/models): scanned block params are stacked
    (depth, ...); kernels are (in, out); qkv kernel is (D, 3D); mlp fc1
    kernels (D, hidden); fc2 (hidden, D); embeddings (vocab, D).

      tensor axis: attention qkv/proj + mlp kernels split on the head/hidden
        dim (Megatron layout: column-parallel fc1/qkv, row-parallel fc2/proj).
      fsdp axis: shard the largest remaining dim divisible by the axis size.
    """
    ndim = len(shape)
    spec: list = [None] * ndim

    def divisible(ax: int, size: int) -> bool:
        return spec[ax] is None and shape[ax] % size == 0 and shape[ax] >= size

    if tensor > 1:
        tp_axis = None
        if ('attn/qkv/kernel' in path or 'mlp/fc1' in path
                or 'adaLN' in path and path.endswith('kernel')):
            tp_axis = ndim - 1  # column parallel: split output dim
        elif 'attn/proj/kernel' in path or 'mlp/fc2/kernel' in path:
            tp_axis = ndim - 2  # row parallel: split input dim
        if tp_axis is not None and divisible(tp_axis, tensor):
            spec[tp_axis] = 'tensor'

    if fsdp > 1 and ndim >= 1:
        # skip the scan depth axis (leading) for stacked block params:
        # sharding depth would serialize the scan's gather. FiT's stack is
        # 'blocks/block/...'; the LwD family's per-segment/shared stacks are
        # '<name>/stack/...' (models/fit_lwd.BlockStack, name='stack').
        stacked = (path.startswith('blocks/') or '/stack/' in path)
        start = 1 if (stacked and ndim >= 2) else 0
        cands = sorted(range(start, ndim), key=lambda a: -shape[a])
        for ax in cands:
            if divisible(ax, fsdp):
                spec[ax] = 'fsdp'
                break

    return P(*spec)


def fit_param_shardings(mesh: Mesh, params) -> object:
    """NamedSharding pytree for a FiT params tree under the mesh config."""
    fsdp = mesh.shape['fsdp']
    tensor = mesh.shape['tensor']

    def to_sharding(path_tuple, leaf):
        path = '/'.join(str(getattr(k, 'key', k)) for k in path_tuple)
        return NamedSharding(mesh,
                             _spec_for_param(path, leaf.shape, fsdp, tensor))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(mesh: Mesh, params):
    """Device-put a host params tree onto its computed shardings."""
    shardings = fit_param_shardings(mesh, params)
    return jax.device_put(params, shardings)


# ---------------------------------------------------------------------------
# Multi-host helpers (reference torch_utils/distributed.py equivalents)
# ---------------------------------------------------------------------------

def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def print0(*args, **kwargs) -> None:
    if is_main_process():
        print(*args, **kwargs)


def sync_global_devices(name: str = 'barrier') -> None:
    """Cross-host barrier (reference dist.barrier equivalent)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def process_allgather(x, tiled: bool = False):
    """Gather per-host arrays to all hosts (reference dist.all_gather).

    tiled=False stacks a new leading process axis (per-host numpy inputs,
    the FID-sample gather). Global non-fully-addressable jax.Arrays require
    tiled=True and come back as their full replicated value (checkpoints
    no longer need this — the trainers save sharded arrays directly)."""
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x, tiled=tiled)
