"""GPipe pipeline parallelism over the FiT block stack ('stage' mesh axis).

The reference has NO pipeline parallelism — its scale-out is DDP/FSDP over
NCCL (SURVEY.md §2.9; /root/reference/train_fitv2.py:195-239). This module
goes beyond parity with the idiomatic TPU form: the depth-D scan-stacked
block parameters (models/fit.py nn.scan layout, every leaf (D, ...)) are
sharded D/S per device along a 'stage' mesh axis, and ``shard_map`` runs the
classic GPipe schedule — M microbatches flow through S stages over M+S-1
ticks, with ``lax.ppermute`` point-to-point ICI transfers between neighbor
stages. Everything is differentiable (ppermute/scan have transposes), so the
same executor serves training; combine with the 'data' axis for DP x PP.

Why PP at all when FSDP exists: at 3B+ scale FSDP all-gathers every
parameter byte per step, while PP moves only one microbatch of activations
per tick between ICI neighbors — the standard tradeoff the scaling playbook
resolves per topology/model size. This module makes the choice available;
configs default to DP/FSDP.

Design notes:
  - The pre/post graph (embedders, RoPE tables, global adaLN, final layer)
    is tiny next to the 36-block trunk; it runs replicated outside the
    shard_map, exactly mirroring FiT.__call__ (parity asserted by
    tests/test_pipeline_parallel.py against model.apply).
  - The last stage holds the trunk output; a masked psum over 'stage'
    broadcasts it (the GPipe output gather). Bubble fraction is
    (S-1)/(M+S-1): pick M >= 4*S for >~80% pipeline utilization.
  - M must divide the per-data-shard batch; S must divide model.depth.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

Array = jax.Array


def pipeline_param_shardings(mesh: Mesh, params) -> Any:
    """NamedSharding tree for PP: stacked block leaves split along depth
    over 'stage'; everything else replicated. Compose with fsdp/tensor rules
    by post-editing the returned tree if needed."""
    def rule(path_tuple, leaf):
        path = '/'.join(str(getattr(k, 'key', k)) for k in path_tuple)
        if path.startswith('blocks/'):
            return NamedSharding(mesh, P('stage'))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(rule, params)


def pipeline_opt_shardings(mesh: Mesh, opt_state) -> Any:
    """NamedSharding tree for an optimizer state under PP: params-shaped
    moments/accumulators of the stacked block leaves (any path through
    ``blocks/block``) follow the same depth/S 'stage' split as their
    params; scalars and everything else replicated."""
    def rule(path_tuple, leaf):
        path = '/'.join(str(getattr(k, 'key', getattr(k, 'name', k)))
                        for k in path_tuple)
        if 'blocks/block' in path and getattr(leaf, 'ndim', 0) > 0:
            return NamedSharding(mesh, P('stage'))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(rule, opt_state)


def make_pipelined_forward(model, mesh: Mesh, n_microbatches: int,
                           train: bool = False):
    """Build ``fwd(params, x, t, y, grid, mask, size, rngs=None,
    force_drop_ids=None) -> (B, N, p**2*C_out)`` running the block stack
    under the GPipe schedule on ``mesh``'s 'stage' axis.

    ``model`` must use scan_blocks=True (stacked (D, ...) block params) and
    the bf16/fp32 parity path (int8 serving carries extra quant collections
    the pipeline does not thread). Output matches ``model.apply``
    (tests/test_pipeline_parallel.py asserts forward and gradient parity).
    """
    from fitv2_tpu.models.fit import embed_pre_trunk, finalize_post_trunk
    from fitv2_tpu.models.modules import FiTBlock

    assert model.scan_blocks, 'pipeline needs the stacked nn.scan layout'
    assert model.gemm_precision == 'bf16', \
        'pipeline supports the bf16/fp32 parity path only'
    assert model.sequence_mesh is None, \
        'PP does not thread constrain_sequence; use SP or PP, not both'
    S = mesh.shape['stage']
    M = n_microbatches
    assert model.depth % S == 0, (model.depth, S)
    for ax in ('fsdp', 'sequence', 'tensor'):
        assert mesh.shape.get(ax, 1) == 1, \
            'PP composes with the data axis only (stage x data mesh)'

    block = FiTBlock(**model.block_kwargs())
    remat_policy = model._remat_policy() if model.use_checkpoint else None
    perm = [(i, (i + 1) % S) for i in range(S)]

    def run_stage(local_blocks, x, c, mask, fc, fs, ga):
        """One pipeline tick on one stage: scan the depth/S local blocks."""
        def body(h, p):
            return block.apply({'params': p}, h, c, mask, fc, fs, ga), None
        if model.use_checkpoint:
            body = jax.checkpoint(body, policy=remat_policy,
                                  prevent_cse=False)
        x, _ = jax.lax.scan(body, x, local_blocks)
        return x

    def fwd(params, x: Array, t: Array, y: Array, grid: Array,
            mask: Optional[Array] = None, size: Optional[Array] = None,
            rngs: Optional[dict] = None,
            force_drop_ids: Optional[Array] = None) -> Array:
        # ---- pre/post run replicated via the SAME graph FiT.__call__
        # uses (models/fit.py embed_pre_trunk/finalize_post_trunk); only
        # the applier differs: out-of-scope modules apply on their params
        # subtree, addressed by the names the shared code assigns. ----
        def sub(m, *args):
            return m.apply({'params': params[m.name]}, *args, rngs=rngs)

        h, c, fc, fs, ga = embed_pre_trunk(
            model, sub, x, t, y, grid, size, train, force_drop_ids)
        if model.adaln_type != 'lora':
            ga = None  # scalar 0.0 hole: re-inserted by unpack below

        # Broadcast args with static None holes: the shard_map arg list
        # carries only the present ones; `unpack` re-inserts Nones (and the
        # scalar 0.0 for a missing global_adaln) for the block call.
        present = (c, mask, fc, fs, ga)

        def unpack(args):
            it = iter(args)
            vals = tuple(next(it) if p is not None else p for p in present)
            return vals[:4] + ((vals[4] if ga is not None else 0.0),)

        bcast = tuple(a for a in present if a is not None)

        def gpipe(local_blocks, xg, *bc):
            """Local view: xg (B_loc, N, D); local_blocks leaves
            (depth/S, ...); bc microbatched below."""
            stage = jax.lax.axis_index('stage')
            b_loc = xg.shape[0]
            assert b_loc % M == 0, (b_loc, M)
            mb = b_loc // M

            def split_mb(a):
                return a.reshape((M, mb) + a.shape[1:])

            x_mb = split_mb(xg)
            bc_mb = tuple(split_mb(a) for a in bc)
            state = jnp.zeros_like(x_mb[0])
            out_acc = jnp.zeros_like(x_mb)

            def tick(carry, tt):
                state, out_acc = carry
                # stage s works on microbatch tt - s this tick
                m_cur = jnp.clip(tt - stage, 0, M - 1)
                inp = jnp.where(
                    stage == 0,
                    jax.lax.dynamic_index_in_dim(
                        x_mb, jnp.clip(tt, 0, M - 1), 0, keepdims=False),
                    state)
                args = tuple(
                    jax.lax.dynamic_index_in_dim(a, m_cur, 0, keepdims=False)
                    for a in bc_mb)
                out = run_stage(local_blocks, inp, *unpack(args))
                m_out = tt - (S - 1)
                write = jnp.logical_and(stage == S - 1, m_out >= 0)
                idx = jnp.clip(m_out, 0, M - 1)
                cur = jax.lax.dynamic_index_in_dim(out_acc, idx, 0,
                                                   keepdims=False)
                out_acc = jax.lax.dynamic_update_index_in_dim(
                    out_acc, jnp.where(write, out, cur), idx, 0)
                state = jax.lax.ppermute(out, 'stage', perm)
                return (state, out_acc), None

            (state, out_acc), _ = jax.lax.scan(
                tick, (state, out_acc), jnp.arange(M + S - 1))
            # GPipe output gather: only the last stage holds real outputs
            out_acc = jax.lax.psum(
                jnp.where(stage == S - 1, out_acc,
                          jnp.zeros_like(out_acc)), 'stage')
            return out_acc.reshape((b_loc,) + out_acc.shape[2:])

        # nn.scan stacks one FiTBlock's params under blocks/block/* with a
        # leading depth axis (models/fit.py _ScanBlock)
        blocks = params['blocks']['block']
        in_specs = (jax.tree_util.tree_map(lambda _: P('stage'), blocks),
                    P('data')) + tuple(P('data') for _ in bcast)
        h = shard_map(gpipe, mesh=mesh, in_specs=in_specs,
                      out_specs=P('data'), check_vma=False)(
            blocks, h, *bcast)

        # ---- post ----
        return finalize_post_trunk(model, sub, h, c, mask)

    return fwd
