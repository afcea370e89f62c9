"""Communication-pattern checks over compiled (SPMD-partitioned) HLO text.

The reference guarantees its distributed semantics through DDP/FSDP hooks
(torch wraps every bucket all-reduce; /root/reference/train_fitv2.py:195-239,
sample_fitv2_ddp.py:51). The TPU rebuild's equivalent guarantee is that the
XLA partitioner inserted the *intended* collectives for each mesh strategy —
a sharding-rule regression compiles fine, produces correct numbers on the
virtual mesh, and only shows up as a pod bill. These helpers parse
``jit(...).lower(...).compile().as_text()`` and assert the per-strategy
signatures (used by tests/test_comm_patterns.py):

  DP    : gradient all-reduce only — no gathers, scatters or permutes.
  FSDP  : per-layer WEIGHT all-gathers inside the block scan + a gradient
          reduction; activations stay batch-sharded (bounded activation
          gathers), params/moments stored sharded.
  TP    : activation-shaped all-reduce (the Megatron row-parallel proj/fc2
          partial-sum) in the forward.
  SP    : bounded all-gathers around attention (k/v); the MLP chain stays
          token-sharded.
  PP    : collective-permute (the GPipe ppermute ring).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

COLLECTIVE_OPS = ('all-reduce', 'all-gather', 'reduce-scatter',
                  'collective-permute', 'all-to-all')

# opcode immediately followed by '(' = an instruction definition (operand
# references look like '%all-reduce.3' and never match; '-start' variants
# are folded into the base op)
_OP_RE = re.compile(
    r'(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)'
    r'(-start)?\(')
# a typed instruction definition: %name = TYPE[dims]{layout} opcode(
_SHAPE_RE = re.compile(
    r'(?:f32|bf16|f16|s32|u32|s8|u8)\[([0-9,]*)\]\{[0-9,]*\} '
    r'(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)'
    r'(?:-start)?\(')


def collective_counts(hlo_text: str) -> Dict[str, int]:
    """Count collective instruction definitions per op kind."""
    counts = {op: 0 for op in COLLECTIVE_OPS}
    for m in _OP_RE.finditer(hlo_text):
        counts[m.group(1)] += 1
    return counts


def collective_shapes(hlo_text: str, op: str) -> List[Tuple[int, ...]]:
    """Output dims of every `op` instruction (single-output ones; tuple-
    shaped -start ops are not parsed — fine for signature checks)."""
    out = []
    for m in _SHAPE_RE.finditer(hlo_text):
        if m.group(2) == op:
            dims = m.group(1)
            out.append(tuple(int(d) for d in dims.split(',')) if dims
                       else ())
    return out


def _fmt(counts: Dict[str, int]) -> str:
    return ', '.join(f'{k}={v}' for k, v in counts.items() if v)


def check_dp(hlo_text: str) -> None:
    """Pure data parallelism: gradient sync is the ONLY communication."""
    c = collective_counts(hlo_text)
    assert c['all-reduce'] >= 1, (
        f'DP train step must all-reduce gradients; found none ({_fmt(c)})')
    for op in ('all-gather', 'reduce-scatter', 'collective-permute'):
        assert c[op] == 0, (
            f'DP train step must not {op} (replicated params, sharded '
            f'batch); found {c[op]} — a param sharding rule leaked '
            f'({_fmt(c)})')


def check_fsdp(hlo_text: str, weight_dims: Sequence[Tuple[int, ...]],
               batch: int, n_ctx: int, max_act_gathers: int = 2) -> None:
    """ZeRO-3: per-layer weight all-gather, batch-sharded compute.

    weight_dims: the (non-depth) dims of the scanned block's big kernels
    (e.g. qkv (D, 3D), fc1/fc2) — at least one all-gather must reassemble
    one of them. batch/n_ctx identify full-batch activation gathers, which
    indicate the TP-style re-layout SPMD propagation picks when block
    activations are not pinned batch-sharded (constrain_sequence)."""
    c = collective_counts(hlo_text)
    assert c['all-gather'] >= 1, (
        f'FSDP must all-gather the sharded weights per layer; found no '
        f'all-gather at all ({_fmt(c)})')
    shapes = collective_shapes(hlo_text, 'all-gather')
    weight_set = {tuple(d) for d in weight_dims}
    weight_gathers = [s for s in shapes if s in weight_set
                      or (len(s) >= 3 and s[1:] in weight_set)]
    assert weight_gathers, (
        f'FSDP must reassemble block weights {sorted(weight_set)} with '
        f'all-gathers; gathered shapes were {sorted(set(shapes))} — '
        f'params are not sharded, or XLA chose an activation re-layout')
    act_gathers = [s for s in shapes
                   if len(s) == 3 and s[0] == batch and s[1] == n_ctx]
    assert len(act_gathers) <= max_act_gathers, (
        f'FSDP compiled {len(act_gathers)} full-batch activation '
        f'all-gathers {act_gathers} (bound {max_act_gathers}) — '
        f'activations are not staying batch-sharded (missing '
        f'constrain_sequence pin?)')
    n_reduce = c['all-reduce'] + c['reduce-scatter'] + c['all-to-all']
    assert n_reduce >= 1, (
        f'FSDP must reduce gradients across the shard group; found no '
        f'reduction collective ({_fmt(c)})')


def check_tp(hlo_text: str, d_model: int) -> None:
    """Megatron TP: the row-parallel proj/fc2 partial sums appear as
    activation-shaped (B, N, D) all-reduces in the forward."""
    shapes = collective_shapes(hlo_text, 'all-reduce')
    act = [s for s in shapes if len(s) == 3 and s[-1] == d_model]
    assert act, (
        f'TP must all-reduce the row-parallel (B, N, {d_model}) partial '
        f'sums; all-reduce shapes were {sorted(set(shapes))} — the '
        f'column/row param rules are not applied')


def check_sp(hlo_text: str, batch: int, n_ctx: int, d_model: int,
             max_act_gathers: int = 4) -> None:
    """Sequence parallelism: k/v (attention) gathers only; the MLP chain
    stays token-sharded — full (B, N, D)-sized gathers are bounded."""
    c = collective_counts(hlo_text)
    gathers = (c['all-gather'] + c['all-to-all'])
    assert gathers >= 1, (
        f'SP attention needs k/v all-gathers (or all-to-alls); found none '
        f'({_fmt(c)}) — the sequence constraint is not applied')
    shapes = collective_shapes(hlo_text, 'all-gather')
    full_act = [s for s in shapes if len(s) >= 3 and s[0] == batch
                and s[1] == n_ctx and s[-1] == d_model]
    assert len(full_act) <= max_act_gathers, (
        f'SP must not reassemble the full (B={batch}, N={n_ctx}, '
        f'D={d_model}) activations outside attention; found {len(full_act)}'
        f' such gathers')


def check_pp(hlo_text: str) -> None:
    """GPipe: the stage ring is a collective-permute."""
    c = collective_counts(hlo_text)
    assert c['collective-permute'] >= 1, (
        f'PP must move microbatch activations through the stage ring with '
        f'collective-permute; found none ({_fmt(c)})')
