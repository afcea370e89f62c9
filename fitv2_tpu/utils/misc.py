"""Misc utilities: shape asserts, profiling hooks, consistency checks.

Parity layer for the reference's vendored torch_utils/misc.py +
dnnlib/util.py surface (SURVEY.md §2.8): EasyDict, assert_shape,
profiled_function (-> jax.profiler traces), module summary, cross-device
consistency check (the DDP-consistency equivalent), NaN guards.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class EasyDict(dict):
    """Attribute-access dict (reference dnnlib/util.py EasyDict)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


def assert_shape(tensor, ref_shape: Sequence[Optional[int]]) -> None:
    """Shape assertion with None wildcards (torch_utils/misc.py:81-97)."""
    if tensor.ndim != len(ref_shape):
        raise AssertionError(
            f'Wrong number of dimensions: got {tensor.ndim}, '
            f'expected {len(ref_shape)}')
    for idx, (size, ref) in enumerate(zip(tensor.shape, ref_shape)):
        if ref is not None and size != ref:
            raise AssertionError(
                f'Wrong size for dimension {idx}: got {size}, expected {ref}')


def profiled_function(fn):
    """Annotate a function in jax.profiler traces
    (torch_utils/misc.py:99-108 record_function equivalent)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__name__):
            return fn(*args, **kwargs)
    return wrapper


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto
    (the rebuild's tracing subsystem; reference had none, SURVEY.md §5)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_to_num(x, nan: float = 0.0, posinf: Optional[float] = None,
               neginf: Optional[float] = None):
    """NaN guard (torch_utils/misc.py:48 parity)."""
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def check_cross_process_consistency(x, name: str = 'tensor') -> bool:
    """All hosts must hold identical values (misc.check_ddp_consistency
    equivalent for replicated state). Returns True when consistent."""
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils
    gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray(x)))
    ok = bool(np.all(gathered == gathered[0]))
    if not ok:
        print(f'[consistency] {name} differs across processes')
    return ok


def count_params(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))


def print_module_summary(params, max_rows: int = 40) -> str:
    """Parameter table (torch_utils/misc.py:196+ print_module_summary)."""
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = '/'.join(str(getattr(k, 'key', k)) for k in path)
        rows.append((name, tuple(leaf.shape), int(np.prod(leaf.shape))))
    rows.sort(key=lambda r: -r[2])
    total = sum(r[2] for r in rows)
    lines = [f'{"name":<64} {"shape":<24} {"params":>12}']
    for name, shape, n in rows[:max_rows]:
        lines.append(f'{name[:64]:<64} {str(shape):<24} {n:>12,}')
    if len(rows) > max_rows:
        lines.append(f'... ({len(rows) - max_rows} more)')
    lines.append(f'{"TOTAL":<64} {"":<24} {total:>12,}')
    out = '\n'.join(lines)
    print(out)
    return out


def flop_count_forward(hidden: int, depth: int, n_tokens: int,
                       mlp_hidden: Optional[int] = None,
                       heads: Optional[int] = None) -> float:
    """Analytic FLOPs of one FiT forward per sample (the fvcore
    measurement's role, reference sample_fitv2_ddp.py:151-213)."""
    d = hidden
    m = mlp_hidden if mlp_hidden is not None else (4 * d * 2) // 3
    n = n_tokens
    per_block = (
        2 * n * d * 3 * d          # qkv
        + 2 * n * n * d * 2        # attention scores + values
        + 2 * n * d * d            # out proj
        + 2 * n * d * m * 3        # SwiGLU three mats
    )
    return depth * per_block
