"""Distributed scalar statistics: moment accumulation + cross-host reduce.

TPU-native equivalent of the reference's lock-free stats collector
(/root/reference/torch_utils/training_stats.py:55-230): values are reduced to
(num, sum, sum-of-squares) moment triples; inside jitted/sharded code use
``moments()`` + ``jax.lax.psum``; on the host, ``report()`` accumulates and
``Collector`` turns triples into mean/std with cross-process all-reduce via
``multihost_utils.process_allgather``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def moments(x: Array) -> Array:
    """(num, sum, sum_sq) of all elements, as a (3,) fp32 vector (jit-safe)."""
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    return jnp.stack([jnp.asarray(x.size, jnp.float32),
                      jnp.sum(x), jnp.sum(x * x)])


def psum_moments(x: Array, axis_name: str) -> Array:
    """Moments all-reduced over a mesh axis (use inside shard_map/pmap)."""
    return jax.lax.psum(moments(x), axis_name)


_counters: Dict[str, np.ndarray] = {}


def report(name: str, value) -> None:
    """Accumulate host-side moments under ``name`` (reference report:55-109)."""
    m = np.asarray(moments(jnp.asarray(value)))
    _counters[name] = _counters.get(name, np.zeros(3, np.float32)) + m


def report0(name: str, value) -> None:
    """Report only on process 0 (reference report0:112)."""
    if jax.process_index() == 0:
        report(name, value)


class Collector:
    """Snapshot + statistics over reported counters (reference :112-230)."""

    def __init__(self, regex: str = '.*', keep_previous: bool = True):
        import re
        self._regex = re.compile(regex)
        self._keep = keep_previous
        self._moments: Dict[str, np.ndarray] = {}
        self.update()

    def names(self):
        return [n for n in _counters if self._regex.fullmatch(n)]

    def update(self, cross_process: bool = False) -> None:
        """Pull current counters (optionally summed across hosts) and reset."""
        for name in self.names():
            m = _counters.pop(name, np.zeros(3, np.float32))
            if cross_process and jax.process_count() > 1:
                from jax.experimental import multihost_utils
                m = np.asarray(
                    multihost_utils.process_allgather(jnp.asarray(m))
                ).sum(axis=0)
            if self._keep and name in self._moments:
                m = m + 0  # new snapshot replaces when num > 0
            if m[0] > 0 or name not in self._moments:
                self._moments[name] = m

    def num(self, name: str) -> float:
        return float(self._moments.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float('nan')
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0 or not np.isfinite(m[1]):
            return 0.0
        if m[0] == 1:
            return 0.0
        mean = m[1] / m[0]
        raw_var = m[2] / m[0]
        return float(np.sqrt(max(raw_var - mean ** 2, 0)))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {name: {'num': self.num(name), 'mean': self.mean(name),
                       'std': self.std(name)}
                for name in self._moments}
