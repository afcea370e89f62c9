"""Persistent XLA compile-cache setup, keyed per machine.

The cache is effective through the axon remote-compile tunnel (reruns skip
2-10 min recompiles), but XLA:CPU entries embed AOT host code specialized to
the compiling machine's CPU features. A cache dir shared between machines
(e.g. the TPU-tunnel host and the driver's CPU host) makes XLA load foreign
AOT results — "machine feature +prefer-no-gather is not supported … could
lead to SIGILL". Keying the directory by a hostname + /proc/cpuinfo-flags
fingerprint gives each machine its own namespace while keeping the hit rate
for same-machine reruns.

Call enable_compile_cache() before the first jax computation (safe to call
before backend init; jax.config only records the path).
"""

from __future__ import annotations

import contextlib
import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Stable per-machine key: hostname + CPU flag set."""
    parts = [platform.node() or 'unknown', platform.machine() or '']
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith('flags'):
                    parts.append(line.split(':', 1)[1].strip())
                    break
    except OSError:
        pass
    return hashlib.sha1('|'.join(parts).encode()).hexdigest()[:10]


def enable_compile_cache(repo_root: str | None = None) -> str | None:
    """Point jax at .jax_cache/<machine fingerprint>/ under repo_root."""
    import jax
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    d = os.path.join(repo_root, '.jax_cache', machine_fingerprint())
    try:
        jax.config.update('jax_compilation_cache_dir', d)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        return None
    return d


@contextlib.contextmanager
def persistent_cache_disabled():
    """Temporarily turn the persistent cache off (for CPU-side compiles).

    XLA:CPU AOT cache entries record compile-side tuning "features"
    (+prefer-no-gather/+prefer-no-scatter) that host feature detection
    never reports, so every CPU cache LOAD logs a spurious SIGILL-hazard
    error — even same-machine. CPU compiles are local and fast; the cache
    only pays off through the TPU tunnel, so skip persistence for them
    (same policy as __graft_entry__.dryrun_multichip, which disables it
    process-wide for all-CPU runs).

    Setting jax_compilation_cache_dir=None alone is NOT enough: jax
    memoizes the cache object at the first cached compile
    (compilation_cache._cache / _cache_used), so once any jit has run with
    the cache enabled, later dir changes are ignored and CPU AOT entries
    keep loading (the round-3 BENCH tail pollution). reset_cache() drops
    the memoized state so the dir change takes effect both ways.

    reset_cache is a PRIVATE jax API — if a JAX upgrade moves/renames it,
    fall back to the config-only toggle with a warning instead of turning
    every use of this context manager into an ImportError."""
    import jax
    try:
        from jax._src.compilation_cache import reset_cache as _reset_cache
    except (ImportError, AttributeError):
        import warnings
        warnings.warn(
            'jax._src.compilation_cache.reset_cache unavailable in this '
            'JAX version; persistent_cache_disabled falls back to the '
            'config-only toggle (already-memoized cache state may persist)')
        _reset_cache = lambda: None  # noqa: E731
    old = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update('jax_compilation_cache_dir', None)
        _reset_cache()
        yield
    finally:
        jax.config.update('jax_compilation_cache_dir', old)
        _reset_cache()  # re-initialize with the restored dir on next use
