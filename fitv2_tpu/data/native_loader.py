"""ctypes bridge to the C++ latent-shard loader (native/latent_loader.cc).

The native library does the per-sample hot path (safetensors parse, flip
pick, zero-pad) in a C++ thread pool — the TPU-native replacement for the
reference's torch DataLoader worker processes. Built on demand with g++
(no pybind11 dependency; plain C ABI via ctypes). Falls back cleanly: callers
check ``available()`` and use the pure-Python PrefetchLoader otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, 'native', 'latent_loader.cc')
_LIB_PATH = os.path.join(_REPO_ROOT, 'native', 'liblatent_loader.so')

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string or None."""
    try:
        subprocess.run(
            ['g++', '-O3', '-std=c++17', '-shared', '-fPIC', '-pthread',
             _SRC, '-o', _LIB_PATH],
            check=True, capture_output=True, text=True, timeout=180)
        return None
    except (subprocess.CalledProcessError, OSError,
            subprocess.TimeoutExpired) as e:
        return getattr(e, 'stderr', str(e)) or str(e)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            err = _build()
            if err:
                _build_error = err
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ll_load_batch.restype = ctypes.c_int
        lib.ll_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.ll_tensor_ndim.restype = ctypes.c_int
        lib.ll_tensor_ndim.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_batch(paths: Sequence[str], flips: Sequence[int], target_len: int,
               channels: int = 16, num_threads: int = 8
               ) -> Dict[str, np.ndarray]:
    """Assemble a padded batch natively. Raises on unreadable shards."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f'native loader unavailable: {_build_error}')
    n = len(paths)
    feature = np.empty((n, target_len, channels), np.float32)
    grid = np.empty((n, 2, target_len), np.int32)
    mask = np.empty((n, target_len), np.float32)
    label = np.empty((n,), np.int32)
    size = np.empty((n, 2), np.int32)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_flips = (ctypes.c_int * n)(*[int(f) for f in flips])
    ok = lib.ll_load_batch(
        c_paths, c_flips, n, target_len, channels, num_threads,
        feature.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        label.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        size.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if ok != n:
        raise RuntimeError(f'native loader: {n - ok}/{n} shards failed')
    return {'feature': feature, 'grid': grid, 'mask': mask, 'label': label,
            'size': size.reshape(n, 1, 2)}


def tensor_shape(path: str, name: str):
    lib = _load()
    if lib is None:
        return None
    out = (ctypes.c_int64 * 8)()
    nd = lib.ll_tensor_ndim(path.encode(), name.encode(), out)
    if nd < 0:
        return None
    return tuple(out[i] for i in range(nd))
