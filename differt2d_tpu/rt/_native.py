"""ctypes loader for the native C++ candidate enumerator.

Loads ``libenumerate.so`` (built from ``native/enumerate.cc`` via
``native/Makefile``) if present next to this file. All functions degrade
gracefully: callers receive ``None`` when the native backend is unavailable
and fall back to the NumPy decoder in :mod:`differt2d_tpu.rt.graph`, which
produces bit-identical output.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_LOAD_ATTEMPTED = False

# Below this row count the Python/NumPy decoder wins on call overhead.
_NATIVE_THRESHOLD = 4096


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_ATTEMPTED
    if _LOAD_ATTEMPTED:
        return _LIB
    _LOAD_ATTEMPTED = True
    path = os.path.join(os.path.dirname(__file__), "libenumerate.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.enumerate_paths.restype = ctypes.c_int64
        lib.enumerate_paths.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.num_candidates.restype = ctypes.c_int64
        lib.num_candidates.argtypes = [ctypes.c_int64, ctypes.c_int64]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    """Whether the native backend is loadable."""
    return _load() is not None


def enumerate_paths(
    allowed: np.ndarray, order: int, total: int
) -> Optional[np.ndarray]:
    """Native enumeration; ``None`` if unavailable or not worthwhile.

    :param allowed: Sorted ``int32[m]`` node indices.
    :param order: Sequence length (``>= 1``).
    :param total: Expected row count ``m * (m - 1)**(order - 1)``.
    """
    if total < _NATIVE_THRESHOLD:
        return None
    lib = _load()
    if lib is None:
        return None
    allowed = np.ascontiguousarray(allowed, dtype=np.int32)
    out = np.empty((total, order), dtype=np.int32)
    written = lib.enumerate_paths(
        allowed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        allowed.shape[0],
        order,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if written != total:
        return None
    return out
