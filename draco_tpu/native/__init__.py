"""Native host kernels (C + OpenMP), loaded via ctypes.

This package is the draco_tpu analogue of the reference's compiled
extension (``draco/util/_fast_tools.pyx``, built by reference
setup.py:100-115 with ``-O3 -fno-math-errno -fopenmp``).  Most of the
reference's native entry points became batched device kernels here; what
remains host-bound are the sliding-window order statistics, implemented in
``fast_host.c``.

The shared library is compiled on first import with the system C compiler
and cached next to the source.  If no compiler is available the callers
fall back to the vectorised numpy implementations transparently; set
``DRACO_TPU_NO_NATIVE=1`` to force the fallback.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sysconfig

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fast_host.c")
_SO = os.path.join(_HERE, f"_fast_host{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")

_lib = None


def _compile() -> bool:
    cc = os.environ.get("CC", "cc")
    cmd = [
        cc, "-O3", "-fno-math-errno", "-fno-trapping-math", "-fPIC",
        "-shared", "-fopenmp", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as exc:
        # Retry without OpenMP (e.g. missing libgomp)
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except (OSError, subprocess.SubprocessError):
            logger.info(f"Native kernel build unavailable: {exc}")
            return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("DRACO_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    c_dp = ctypes.POINTER(ctypes.c_double)
    lib.weighted_median_f64.argtypes = [
        c_dp, c_dp, c_dp, ctypes.c_long, ctypes.c_long,
    ]
    lib.weighted_median_f64.restype = None
    lib.moving_weighted_median_f64.argtypes = [
        c_dp, c_dp, c_dp,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
    ]
    lib.moving_weighted_median_f64.restype = None

    _lib = lib
    return lib


def available() -> bool:
    """True if the native library is loadable."""
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def weighted_median(x, w):
    """Native batched weighted median along the last axis, or None."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    w = np.ascontiguousarray(np.broadcast_to(w, x.shape), dtype=np.float64)
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    w2 = w.reshape(-1, shape[-1])
    out = np.empty(x2.shape[0], dtype=np.float64)
    lib.weighted_median_f64(
        _ptr(x2), _ptr(w2), _ptr(out), x2.shape[0], x2.shape[1]
    )
    return out.reshape(shape[:-1])


def moving_weighted_median(x, w, size):
    """Native 2D moving-window weighted median, or None."""
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    w = np.ascontiguousarray(np.broadcast_to(w, x.shape), dtype=np.float64)
    if np.isscalar(size):
        size = (int(size), int(size))
    s0, s1 = int(size[0]), int(size[1])

    lead = x.shape[:-2]
    n0, n1 = x.shape[-2:]
    x3 = x.reshape(-1, n0, n1)
    w3 = w.reshape(-1, n0, n1)
    out = np.empty_like(x3)
    for b in range(x3.shape[0]):
        lib.moving_weighted_median_f64(
            _ptr(x3[b]), _ptr(w3[b]), _ptr(out[b]), n0, n1, s0, s1
        )
    return out.reshape(*lead, n0, n1)
