"""Native (C++) host-side planners, loaded via ctypes.

The shared library is compiled on first use with the system g++ into the
package directory (falling back to a per-user cache dir if the package is
not writable).  Callers must handle `load()` returning None and fall back
to the numpy implementations — the native path is a performance
optimisation, not a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kdplan.cpp")


def _so_path() -> str:
    d = os.path.dirname(os.path.abspath(__file__))
    if os.access(d, os.W_OK):
        return os.path.join(d, "_kdplan.so")
    cache = os.path.join(tempfile.gettempdir(),
                         f"gandalf_tpu_native_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "_kdplan.so")


def _build(so: str) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", so + ".tmp", _SRC]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        # retry without -march=native (unsupported on some hosts)
        cmd.remove("-march=native")
        try:
            res = subprocess.run(cmd, capture_output=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return False
        if res.returncode != 0:
            print("gandalf_tpu.native: build failed:\n"
                  + res.stderr.decode(errors="replace"), file=sys.stderr)
            return False
    os.replace(so + ".tmp", so)
    return True


def load():
    """Returns the ctypes library, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GANDALF_NO_NATIVE") == "1":
        return None
    so = _so_path()
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(_SRC)):
        if not _build(so):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.kd_plan_buckets.restype = ctypes.c_int64
    lib.kd_plan_buckets.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_int64,
    ]
    lib.tree_walk_stats.restype = ctypes.c_int64
    lib.tree_walk_stats.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.tree_walk_stats_levels.restype = ctypes.c_int64
    lib.tree_walk_stats_levels.argtypes = \
        lib.tree_walk_stats.argtypes + [ctypes.c_void_p]
    _walk_argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.tree_walk_lists.restype = ctypes.c_int64
    lib.tree_walk_lists.argtypes = _walk_argtypes
    # dual-tree (falcON-style) traversal: same contract, kept for
    # deep-clustered cases + the exact-coverage cross-validation test
    lib.tree_walk_lists_dual.restype = ctypes.c_int64
    lib.tree_walk_lists_dual.argtypes = _walk_argtypes
    lib.grid_cell_ids.restype = None
    lib.grid_cell_ids.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.xorshift_fill.restype = ctypes.c_uint64
    lib.xorshift_fill.argtypes = [
        ctypes.c_uint64, ctypes.c_int64, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB
