"""ctypes bindings for the native C++ voxel builder
(v2v_tpu/native/voxel_builder.cpp — shipped in the wheel). Auto-builds
on first use when a compiler is available; falls back to the numpy
implementation otherwise.

`events_to_voxel_native` is semantics-identical to
`ops.voxel.events_to_voxel_np` (the h5 test-path voxelizer) — validated
in tests/test_native.py — at ~20x the np.add.at throughput.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

import numpy as np

from ..ops.voxel import events_to_voxel_np

# the C++ source ships inside the package (pyproject package-data), so
# pip-installed wheels build it too; the .so lands next to the source
# when that directory is writable, else in ~/.cache/v2v_tpu
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC_PATH = os.path.join(_NATIVE_DIR, "voxel_builder.cpp")
_CACHE_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "v2v_tpu")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _lib_path() -> str:
    for d in (_NATIVE_DIR, _CACHE_DIR):
        p = os.path.join(d, "libvoxel_builder.so")
        if os.path.exists(p):
            return p
    return os.path.join(
        _NATIVE_DIR if os.access(_NATIVE_DIR, os.W_OK) else _CACHE_DIR,
        "libvoxel_builder.so")


def build(out_path: Optional[str] = None, extra_flags: tuple = (),
          quiet: bool = True) -> str:
    """Compile the builder. The single source of truth for the g++
    command line (scripts/build_native.py calls this with
    -march=native)."""
    out_path = out_path or _lib_path()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    cmd = ["g++", "-O3", *extra_flags, "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC_PATH, "-o", out_path]
    if not quiet:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=quiet, timeout=300)
    return out_path


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib_path = _lib_path()
    if not os.path.exists(lib_path):
        try:
            build(lib_path)
        except Exception as e:
            warnings.warn(f"native voxel builder unavailable ({e}); "
                          "using numpy fallback")
            return None
    try:
        lib = ctypes.CDLL(lib_path)
    except OSError as e:
        warnings.warn(f"failed to load {lib_path}: {e}")
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    up = ctypes.POINTER(ctypes.c_uint8)
    for name in ("build_voxel_discrete", "build_voxel_bilinear"):
        fn = getattr(lib, name)
        fn.argtypes = [dp, ip, ip, up, ctypes.c_int64, ctypes.c_int,
                       ctypes.c_int, ctypes.c_int, dp]
        fn.restype = None
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def events_to_voxel_native(ts: np.ndarray, xs: np.ndarray, ys: np.ndarray,
                           ps: np.ndarray, *, num_bins: int, height: int,
                           width: int,
                           interpolate_bins: bool = False) -> np.ndarray:
    lib = _load()
    if lib is None:
        return events_to_voxel_np(ts, xs, ys, ps, num_bins=num_bins,
                                  height=height, width=width,
                                  interpolate_bins=interpolate_bins)
    n = len(ts)
    out = np.zeros((num_bins, height, width), np.float64)
    if n == 0:
        return out
    ts64 = np.ascontiguousarray(ts, np.float64)
    xs32 = np.ascontiguousarray(xs, np.int32)
    ys32 = np.ascontiguousarray(ys, np.int32)
    ps8 = np.ascontiguousarray(ps, np.uint8)
    # the C kernel writes out[y*w+x] unchecked; a malformed h5 with a
    # stray coordinate must fail loudly like the numpy np.add.at path
    # (IndexError), not corrupt the heap
    if n and (xs32.min() < 0 or xs32.max() >= width
              or ys32.min() < 0 or ys32.max() >= height):
        raise IndexError(
            f"event coordinates out of bounds for {height}x{width}: "
            f"x in [{xs32.min()}, {xs32.max()}], "
            f"y in [{ys32.min()}, {ys32.max()}]")
    fn = (lib.build_voxel_bilinear if interpolate_bins
          else lib.build_voxel_discrete)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    up = ctypes.POINTER(ctypes.c_uint8)
    fn(ts64.ctypes.data_as(dp), xs32.ctypes.data_as(ip),
       ys32.ctypes.data_as(ip), ps8.ctypes.data_as(up),
       ctypes.c_int64(n), num_bins, height, width,
       out.ctypes.data_as(dp))
    return out
