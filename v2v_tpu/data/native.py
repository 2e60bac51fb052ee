"""ctypes bindings for the native C++ voxel builder
(native/voxel_builder.cpp). Auto-builds on first use when a compiler is
available; falls back to the numpy implementation otherwise.

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

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_ROOT, "native", "libvoxel_builder.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_ROOT, "native", "voxel_builder.cpp")
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 src, "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=120)
        except Exception as e:
            warnings.warn(f"native voxel builder unavailable ({e}); "
                          "using numpy fallback")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        warnings.warn(f"failed to load {_LIB_PATH}: {e}")
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
