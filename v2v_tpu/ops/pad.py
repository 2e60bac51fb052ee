"""Shape padding helpers for variable-resolution test sequences.

Static-shape analogs of the reference's pad-to-multiple logic:
  * pad_to_multiple  — corner padding, train/test forward path
    (model/train_utils.py:322-326 pads H,W up to x16 at the top-left).
  * CropParameters   — centered padding to 2^num_encoders, used by color
    inference and NerNet (model/model_util.py:56-103).
All shape math is python-static so jit sees fixed shapes per resolution
bucket.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def pad_to_multiple(x: Array, multiple: int = 16) -> Tuple[Array, Tuple[int, int]]:
    """Zero-pad NHWC (or ...HWC) at the bottom/right so H, W are multiples
    of `multiple`. Returns padded array and the original (H, W)."""
    h, w = x.shape[-3], x.shape[-2]
    ph = math.ceil(h / multiple) * multiple - h
    pw = math.ceil(w / multiple) * multiple - w
    pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(x, pad), (h, w)


def crop_from_multiple(x: Array, hw: Tuple[int, int]) -> Array:
    h, w = hw
    return x[..., :h, :w, :]


def optimal_crop_size(max_size: int, max_subsample_factor: int,
                      safety_margin: int = 0) -> int:
    """Smallest multiple of 2^factor >= max_size
    (model/model_util.py:46-53)."""
    f = 2 ** max_subsample_factor
    return f * math.ceil(max_size / f) + safety_margin * f


class CropSize:
    """Centered pad/crop to multiples of an arbitrary patch size
    (model/model_util.py:162-192; used by EITR's pad-to-8)."""

    def __init__(self, width: int, height: int, patch_size: dict,
                 safety_margin: int = 0):
        fh, fw = patch_size["h"], patch_size["w"]
        self.height, self.width = height, width
        self.height_crop_size = fh * math.ceil(height / fh) + safety_margin * fh
        self.width_crop_size = fw * math.ceil(width / fw) + safety_margin * fw
        self.padding_top = math.ceil(0.5 * (self.height_crop_size - height))
        self.padding_bottom = math.floor(0.5 * (self.height_crop_size - height))
        self.padding_left = math.ceil(0.5 * (self.width_crop_size - width))
        self.padding_right = math.floor(0.5 * (self.width_crop_size - width))
        cx = math.floor(self.width_crop_size / 2)
        cy = math.floor(self.height_crop_size / 2)
        self.ix0 = cx - math.floor(width / 2)
        self.ix1 = cx + math.ceil(width / 2)
        self.iy0 = cy - math.floor(height / 2)
        self.iy1 = cy + math.ceil(height / 2)

    def pad(self, x: Array) -> Array:
        pad = ([(0, 0)] * (x.ndim - 3)
               + [(self.padding_top, self.padding_bottom),
                  (self.padding_left, self.padding_right), (0, 0)])
        return jnp.pad(x, pad)

    def crop(self, x: Array) -> Array:
        return x[..., self.iy0:self.iy1, self.ix0:self.ix1, :]


class CropSize3D:
    """3D (T, H, W) variant (model/model_util.py:121-159)."""

    def __init__(self, width: int, height: int, time: int, patch_size: dict,
                 safety_margin: int = 0):
        ft, fh, fw = patch_size["t"], patch_size["h"], patch_size["w"]
        self.time_crop_size = ft * math.ceil(time / ft) + safety_margin * ft
        self.height_crop_size = fh * math.ceil(height / fh) + safety_margin * fh
        self.width_crop_size = fw * math.ceil(width / fw) + safety_margin * fw
        self.padding_front = math.ceil(0.5 * (self.time_crop_size - time))
        self.padding_back = math.floor(0.5 * (self.time_crop_size - time))
        self.padding_top = math.ceil(0.5 * (self.height_crop_size - height))
        self.padding_bottom = math.floor(0.5 * (self.height_crop_size - height))
        self.padding_left = math.ceil(0.5 * (self.width_crop_size - width))
        self.padding_right = math.floor(0.5 * (self.width_crop_size - width))
        ct = math.floor(self.time_crop_size / 2)
        cy = math.floor(self.height_crop_size / 2)
        cx = math.floor(self.width_crop_size / 2)
        self.it0 = ct - math.floor(time / 2)
        self.it1 = ct + math.ceil(time / 2)
        self.iy0 = cy - math.floor(height / 2)
        self.iy1 = cy + math.ceil(height / 2)
        self.ix0 = cx - math.floor(width / 2)
        self.ix1 = cx + math.ceil(width / 2)

    def pad(self, x: Array) -> Array:
        """x: (..., T, H, W, C)."""
        pad = ([(0, 0)] * (x.ndim - 4)
               + [(self.padding_front, self.padding_back),
                  (self.padding_top, self.padding_bottom),
                  (self.padding_left, self.padding_right), (0, 0)])
        return jnp.pad(x, pad)

    def crop(self, x: Array) -> Array:
        return x[..., self.it0:self.it1, self.iy0:self.iy1,
                 self.ix0:self.ix1, :]


class CropParameters:
    """Centered zero-pad to the optimal size and crop back
    (model/model_util.py:56-103)."""

    def __init__(self, width: int, height: int, num_encoders: int,
                 safety_margin: int = 0):
        self.height, self.width = height, width
        self.height_crop_size = optimal_crop_size(height, num_encoders, safety_margin)
        self.width_crop_size = optimal_crop_size(width, num_encoders, safety_margin)
        self.padding_top = math.ceil(0.5 * (self.height_crop_size - height))
        self.padding_bottom = math.floor(0.5 * (self.height_crop_size - height))
        self.padding_left = math.ceil(0.5 * (self.width_crop_size - width))
        self.padding_right = math.floor(0.5 * (self.width_crop_size - width))
        cx = math.floor(self.width_crop_size / 2)
        cy = math.floor(self.height_crop_size / 2)
        self.ix0 = cx - math.floor(width / 2)
        self.ix1 = cx + math.ceil(width / 2)
        self.iy0 = cy - math.floor(height / 2)
        self.iy1 = cy + math.ceil(height / 2)

    def pad(self, x: Array) -> Array:
        """x: ...HWC."""
        pad = ([(0, 0)] * (x.ndim - 3)
               + [(self.padding_top, self.padding_bottom),
                  (self.padding_left, self.padding_right), (0, 0)])
        return jnp.pad(x, pad)

    def crop(self, x: Array) -> Array:
        return x[..., self.iy0:self.iy1, self.ix0:self.ix1, :]
