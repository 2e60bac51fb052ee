"""Voxel normalization ops (reference model/train_utils.py:115-166 and
utils/data_augmentation.py:134-210)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _kth_smallest(flat: Array, k: Array | int) -> Array:
    """k-th smallest (1-indexed, torch.kthvalue semantics) via sort."""
    return jnp.sort(flat)[k - 1]


def normalize_batch_voxel(voxel: Array) -> Array:
    """Per-sample 99th/1st percentile normalization of a (B,T,H,W,C) (or
    (B,T,C,H,W)) voxel batch; positive part divided by the 99%-ile,
    negative by the 1%-ile, both clamped to >= 1.
    Reference: model/train_utils.py:147-166 (torch.kthvalue based)."""
    assert voxel.ndim == 5
    b = voxel.shape[0]
    flat = voxel.reshape(b, -1)
    n = flat.shape[1]
    max_k = int(0.99 * n)
    min_k = int(0.01 * n)
    srt = jnp.sort(flat, axis=1)
    pos_max = srt[:, max_k - 1]
    neg_max = -srt[:, min_k - 1]
    pos_max = jnp.maximum(pos_max, 1.0).reshape(b, 1, 1, 1, 1)
    neg_max = jnp.maximum(neg_max, 1.0).reshape(b, 1, 1, 1, 1)
    return jnp.where(voxel > 0, voxel / pos_max, voxel / neg_max)


def normalize_nobias(x: Array) -> Array:
    """Symmetric robust normalization to [0,1] used for event
    visualizations (model/train_utils.py:128-135)."""
    flat = x.reshape(-1)
    n = int(flat.shape[0] * 0.99)
    pos_max = jnp.maximum(_kth_smallest(flat, n), 1e-3)
    neg_max = jnp.maximum(_kth_smallest(-flat, n), 1e-3)
    x = jnp.clip(x, -neg_max, pos_max)
    x = jnp.where(x > 0, x / pos_max, x / neg_max)
    return x / 2 + 0.5


def robust_norm(x: Array, low_perc: float = 0.0, top_perc: float = 95.0) -> Array:
    """RobustNorm, torch-exact (utils/data_augmentation.py:134-185):
    kthvalue nearest-rank percentiles, clamp, then
    (clamped - min(clamped)) / (max(clamped) + 1e-6) — the reference
    does NOT divide by the range. Device twin of
    data/augmentation.py:RobustNorm."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    lo = _kth_smallest(flat, 1 + round(0.01 * low_perc * (n - 1)))
    hi = _kth_smallest(flat, 1 + round(0.01 * top_perc * (n - 1)))
    normed = jnp.clip(x, lo, hi)
    out = (normed - normed.min()) / (normed.max() + 1e-6)
    # reference early-returns x untouched when both percentiles are 0
    return jnp.where((hi == 0) & (lo == 0), x, out)


def legacy_norm(x: Array) -> Array:
    """Zero-mean unit-std over nonzero entries
    (utils/data_augmentation.py:188-210)."""
    nonzero = (x != 0).astype(x.dtype)
    num = jnp.maximum(nonzero.sum(), 1.0)
    mean = x.sum() / num
    std = jnp.sqrt(jnp.maximum((x * x).sum() / num - mean * mean, 0.0))
    return jnp.where(nonzero > 0, (x - mean) / jnp.maximum(std, 1e-9), x)
