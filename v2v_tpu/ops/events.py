"""Event-stream kernels (reference utils/event_utils.py): scatter-add
event images with optional bilinear spatial splat, temporal-bilinear
voxel grids, polarity-split voxels, Zhu-style average-timestamp images,
flow-based event warping, and h5 binary search.

All device functions take padded event arrays plus a valid-count (the
static-shape contract, SURVEY.md §7 hard part 6) and build on masked
`.at[].add` scatters. A Pallas scatter kernel is the planned drop-in for
the hot paths (SURVEY.md §2.10 item 1).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _mask(e: int, n_events) -> Array:
    return jnp.arange(e) < n_events


@functools.partial(jax.jit, static_argnames=("sensor_size", "interpolation",
                                             "padding"))
def events_to_image(xs: Array, ys: Array, ws: Array, n_events: Array,
                    *, sensor_size: Tuple[int, int] = (180, 240),
                    interpolation: Optional[str] = None,
                    padding: bool = False) -> Array:
    """Scatter event weights into an image (events_to_image_torch,
    utils/event_utils.py:330-376). xs/ys float or int pixel coords;
    `interpolation='bilinear'` splats each event into its 4 neighbors
    (interpolate_to_image, utils/event_utils.py:176-184)."""
    h, w = sensor_size
    if padding:
        h, w = h + 1, w + 1
    valid = _mask(xs.shape[0], n_events)
    ws = jnp.where(valid, ws, 0.0)
    img = jnp.zeros((h * w,), jnp.float32)
    if interpolation == "bilinear":
        pxs = jnp.floor(xs)
        pys = jnp.floor(ys)
        dxs = (xs - pxs).astype(jnp.float32)
        dys = (ys - pys).astype(jnp.float32)
        px = pxs.astype(jnp.int32)
        py = pys.astype(jnp.int32)
        for ox, oy, wt in ((0, 0, (1 - dxs) * (1 - dys)),
                           (1, 0, dxs * (1 - dys)),
                           (0, 1, (1 - dxs) * dys),
                           (1, 1, dxs * dys)):
            xi = px + ox
            yi = py + oy
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.where(inb, yi * w + xi, h * w)
            img = img.at[idx].add(ws * wt * inb, mode="drop")
    else:
        xi = xs.astype(jnp.int32)
        yi = ys.astype(jnp.int32)
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.where(inb, yi * w + xi, h * w)
        img = img.at[idx].add(ws * inb, mode="drop")
    return img.reshape(h, w)


@functools.partial(jax.jit, static_argnames=("num_bins", "sensor_size",
                                             "temporal_bilinear"))
def events_to_voxel_bilinear(xs: Array, ys: Array, ts: Array, ps: Array,
                             n_events: Array, *, num_bins: int,
                             sensor_size: Tuple[int, int] = (180, 240),
                             temporal_bilinear: bool = True) -> Array:
    """Temporal-bilinear B-bin voxel grid (events_to_voxel_torch,
    utils/event_utils.py:466-507): t normalized to [0, B-1], each event
    contributes max(0, 1-|t-bi|)*p to bin bi."""
    h, w = sensor_size
    valid = _mask(xs.shape[0], n_events)
    ps = jnp.where(valid, ps.astype(jnp.float32), 0.0)
    t0 = ts[0]
    t_last = ts[jnp.maximum(n_events - 1, 0)]
    dt = t_last - t0
    bins = []
    if temporal_bilinear:
        t_norm = (ts - t0) / jnp.maximum(dt, 1e-30) * (num_bins - 1)
        for bi in range(num_bins):
            weights = ps * jnp.maximum(0.0, 1.0 - jnp.abs(t_norm - bi))
            bins.append(events_to_image(xs, ys, weights, n_events,
                                        sensor_size=sensor_size))
        return jnp.stack(bins)
    t_per_bin = (dt + 0.001) / num_bins
    bin_idx = jnp.floor((ts - t0) / t_per_bin).astype(jnp.int32)
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)
    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)
    idx = bin_idx * h * w + yi * w + xi
    vox = jnp.zeros((num_bins * h * w,), jnp.float32)
    vox = vox.at[jnp.where(valid, idx, num_bins * h * w)].add(
        ps, mode="drop")
    return vox.reshape(num_bins, h, w)


def events_to_neg_pos_voxel(xs, ys, ts, ps, n_events, *, num_bins,
                            sensor_size=(180, 240),
                            temporal_bilinear=True):
    """Polarity-split voxels (utils/event_utils.py:509-541)."""
    pos = jnp.where(ps > 0, 1.0, 0.0)
    neg = jnp.where(ps <= 0, 1.0, 0.0)
    vp = events_to_voxel_bilinear(xs, ys, ts, pos, n_events,
                                  num_bins=num_bins, sensor_size=sensor_size,
                                  temporal_bilinear=temporal_bilinear)
    vn = events_to_voxel_bilinear(xs, ys, ts, neg, n_events,
                                  num_bins=num_bins, sensor_size=sensor_size,
                                  temporal_bilinear=temporal_bilinear)
    return vp, vn


@functools.partial(jax.jit, static_argnames=("sensor_size",))
def events_to_timestamp_image(xs: Array, ys: Array, ts: Array, ps: Array,
                              n_events: Array, *,
                              sensor_size: Tuple[int, int] = (180, 240)
                              ) -> Tuple[Array, Array]:
    """Zhu'19 average-timestamp images per polarity
    (utils/event_utils.py:251-319): bilinear splat of normalized
    timestamps, positive and negative separately (padded by 1 like the
    reference's padding=True default)."""
    valid = _mask(xs.shape[0], n_events)
    t0 = ts[0]
    t_last = ts[jnp.maximum(n_events - 1, 0)]
    t_norm = (ts - t0) / (t_last + 1e-6)
    pos_mask = jnp.where((ps > 0) & valid, 1.0, 0.0)
    neg_mask = jnp.where((ps <= 0) & valid, 1.0, 0.0)
    img_pos = events_to_image(xs, ys, t_norm * pos_mask, n_events,
                              sensor_size=sensor_size,
                              interpolation="bilinear", padding=True)
    img_neg = events_to_image(xs, ys, t_norm * neg_mask, n_events,
                              sensor_size=sensor_size,
                              interpolation="bilinear", padding=True)
    return img_pos, img_neg


@jax.jit
def warp_events_by_flow(xs: Array, ys: Array, ts: Array, flow: Array,
                        t_ref: Array) -> Tuple[Array, Array]:
    """Advect events along a flow field to a reference time
    (warp_events_flow_torch, utils/event_utils.py:574-616): each event at
    (x, y, t) moves by flow(x, y) * (t - t_ref). flow is (H, W, 2).

    The flow is sampled BILINEARLY at the (sub-pixel) event position
    with zero padding out of range — the reference uses grid_sample
    with align_corners=True and (size-1)-normalized indices, i.e. exact
    pixel coordinates."""
    h, w, _ = flow.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    tx = (xs - x0)[:, None]
    ty = (ys - y0)[:, None]

    def tap(yy, xx):
        inb = ((xx >= 0) & (xx <= w - 1) & (yy >= 0) & (yy <= h - 1))
        xi = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        return jnp.where(inb[:, None], flow[yi, xi], 0.0)

    f = (tap(y0, x0) * (1 - tx) * (1 - ty)
         + tap(y0, x0 + 1) * tx * (1 - ty)
         + tap(y0 + 1, x0) * (1 - tx) * ty
         + tap(y0 + 1, x0 + 1) * tx * ty)
    dt = (ts - t_ref)[:, None]
    warped = f * dt
    return xs + warped[:, 0], ys + warped[:, 1]


@functools.partial(jax.jit, static_argnames=("num_bins", "height", "width"))
def events_to_voxel_sorted(t_us: Array, xs: Array, ys: Array, ps: Array,
                           n_events: Array, *, num_bins: int, height: int,
                           width: int) -> Array:
    """Discrete events->voxel via sort + sorted segment-sum (same math
    as ops.voxel.events_to_voxel discrete).

    Measured on TPU v5e at 2M events into 5x260x346: the plain XLA
    scatter does 55 Mev/s vs 34 Mev/s here — the sort costs more than
    the coalesced accumulation saves, so the scatter path stays the
    default; this variant is kept for workloads with many events per
    pixel (higher collision rates favor sorted accumulation)."""
    e = t_us.shape[0]
    valid = jnp.arange(e) < n_events
    pol = jnp.where(valid, ps.astype(jnp.int32) * 2 - 1, 0).astype(
        jnp.float32)
    t_us = t_us.astype(jnp.float32)
    t_last = t_us[jnp.maximum(n_events - 1, 0)]
    t_per_bin = (t_last + 0.001) / num_bins
    bin_idx = jnp.clip(jnp.floor(t_us / t_per_bin).astype(jnp.int32),
                       0, num_bins - 1)
    n_seg = num_bins * height * width
    flat = (bin_idx * (height * width)
            + ys.astype(jnp.int32) * width + xs.astype(jnp.int32))
    flat = jnp.where(valid, jnp.clip(flat, 0, n_seg - 1), n_seg)
    order = jnp.argsort(flat)
    vox = jax.ops.segment_sum(pol[order], flat[order],
                              num_segments=n_seg + 1,
                              indices_are_sorted=True)
    return vox[:n_seg].reshape(num_bins, height, width)


def binary_search_h5_dset(dset, x, side: str = "left") -> int:
    """Bisect a sorted (h5) dataset without loading it
    (utils/event_utils.py:10-35)."""
    lo, hi = 0, len(dset)
    while lo < hi:
        mid = (lo + hi) // 2
        v = dset[mid]
        if (v < x) if side == "left" else (v <= x):
            lo = mid + 1
        else:
            hi = mid
    return lo
