"""Bilinear image warping by optical flow (the torch `grid_sample`
equivalent used by the temporal-consistency and flow-warp losses,
reference utils/loss.py:6-159).

NHWC layout. `align_corners=True` semantics of the reference: flow is in
pixels; a sample at integer coords hits the pixel exactly; out-of-range
samples use zero padding (each OOB corner contributes 0).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def bilinear_sample(img: Array, gx: Array, gy: Array) -> Array:
    """Sample img (B,H,W,C) at pixel coords gx, gy (B,H,W) with bilinear
    interpolation and zero padding.

    Implemented as take_along_axis over a flattened plane (one gather per
    corner) — lowers markedly better on TPU than multi-dim advanced
    indexing."""
    b, h, w, c = img.shape
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = (gx - x0)[..., None]
    ty = (gy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(b, h * w, c)

    def gather(yi, xi):
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        idx = (jnp.clip(yi, 0, h - 1) * w
               + jnp.clip(xi, 0, w - 1)).reshape(b, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        return vals.reshape(yi.shape + (c,)) * inb[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def warp_by_flow(img: Array, flow: Array) -> Array:
    """Warp img (B,H,W,C) by displacement flow (B,H,W,2) [x, y] in pixels:
    out(i,j) = img(j + fx, i + fy), bilinear.
    Equivalent of the reference's meshgrid + grid_sample
    (utils/loss.py:22-47) without the [-1,1] normalization round-trip."""
    bsz, h, w, _ = img.shape
    xx = jnp.arange(w, dtype=img.dtype)[None, None, :]
    yy = jnp.arange(h, dtype=img.dtype)[None, :, None]
    gx = xx + flow[..., 0]
    gy = yy + flow[..., 1]
    return bilinear_sample(img, gx, gy)


def warp_by_flow_mxu(img: Array, flow: Array) -> Array:
    """warp_by_flow recast as two batched matmuls (no gathers).

    Bilinear sampling is separable: with tent weights
    wx[b,i,j,t] = max(0, 1 - |j + fx[b,i,j] - t|) (and wy likewise),

        out[b,i,j,c] = sum_{s,t} img[b,s,t,c] * wy[b,i,j,s] * wx[b,i,j,t]

    which matches grid_sample zero padding exactly (out-of-range corners
    collect zero weight). Gathers serialize on TPU; this runs on the MXU
    (the (H*W, W) @ (W, H) contraction is a perfect MXU shape at
    production sizes) and its gradient is matmuls rather than scatters.
    Redundant FLOPs (W-wide tent rows have only 2 nonzeros) are the
    trade; profitable for H, W up to a few hundred. Memory: the
    (B,H,W,H,C) intermediate — chunk the batch axis for large B."""
    bsz, h, w, c = img.shape
    dt = img.dtype
    gx = jnp.arange(w, dtype=dt)[None, None, :] + flow[..., 0]   # (B,H,W)
    gy = jnp.arange(h, dtype=dt)[None, :, None] + flow[..., 1]
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
        gx[..., None] - jnp.arange(w, dtype=dt)))                # (B,H,W,W)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
        gy[..., None] - jnp.arange(h, dtype=dt)))                # (B,H,W,H)
    u = jnp.einsum("bstc,bijt->bijsc", img, wx)                  # (B,H,W,H,C)
    return jnp.einsum("bijsc,bijs->bijc", u, wy)
