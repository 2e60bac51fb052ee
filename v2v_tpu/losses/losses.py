"""Training losses (reference model/loss.py + utils/loss.py), as pure
functions over NHWC tensors.

All per-batch losses return (B,) when reduce_batch=False, matching the
per-source bookkeeping contract of calc_loss
(model/train_utils.py:380-458).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.warp import warp_by_flow_mxu

Array = jax.Array


def _reduce(x: Array, reduce_batch: bool) -> Array:
    if reduce_batch:
        return x.mean()
    b = x.shape[0]
    return x.reshape(b, -1).mean(axis=1)


def l1_loss(pred: Array, target: Array, weight: float = 1.0,
            reduce_batch: bool = True) -> Array:
    """Reference model/loss.py:135-147."""
    return weight * _reduce(jnp.abs(pred - target), reduce_batch)


def l2_loss(pred: Array, target: Array, weight: float = 1.0,
            reduce_batch: bool = True) -> Array:
    """Reference model/loss.py:121-133."""
    return weight * _reduce((pred - target) ** 2, reduce_batch)


def temporal_consistency_loss(
    image0: Array, image1: Array, processed0: Array, processed1: Array,
    flow01: Array, alpha: float = 50.0, reduce_batch: bool = True,
) -> Array:
    """Lai et al. ECCV'18 temporal loss (reference utils/loss.py:6-69).

    Warps the previous reconstruction to the current frame by `-flow` (the
    caller negates, model/loss.py:166-182), masks by a visibility map
    estimated from the ground-truth frames, and measures relative
    absolute error. `processed0` is clamped to [0, 255] to close the
    +inf prediction loss exploit (utils/loss.py:45-46).

    All images NHWC; flow01 (B,H,W,2) is the displacement from image1 to
    image0 in pixels.
    """
    processed0 = jnp.clip(processed0, 0.0, 255.0)
    # one MXU warp for both images: they share the flow, so the tent
    # weight matrices (the dominant cost) are built and applied once
    c0 = image0.shape[-1]
    warped = warp_by_flow_mxu(
        jnp.concatenate([image0, processed0], axis=-1), flow01)
    image0_warped = warped[..., :c0]
    processed0_warped = warped[..., c0:]
    visibility = jnp.exp(-alpha * (image1 - image0_warped) ** 2)
    div = jnp.abs(processed1) + jnp.abs(processed0_warped) + 1e-5
    tc_map = visibility * jnp.abs(processed1 - processed0_warped) / div
    return _reduce(tc_map, reduce_batch)


def _align_corners_false_flow(flow: Array, h: int, w: int) -> Array:
    """Fold torch grid_sample(align_corners=False) semantics into a flow
    field for our align_corners=True warp.

    The reference's warping_flow / voxel_warping losses build grids with
    (size-1)-normalization but call F.grid_sample WITHOUT
    align_corners=True (utils/loss.py:105,146 — unlike the TC loss at
    :42,47), so the effective sample point for intended coordinate c is
    c*S/(S-1) - 0.5 per axis, not c. Reproduced exactly here."""
    fx, fy = flow[..., 0], flow[..., 1]
    jj = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    ii = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    fx = jj / (w - 1) - 0.5 + fx * (w / (w - 1))
    fy = ii / (h - 1) - 0.5 + fy * (h / (h - 1))
    return jnp.stack([fx, fy], axis=-1)


def warping_flow_loss(image0: Array, image1: Array, flow01: Array) -> Array:
    """Photometric warp error for self-supervised flow
    (reference utils/loss.py:72-111; align_corners=False there)."""
    b, h, w, _ = image0.shape
    image0_warped = warp_by_flow_mxu(
        image0, _align_corners_false_flow(flow01, h, w))
    return jnp.abs(image1 - image0_warped).mean()


def voxel_warping_flow_loss(voxel: Array, displacement: Array,
                            reverse_time: bool = False) -> Array:
    """Contrast-maximization: warp each temporal bin of the voxel along
    the flow and minimize negative variance of the stacked image; summed
    forward + reverse passes (reference utils/loss.py:114-159).

    voxel: (B,H,W,C bins); displacement: (B,H,W,2).

    The reference's channel swap (displacement_x from channel 1,
    utils/loss.py:131-132), its un-transposed square-only meshgrid, and
    its [y, x] grid stacking CANCEL: the net behavior is the standard
    x=ch0 / y=ch1 warp (with align_corners=False sampling), which is
    what runs here — pinned against the torch original in
    tests/test_losses_ops.py."""
    def one_direction(disp, reverse):
        b, h, w, c = voxel.shape
        increment = 1.0 / (c - 1.0)
        warped_sum = jnp.zeros(voxel.shape[:-1] + (1,), voxel.dtype)
        for i in range(c):
            ratio = (1.0 - i * increment) if reverse else i * increment
            flow = _align_corners_false_flow(disp * ratio, h, w)
            warped = warp_by_flow_mxu(voxel[..., i:i + 1], flow)
            warped_sum = warped_sum + warped
        # torch Tensor.var() is UNBIASED by default (utils/loss.py:149)
        return -jnp.var(warped_sum, ddof=1)

    loss = one_direction(displacement, False)
    loss = loss + one_direction(-displacement, True)
    return loss


def mse_metric(pred: Array, target: Array) -> Array:
    return ((pred - target) ** 2).mean()


def combined_perceptual_loss(lpips, pred_img: Array, pred_flow: Array,
                             target_img: Array, target_flow: Array,
                             weight: float = 1.0) -> Array:
    """Image+flow channels concatenated into one 3-channel LPIPS input
    (reference model/loss.py:8-24). Inputs NHWC (img 1ch, flow 2ch)."""
    pred = jnp.concatenate([pred_img, pred_flow], axis=-1)
    target = jnp.concatenate([target_img, target_flow], axis=-1)
    return weight * lpips(pred, target, normalize=False).mean()


def flow_perceptual_loss(lpips, pred: Array, target: Array,
                         weight: float = 1.0) -> Array:
    """LPIPS per flow component, averaged (reference model/loss.py:64-79)."""
    dx = lpips(pred[..., 0:1], target[..., 0:1], normalize=False)
    dy = lpips(pred[..., 1:2], target[..., 1:2], normalize=False)
    return weight * (dx + dy).mean() / 2

