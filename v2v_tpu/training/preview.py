"""Validation preview grids: (events | prediction | ground truth) video
strips for TensorBoard (reference model/train_utils.py:460-481)."""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..ops.normalize import normalize_nobias


def make_preview(batch: Dict[str, np.ndarray], pred: np.ndarray) -> np.ndarray:
    """batch['events'] (B,T,H,W,C), batch['frame'] (B,T,H,W,1|3),
    pred (B,T,H,W,1|3) in [0,1] -> (B,T,3,H,3W) uint8 video grid
    (tensorboardX add_video layout)."""
    events = np.asarray(batch["events"])
    frames = np.asarray(batch["frame"])
    pred = np.asarray(pred)
    t = pred.shape[1]
    frames = frames[:, -t:]
    if events.shape[1] > t:
        events = events[:, 1:]

    ev_vis = np.asarray(normalize_nobias(events.sum(axis=-1))) * 255
    ev_vis = np.repeat(ev_vis[..., None], 3, axis=-1)
    pred_vis = pred * 255
    if pred_vis.shape[-1] == 1:
        pred_vis = np.repeat(pred_vis, 3, axis=-1)
    pred_vis = pred_vis[..., ::-1]            # BGR -> RGB
    gt_vis = frames * 255
    if gt_vis.shape[-1] == 1:
        gt_vis = np.repeat(gt_vis, 3, axis=-1)
    gt_vis = gt_vis[..., ::-1]

    vis = np.concatenate([ev_vis, pred_vis, gt_vis], axis=3)  # along W
    vis = np.clip(vis, 0, 255).astype(np.uint8)
    return vis.transpose(0, 1, 4, 2, 3)       # (B,T,3,H,3W)


def make_flow_preview(batch: Dict[str, np.ndarray],
                      pred_flow: np.ndarray) -> np.ndarray:
    """(pred flow | gt flow | error | events | frame) grid for the flow
    task (reference model/train_flow_utils.py:432-467). pred_flow
    (B,T,H,W,2); returns (B,T,3,H,5W) uint8."""
    from .flow_interface import flow2rgb_np

    events = np.asarray(batch["events"])
    frames = np.asarray(batch["frame"])
    gt_flow = np.asarray(batch["flow"])
    b, t = pred_flow.shape[:2]
    frames = frames[:, -t:]
    gt_flow = gt_flow[:, -t:]
    if events.shape[1] > t:
        events = events[:, 1:]

    max_mag = max(float(np.linalg.norm(np.nan_to_num(gt_flow),
                                       axis=-1).max()), 0.1)
    pf = np.stack([[flow2rgb_np(pred_flow[bi, ti, ..., 0],
                                pred_flow[bi, ti, ..., 1], max_mag)
                    for ti in range(t)] for bi in range(b)])
    gf = np.stack([[flow2rgb_np(np.nan_to_num(gt_flow[bi, ti, ..., 0]),
                                np.nan_to_num(gt_flow[bi, ti, ..., 1]),
                                max_mag)
                    for ti in range(t)] for bi in range(b)])
    err = np.abs(pred_flow - np.nan_to_num(gt_flow)).mean(axis=-1,
                                                          keepdims=True)
    err_vis = np.clip(err / max_mag, 0, 1).repeat(3, axis=-1) * 255
    ev_vis = np.asarray(normalize_nobias(events.sum(axis=-1))) * 255
    ev_vis = np.repeat(ev_vis[..., None], 3, axis=-1)
    fr_vis = frames * 255
    if fr_vis.shape[-1] == 1:
        fr_vis = np.repeat(fr_vis, 3, axis=-1)
    vis = np.concatenate([pf, gf, err_vis, ev_vis, fr_vis], axis=3)
    vis = np.clip(vis, 0, 255).astype(np.uint8)
    return vis.transpose(0, 1, 4, 2, 3)
