"""Flow task interface (reference model/train_flow_utils.py:200-467).

Same skeleton as ModelInterface with:
  * forward_type 'evflow' (per-step voxel -> flow) or 'eraft' (voxel
    pairs (t, t+1) -> flow, model-internal padding + warm-start carry);
  * flow L1 training loss;
  * dense/sparse EPE/1PE/3PE test metrics with validity & event masks.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import losses as L
from ..ops.pad import crop_from_multiple, pad_to_multiple
from .interface import ModelInterface, scan_recurrent

Array = jax.Array


class FlowModelInterface(ModelInterface):
    def __init__(self, configs: Dict[str, Any]):
        super().__init__(configs)
        self.forward_type = configs.get("forward_type", "evflow")
        assert self.forward_type in ("evflow", "eraft")

    def init(self, key: jax.Array, batch_size: int, height: int, width: int,
             num_bins: int = 5):
        if self.forward_type != "eraft":
            return super().init(key, batch_size, height, width, num_bins)
        # ERAFT consumes voxel pairs (it pads to x32 internally)
        height = -(-height // 16) * 16
        width = -(-width // 16) * 16
        state = self.model.init_state(batch_size, height, width)
        x = jnp.zeros((batch_size, height, width, num_bins))
        params = self.model.init(key, x, x, state)
        return params, state

    def prepare_flow(self, batch: Dict[str, Array],
                     test: bool = False) -> Dict[str, Array]:
        """Flow-task GT (reference train_flow_utils.py:305-326): stored
        GT is used when the source is 'gt', or at TEST time when the
        batch carries flow (MVSEC); otherwise a RAFT source predicts
        pseudo-GT from the (T+1) frames — flow[t] =
        teacher(frame[t], frame[t+1]), T flows — OVERWRITING any stored
        flow (the reference always recomputes at train/val). Unlike the
        reconstruction task this does NOT gate on the TC-loss weight:
        flow training always needs a target."""
        src = self.loss_cfg.optical_flow_source
        if src == "gt" or (test and "flow" in batch):
            if "flow" not in batch:
                raise KeyError(
                    "optical_flow_source=gt but batch has no 'flow'")
            return batch
        frames = batch["frame"]                     # (B, T+1, H, W, C)
        b, tp1, h, w, _ = frames.shape
        batch = dict(batch)
        if src == "zeros":
            batch["flow"] = jnp.zeros((b, tp1 - 1, h, w, 2), frames.dtype)
            return batch
        from .raft import raft_flow  # lazy; needs converted weights
        batch["flow"] = raft_flow(
            src, frames, 1,
            num_flow_updates=self.loss_cfg.raft_num_flow_updates)[:, 1:]
        return batch

    def forward_sequence(self, params, events: Array, state: Any,
                         train: bool = False, return_updates: bool = False,
                         **_) -> Tuple[Array, Any]:
        if self.forward_type == "eraft":
            ret = self._forward_eraft(params, events, state, train)
        else:
            ret = self._forward_evflow(params, events, state, train)
        return ret if return_updates else ret[:2]

    def _cast_compute(self, params, state, events, train,
                      cast_state=True):
        """bf16 compute cast (same recipe as the base forward_sequence:
        params['params'] + inputs + carry cast, batch_stats stay f32,
        outputs return to f32). The flow forwards ran silently in f32
        before this — found by the roofline dtype census (docs/PERF.md:
        eraft 95.7% / evflow 91.4% f32 FLOPs, half MXU rate).
        cast_state=False for ERAFT: its carry is the warm-start flow —
        a coordinate quantity kept f32 (ERAFT.step_with_fmaps returns
        it f32, so the scan carry dtype must match)."""
        if not (train and self.compute_dtype):
            return params, state, events
        dtype = jnp.dtype(self.compute_dtype)
        cast = (lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x)
        params = dict(params)
        params["params"] = jax.tree.map(cast, params["params"])
        if cast_state:
            state = jax.tree.map(cast, state)
        return params, state, events.astype(dtype)

    def _forward_evflow(self, params, events, state, train):
        events, hw = pad_to_multiple(events, 16)
        params, state, events = self._cast_compute(params, state, events,
                                                   train)

        # EVFlowNet is non-recurrent (state == ()): the per-step scan
        # is pure overhead — run the whole forward batched over B*T
        # (same math; bigger convs fill the MXU, docs/PERF.md floor
        # table). BN models keep the scan (live stats are per-step).
        if (train and self.scan_split and isinstance(state, tuple)
                and len(state) == 0 and "batch_stats" not in params):
            b, t = events.shape[:2]
            flat = events.reshape(b * t, *events.shape[2:])
            out, _ = self.model.apply(params, flat, (), train=train)
            flows = out["flow"].reshape(b, t, *out["flow"].shape[1:])
            flows = flows.astype(jnp.float32)
            return crop_from_multiple(flows, hw), state, {}

        def apply_fn(variables, carry, voxel, mutable):
            if mutable:
                (out, carry), mut = self.model.apply(
                    variables, voxel, carry, train=train,
                    mutable=["batch_stats"])
                return (out["flow"], carry), mut
            out, carry = self.model.apply(variables, voxel, carry,
                                          train=train)
            return out["flow"], carry

        final_state, flows, updates = scan_recurrent(
            apply_fn, params, state, jnp.swapaxes(events, 0, 1), train,
            self.remat_policy)
        flows = jnp.swapaxes(flows, 0, 1).astype(jnp.float32)
        return crop_from_multiple(flows, hw), final_state, updates

    def _forward_eraft(self, params, events, state, train):
        """ERAFT consumes voxel pairs: flow[t->t+1] from
        (events[t], events[t+1]); T_out = T_in - 1. The warm-start flow
        carry lives in `state` (reference model/eraft/eraft.py:141-146).
        When training, cnet BatchNorm runs with live batch statistics
        and its running stats thread through the scan (the reference
        trains BN live — train.py:72, no freeze_bn call).

        fnet features are computed once per VOXEL outside the rematted
        pair step (each voxel is `curr` of one pair and `prev` of the
        next; fnet is per-sample instance-norm, so hoisting is
        numerically identical) — halves the encoder cost, which
        dominates the forward FLOPs. lax.map chunks the encode per time
        step; jax.checkpoint keeps only the (T+1, B, H/8, W/8, 256)
        feature maps live for the backward."""
        params, state, events = self._cast_compute(params, state, events,
                                                   train, cast_state=False)
        xs_t = jnp.swapaxes(events, 0, 1)          # (T+1, B, H, W, bins)

        def encode(voxel):
            return self.model.apply(params, voxel, method="encode")

        fmaps = jax.lax.map(jax.checkpoint(encode), xs_t)

        def apply_fn(variables, carry, t, mutable):
            # scan over the pair INDEX and slice the shared buffers in
            # the body: scanning over (fmaps[:-1], fmaps[1:], xs_t[1:])
            # would materialize two nearly-full fmaps copies plus a
            # duplicate events buffer as scan operands; as closed-over
            # scan constants each exists once (grads still flow)
            f1 = jax.lax.dynamic_index_in_dim(fmaps, t, keepdims=False)
            f2 = jax.lax.dynamic_index_in_dim(fmaps, t + 1, keepdims=False)
            v1 = jax.lax.dynamic_index_in_dim(xs_t, t + 1, keepdims=False)
            if mutable:
                (out, carry), mut = self.model.apply(
                    variables, f1, f2, v1, carry, train=train,
                    mutable=["batch_stats"], method="step_with_fmaps")
                return (out["flow"], carry), mut
            out, carry = self.model.apply(variables, f1, f2, v1, carry,
                                          train=train,
                                          method="step_with_fmaps")
            return out["flow"], carry

        # 12 GRU iterations per pair x T pairs of activations would not
        # fit; the scan remat recomputes per pair in the backward pass
        final_state, flows, updates = scan_recurrent(
            apply_fn, params, state, jnp.arange(xs_t.shape[0] - 1),
            train, self.remat_policy)
        flows = jnp.swapaxes(flows, 0, 1).astype(jnp.float32)
        return flows, final_state, updates

    def calc_loss(self, pred: Array, batch: Dict[str, Array],
                  remove_flow_loss: bool = False):
        """Flow L1 vs (pseudo-)GT (train_flow_utils.py:371-430)."""
        cfg = self.loss_cfg
        gt = batch["flow"]
        b, t = pred.shape[:2]
        terms: Dict[str, Array] = {}
        if cfg.l1_weight:
            flat_pred = pred.reshape((b * t,) + pred.shape[2:])
            flat_gt = gt.reshape((b * t,) + gt.shape[2:])
            per_bt = L.l1_loss(flat_pred, flat_gt, cfg.l1_weight,
                               reduce_batch=False)
            terms["l1_loss"] = per_bt.reshape(b, t).mean(axis=1)
        total = sum(v.mean() for v in terms.values())
        aux = dict(terms)
        aux["pred_max_val"] = pred.max()
        aux["pred_min_val"] = pred.min()
        return total, aux


def flow_metrics(pred_flow: np.ndarray, gt_flow: np.ndarray,
                 events: np.ndarray, prefix: str) -> Dict[str, list]:
    """Per-frame dense/sparse EPE, 1PE, 3PE
    (train_flow_utils.py:229-294). All arrays (1,T,H,W,C)."""
    t = pred_flow.shape[1]
    out = defaultdict(list)
    for ti in range(t):
        pf = pred_flow[0, ti]                      # (H,W,2)
        gf = gt_flow[0, ti]
        valid = ~(np.isnan(gf[..., 0]) | np.isnan(gf[..., 1])
                  | ((gf[..., 0] == 0) & (gf[..., 1] == 0)))
        ev_mask = np.abs(events[0, ti]).sum(axis=-1) > 0
        sparse = valid & ev_mask
        ee = np.sqrt(((pf - np.nan_to_num(gf)) ** 2).sum(axis=-1))

        def stats(mask):
            cnt = mask.sum()
            if cnt == 0:
                return 0.0, 0.0, 0.0
            mee = np.where(mask, ee, 0.0)
            return (float(mee.sum() / cnt),
                    float((mee > 1).sum() / cnt),
                    float((mee > 3).sum() / cnt))

        d_epe, d_1pe, d_3pe = stats(valid)
        s_epe, s_1pe, s_3pe = stats(sparse)
        for name, val in zip(
                ["dense_EPE", "dense_1PE", "dense_3PE",
                 "sparse_EPE", "sparse_1PE", "sparse_3PE"],
                [d_epe, d_1pe, d_3pe, s_epe, s_1pe, s_3pe]):
            out[f"{prefix}/{name}"].append(val)
    return out


def flow2rgb_np(disp_x: np.ndarray, disp_y: np.ndarray,
                max_magnitude: Optional[float] = None) -> np.ndarray:
    """HSV flow visualization, hue = direction, value = magnitude
    (train_flow_utils.py:22-106). Returns (H,W,3) uint8 RGB."""
    magnitude = np.sqrt(disp_x ** 2 + disp_y ** 2)
    angle = np.arctan2(disp_y, disp_x)
    h = (angle + np.pi) / (2 * np.pi)
    if max_magnitude is None:
        v = magnitude / max(float(magnitude.max()), 1e-5)
    else:
        v = np.clip(magnitude / max_magnitude, 0, 1)
    hp = h * 6.0
    i = np.floor(hp).astype(int) % 6
    f = hp - np.floor(hp)
    p = np.zeros_like(v)
    q = v * (1.0 - f)
    t = v * f
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return (np.stack([r, g, b], axis=-1) * 255.0).astype(np.uint8)
