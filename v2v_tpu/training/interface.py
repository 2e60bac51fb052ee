"""Task interface: sequence forward + loss for reconstruction models.

Functional equivalent of the reference `ModelInterface`
(model/train_utils.py:169-481), redesigned for XLA:

  * the T-step python loop (train_utils.py:339-345) becomes `lax.scan`
    with the recurrent state as carry;
  * per-timestep loss loops (train_utils.py:402-424) become batched ops
    over the folded (B*T) axis — LPIPS runs once over all frames;
  * `reset_states()` becomes explicit state passed in/out, so streaming
    eval carries state across chunks of the same sequence
    (test_e2vid.py:53-61) purely.

Batch layout is channels-last: events (B,T,H,W,bins), frame (B,T,H,W,C),
flow (B,T,H,W,2).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..config import instantiate_from_config
from ..losses import losses as L
from ..losses.lpips import LPIPS
from ..ops.normalize import normalize_batch_voxel
from ..ops.pad import crop_from_multiple, pad_to_multiple

Array = jax.Array


def _remat_policy(name: str):
    """Map the remat_policy config string to a jax.checkpoint policy."""
    from jax.ad_checkpoint import checkpoint_policies as cp
    if name in (None, "full"):
        return None
    if name == "gates":
        return cp.save_only_these_names("convlstm_gates")
    if name == "convs":
        return cp.save_only_these_names("convlstm_gates", "conv_out")
    raise ValueError(f"unknown remat_policy {name!r}")


def scan_recurrent(apply_fn, params, state, xs, train: bool,
                   remat_policy: Optional[str] = None):
    """Scan a recurrent model step with BPTT remat and mutable
    batch_stats threading (shared by the reconstruction and flow
    forwards — BN running stats update sequentially through the scan
    when training; the reference trains BN live, train.py:72).

    apply_fn(variables, carry, x, mutable) must call the model with
    `mutable=["batch_stats"]` when `mutable` is True and return
    ((y, new_carry), mutated_vars); otherwise return (y, new_carry).

    Returns (final_carry, ys, updates) where updates is {} or
    {'batch_stats': <stats after the last step>}."""
    track_bs = train and "batch_stats" in params

    def step(carry, x):
        if track_bs:
            carry, bs = carry
            (y, new_carry), mut = apply_fn(
                {**params, "batch_stats": bs}, carry, x, True)
            return (new_carry, mut["batch_stats"]), y
        y, new_carry = apply_fn(params, carry, x, False)
        return new_carry, y

    if train:
        # BPTT through the recurrent steps stores every activation
        # otherwise; rematerialize per step (optionally keeping named
        # conv outputs — see remat_policy)
        step = jax.checkpoint(step, policy=_remat_policy(remat_policy))
    if track_bs:
        state = (state, params["batch_stats"])
    final_state, ys = jax.lax.scan(step, state, xs)
    updates = {}
    if track_bs:
        final_state, bs_final = final_state
        updates["batch_stats"] = bs_final
    return final_state, ys, updates


class LossConfig(NamedTuple):
    """The `module.loss` config block (train_utils.py:250-279)."""
    lpips_weight: float = 0.0
    lpips_type: str = "vgg"
    # 'full' rematerializes the pred trunk per chunk (smallest memory);
    # 'none' keeps each chunk's trunk activations for backward — saves
    # one full trunk recompute per chunk (~maps to LPIPS chunk count x
    # ~1 GiB bf16 of taps live across the lax.map scan)
    lpips_remat: str = "full"
    l1_weight: float = 0.0
    l2_weight: float = 0.0
    temporal_consistency_weight: float = 0.0
    temporal_consistency_L0: int = 1
    optical_flow_source: str = "gt"   # gt | zeros | raft_small | raft_large
    raft_num_flow_updates: int = 12

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LossConfig":
        if d.get("lpips_remat", "full") not in ("full", "none"):
            raise ValueError(
                f"lpips_remat must be 'full' or 'none', got "
                f"{d['lpips_remat']!r}")
        if d.get("ssim_weight", 0):
            # the reference ships ssim_loss disabled too: its __call__ is
            # `assert False, "This function causes multi-GPU issues."`
            # (model/loss.py:149-157); fail loudly rather than silently
            # dropping the term
            raise ValueError(
                "ssim_weight != 0 is unsupported (disabled in the "
                "reference as well, model/loss.py:157); set it to 0")
        known = cls._fields
        return cls(**{k: v for k, v in d.items() if k in known})


class ModelInterface:
    """Builds the model from config and exposes pure jit-ready functions.

    Reference parity notes:
      * voxel normalization: normalize_batch_voxel when
        `normalize_voxels` (train_utils.py:319-320)
      * pad H,W to x16 before the net, crop back (train_utils.py:322-326)
      * HyperE2VID GT-mixing curriculum: beta = 1 - epoch/hyper_epochs
        during training (train_utils.py:307,328-342)
    """

    def __init__(self, configs: Dict[str, Any]):
        self.configs = configs
        self.model = instantiate_from_config(configs["model"])
        self.loss_cfg = LossConfig.from_dict(configs.get("loss", {}))
        self.normalize_voxels = configs.get("normalize_voxels", False)
        self.hyper_epochs = configs.get("hyper_epochs", 0)
        # 'bfloat16' runs the recurrent forward/backward in bf16 (params
        # cast per step, master params and the loss stay f32) — MXU-
        # friendly mixed precision; None = f32 throughout
        self.compute_dtype = configs.get("compute_dtype", None)
        # BPTT rematerialization policy for the T-scan:
        #   'full'  (default) recompute all per-step activations in the
        #           backward pass — smallest memory (4.1 GiB temp at the
        #           flagship shape), 478 ms scan fwd+bwd;
        #   'gates' additionally keep the ConvLSTM gate convs (6.2 GiB,
        #           ~same speed — kept for bigger-HBM parts);
        #   'convs' keep every conv output (11.6 GiB, 435 ms, -9%) —
        #           only fits chips with headroom beyond 16 GB once
        #           LPIPS/TC/simulator memory is added.
        self.remat_policy = configs.get("remat_policy", "full")
        # forward-split: hoist temporally-independent convs out of the
        # train-time scan (see forward_sequence; default on — set
        # scan_split: false in the module config to force the original
        # full-body scan)
        self.scan_split = configs.get("scan_split", True)
        self.pred_channels = configs.get("pred_channels", 1)
        self.is_nernet = configs.get("is_nernet", False)
        self._lpips_train: Optional[LPIPS] = None
        self._lpips_test: Optional[LPIPS] = None
        if self.loss_cfg.lpips_weight:
            # build eagerly — constructing LPIPS lazily inside a jitted
            # loss would trace its parameter initialization
            _ = self.lpips_train

    # -- lazily built LPIPS instances (heavy; lock: the eval harness
    # touches these from metric-pool threads) --------------------------
    _lpips_lock = threading.Lock()

    @property
    def lpips_train(self) -> LPIPS:
        if self._lpips_train is None:
            with self._lpips_lock:
                if self._lpips_train is None:
                    self._lpips_train = LPIPS(self.loss_cfg.lpips_type)
        return self._lpips_train

    @property
    def lpips_test(self) -> LPIPS:
        # test metric is always AlexNet (train_utils.py:198)
        if self._lpips_test is None:
            with self._lpips_lock:
                if self._lpips_test is None:
                    self._lpips_test = LPIPS("alex")
        return self._lpips_test

    # -- params/state ---------------------------------------------------
    def init(self, key: jax.Array, batch_size: int, height: int, width: int,
             num_bins: int = 5):
        # probe at the padded resolution the forward pass actually uses
        # (conv params are resolution-independent)
        height = -(-height // 16) * 16
        width = -(-width // 16) * 16
        state = self.model.init_state(batch_size, height, width)
        x = jnp.zeros((batch_size, height, width, num_bins))
        params = self.model.init(key, x, state)
        return params, state

    def init_state(self, batch_size: int, height: int, width: int):
        ph = -(-height // 16) * 16
        pw = -(-width // 16) * 16
        return self.model.init_state(batch_size, ph, pw)

    # -- forward --------------------------------------------------------
    def forward_sequence(self, params, events: Array,
                         state: Any, train: bool = False,
                         gt_frames: Optional[Array] = None,
                         hyper_beta: Optional[Array] = None,
                         dropout_rng: Optional[Array] = None,
                         return_updates: bool = False,
                         ) -> Tuple[Array, Any]:
        """events: (B,T,H,W,bins) -> pred images (B,T,H,W,pred_ch) in
        [0,1]-ish range, plus the final recurrent state.

        With `return_updates` a third element is returned: non-gradient
        model-state updates ({} or {'batch_stats': ...}). BatchNorm
        models normalize with live batch statistics during training and
        update running stats through the scan (the reference trains BN
        live — train.py:72 model.train(), no freeze_bn call)."""
        b, t, h, w, c = events.shape
        if self.normalize_voxels:
            events = normalize_batch_voxel(events)
        events, hw = pad_to_multiple(events, 16)
        # (BN running stats stay f32 — excluded from the bf16 cast below
        # like torch buffers; scan_recurrent threads them when training)
        if train and self.compute_dtype:
            dtype = jnp.dtype(self.compute_dtype)
            params = dict(params)
            params["params"] = jax.tree.map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params["params"])
            events = events.astype(dtype)
            if gt_frames is not None:
                gt_frames = gt_frames.astype(dtype)

        use_hyper = hyper_beta is not None and gt_frames is not None

        if train and self.compute_dtype:
            state = jax.tree.map(
                lambda s: s.astype(jnp.dtype(self.compute_dtype)), state)

        # Forward-split path: hoist the temporally-independent convs
        # (head + encoder-0 input conv, resblocks + decoders + pred) out
        # of the time scan and run them batched over B*T — the scan
        # keeps only the recurrent spine. Same math, reassociated: at
        # the flagship shape the tail's decoder convs go from B=12
        # (18-73 TF/s isolated, docs/PERF.md floor table) to B=480
        # (near peak), and the per-scan-step fusion overhead shrinks.
        # Gated off for BN models (live batch statistics are per-step)
        # and the HyperE2VID curriculum (its prediction feeds back).
        if (train and not use_hyper and self.scan_split
                and "batch_stats" not in params
                and hasattr(self.model, "spine_step")):
            imgs, final_state = self._forward_split(
                params, events, state, train, dropout_rng)
            imgs = crop_from_multiple(imgs, hw)
            imgs = imgs.astype(jnp.float32)
            if return_updates:
                return imgs, final_state, {}
            return imgs, final_state

        # Non-recurrent models (state == (), e.g. FlowNetNoRecur): the
        # scan is pure overhead — run the whole forward batched over B*T
        if (train and not use_hyper and self.scan_split
                and "batch_stats" not in params
                and isinstance(state, tuple) and len(state) == 0):
            b, t = events.shape[:2]
            flat = events.reshape(b * t, *events.shape[2:])
            out, _ = self.model.apply(params, flat, (), train=train)
            imgs = out["image"].reshape(b, t, *out["image"].shape[1:])
            imgs = crop_from_multiple(imgs.astype(jnp.float32), hw)
            if return_updates:
                return imgs, state, {}
            return imgs, state

        if use_hyper:
            gt_pad, _ = pad_to_multiple(gt_frames, 16)
            xs = (jnp.swapaxes(events, 0, 1), jnp.swapaxes(gt_pad, 0, 1))
        else:
            xs = (jnp.swapaxes(events, 0, 1),)

        # stochastic layers (EITR dropout) draw a fresh key per timestep,
        # carried through the scan
        use_rng = train and dropout_rng is not None

        def apply_fn(variables, carry, x, mutable):
            if use_rng:
                carry, key = carry
                key, sub = jax.random.split(key)
                kwargs = {"rngs": {"dropout": sub}}
            else:
                kwargs = {}
            if mutable:
                kwargs["mutable"] = ["batch_stats"]
            if use_hyper:
                voxel, gt = x
                ret = self.model.apply(
                    variables, voxel, carry, train=train,
                    gt_image=gt, beta=hyper_beta, **kwargs)
            else:
                (voxel,) = x
                ret = self.model.apply(
                    variables, voxel, carry, train=train, **kwargs)
            if mutable:
                (out, new_state), mut = ret
            else:
                out, new_state = ret
            if use_rng:
                new_state = (new_state, key)
            if mutable:
                return (out["image"], new_state), mut
            return out["image"], new_state

        if use_rng:
            state = (state, dropout_rng)   # after the dtype cast — keys
        final_state, imgs, updates = scan_recurrent(
            apply_fn, params, state, xs, train, self.remat_policy)
        if use_rng:
            final_state, _ = final_state
        imgs = jnp.swapaxes(imgs, 0, 1)              # (B,T,ph,pw,C)
        imgs = crop_from_multiple(imgs, hw)
        imgs = imgs.astype(jnp.float32)
        if return_updates:
            return imgs, final_state, updates
        return imgs, final_state

    def _forward_split(self, params, events: Array, state: Any,
                       train: bool, dropout_rng: Optional[Array] = None
                       ) -> Tuple[Array, Any]:
        """Forward with the time scan reduced to the recurrent spine
        (see forward_sequence). events: (B,T,ph,pw,c) already padded +
        cast. Each of the three stages is its own remat region: pre and
        tail recompute their internals in the backward (their outputs
        are stored anyway as region residuals), the spine keeps the
        configured BPTT remat_policy.

        Stochastic layers (EITR's transformer dropout) live in the tail,
        which runs ONCE over the B*T batch — a single key draws the
        whole mask, iid per (step, position) element exactly like the
        per-step keys of the scan path (same distribution, different
        stream)."""
        b, t = events.shape[:2]
        flat = events.reshape(b * t, *events.shape[2:])

        def pre_fn(ev):
            return self.model.apply(params, ev, train=train, method="pre")

        def step(carry, x):
            blocks, new_states = self.model.apply(
                params, x, carry, train=train, method="spine_step")
            return new_states, tuple(blocks)

        if train and dropout_rng is not None:
            def tail_fn(h, bl, key):
                return self.model.apply(
                    params, h, list(bl), train=train, method="tail",
                    rngs={"dropout": key})["image"]
        else:
            def tail_fn(h, bl, key=None):
                return self.model.apply(params, h, list(bl), train=train,
                                        method="tail")["image"]

        if train:
            pre_fn = jax.checkpoint(pre_fn)
            step = jax.checkpoint(step,
                                  policy=_remat_policy(self.remat_policy))
            tail_fn = jax.checkpoint(tail_fn)

        head, pre0 = pre_fn(flat)
        pre0_t = jnp.swapaxes(pre0.reshape(b, t, *pre0.shape[1:]), 0, 1)
        final_state, zs = jax.lax.scan(step, state, pre0_t)
        blocks = tuple(
            jnp.swapaxes(z, 0, 1).reshape(b * t, *z.shape[2:]) for z in zs)
        imgs_flat = tail_fn(head, blocks, dropout_rng)
        return imgs_flat.reshape(b, t, *imgs_flat.shape[1:]), final_state

    def forward_sequence_nernet(self, params, events_list, state):
        """NerNet raw-event path (train_utils.py:350-378): B=1, a python
        loop over T with per-step bucket-padded event streams. The jitted
        apply is cached per (bucket, resolution) — a real sequence
        sweeping event rates compiles once per power-of-two bucket and
        then reuses (tests/test_advanced_models.py pins this), instead of
        dispatching the UNet op-by-op (eager is ~ms/op on the TPU relay)."""
        import numpy as np
        if not hasattr(self, "_nernet_cache"):
            self._nernet_cache = {}
        unet_state, hw = state      # hw is static python (height, width)
        hw = tuple(int(v) for v in hw)

        def _jitted(bucket):
            key = (bucket,) + hw
            fn = self._nernet_cache.get(key)
            if fn is None:
                def apply_fn(p, ev, n, us):
                    out, (new_us, _) = self.model.apply(p, ev, n, (us, hw))
                    return out, new_us
                fn = jax.jit(apply_fn)
                self._nernet_cache[key] = fn
            return fn

        preds = []
        for evs in events_list:
            evs = np.asarray(evs, np.float64).copy()
            # Shift timestamps to a 0 origin in float64 BEFORE the f32
            # cast: raw h5 stamps are absolute seconds whose f32
            # representation collapses the per-event deltas (the
            # reference normalizes in float64 for the same reason,
            # testh5.py:329-330, representation_modules.py:199-215).
            if evs.shape[0]:
                evs[:, 2] -= evs[0, 2]
            evs = evs.astype(np.float32)
            n = evs.shape[0]
            bucket = max(1024, 1 << (n - 1).bit_length())
            padded = np.zeros((bucket, 5), np.float32)
            padded[:n] = evs
            out, unet_state = _jitted(bucket)(
                params, jnp.asarray(padded), jnp.int32(n), unet_state)
            preds.append(out["image"])           # (1,H,W,1)
        return jnp.stack(preds, axis=1), (unet_state, hw)

    # -- loss -----------------------------------------------------------
    def calc_loss(self, pred: Array, batch: Dict[str, Array],
                  remove_flow_loss: bool = False) -> Tuple[Array, Dict[str, Array]]:
        """Batched version of calc_loss (train_utils.py:380-458).

        Returns (scalar loss for grad, dict of per-sample (B,) loss terms
        for per-data-source logging on host). All terms average over T
        then weight-sum, matching the reference bookkeeping.
        """
        cfg = self.loss_cfg
        frames = batch["frame"]                        # (B,T,H,W,C)
        b, t = pred.shape[:2]
        flat_pred = pred.reshape((b * t,) + pred.shape[2:])
        flat_gt = frames.reshape((b * t,) + frames.shape[2:])

        terms: Dict[str, Array] = {}
        if cfg.l1_weight:
            per_bt = L.l1_loss(flat_pred, flat_gt, cfg.l1_weight,
                               reduce_batch=False)
            terms["l1_loss"] = per_bt.reshape(b, t).mean(axis=1)
        if cfg.l2_weight:
            per_bt = L.l2_loss(flat_pred, flat_gt, cfg.l2_weight,
                               reduce_batch=False)
            terms["l2_loss"] = per_bt.reshape(b, t).mean(axis=1)
        if cfg.lpips_weight:
            # chunk over T (sequential map) and rematerialize each
            # chunk's VGG activations — one flat (B*T) pass keeps the
            # whole trunk's activations live for backward (~GBs).
            # 10 timesteps per chunk is the measured sweet spot at B=12,
            # 128^2 now that only the pred trunk lives in the chunk
            # (full step 891 ms vs 908 at 8, 904 at 20); bigger chunks
            # amortize remat/map overhead until activation memory bites.
            chunk = max(c for c in (10, 8, 5, 4, 2, 1) if t % c == 0)
            chunk_env = os.environ.get("V2V_LPIPS_CHUNK")
            if chunk_env:               # perf experiments only
                chunk = int(chunk_env)
                if chunk < 1 or t % chunk != 0:
                    raise ValueError(
                        f"V2V_LPIPS_CHUNK={chunk} must be a positive "
                        f"divisor of the sequence length T={t} (the "
                        f"(T//chunk, chunk*B) reshape below requires it)")
            lp = self.lpips_train
            pt = jnp.swapaxes(pred, 0, 1).reshape(
                (t // chunk, chunk * b) + pred.shape[2:])
            gt = jnp.swapaxes(frames, 0, 1).reshape(
                (t // chunk, chunk * b) + frames.shape[2:])
            # The GT branch has no parameters upstream: compute its
            # unit-normalized trunk features ONCE outside the remat
            # region (a chunked forward-only map, ~1 GB of taps at the
            # flagship shape) instead of re-running the GT trunk in
            # every chunk's backward pass — one full VGG pass saved.
            gt_feats = jax.lax.map(
                lambda g: tuple(jax.lax.stop_gradient(f) for f in
                                lp._features(
                                    g, True,
                                    compute_dtype=self.compute_dtype)), gt)
            lpips_step = (
                lambda p, gf: lp._dist_from_feats(
                    lp._features(p, True, compute_dtype=self.compute_dtype),
                    list(gf), compute_dtype=self.compute_dtype))
            if cfg.lpips_remat != "none":
                lpips_step = jax.checkpoint(lpips_step)
            d = jax.lax.map(lambda pg: lpips_step(pg[0], pg[1]),
                            (pt, gt_feats))
            # (T/chunk, chunk*B) -> (B,) means; grouping is (t, b) order
            d = d.reshape(t, b).T
            terms["perceptual_loss"] = (cfg.lpips_weight * d.mean(axis=1))
        if cfg.temporal_consistency_weight and not remove_flow_loss:
            l0 = cfg.temporal_consistency_L0
            if t > l0:
                # loss at step t uses (frame[t-1], frame[t], pred[t-1],
                # pred[t], -flow[t]) for t in [L0, T) — reference
                # model/loss.py:166-182 negates the flow.
                # Chunked over time (sequential map + remat): the MXU
                # warp inside holds a (B,H,W,H,C) intermediate, so one
                # flat (B*(T-L0)) call would not fit.
                i0 = jnp.swapaxes(frames[:, l0 - 1:-1], 0, 1)
                i1 = jnp.swapaxes(frames[:, l0:], 0, 1)
                p0 = jnp.swapaxes(pred[:, l0 - 1:-1], 0, 1)
                p1 = jnp.swapaxes(pred[:, l0:], 0, 1)
                fl = jnp.swapaxes(batch["flow"][:, l0:], 0, 1)
                tc_step = jax.checkpoint(
                    lambda x: L.temporal_consistency_loss(
                        x[0], x[1], x[2], x[3], -x[4], reduce_batch=False))
                tc = jax.lax.map(tc_step, (i0, i1, p0, p1, fl))  # (T-L0, B)
                # reference averages over the full T axis with zeros for
                # t < L0 (losses tensor initialized zero,
                # train_utils.py:392,424,432)
                tc_sum = tc.sum(axis=0) / t
                terms["temporal_consistency_loss"] = (
                    cfg.temporal_consistency_weight * tc_sum)

        total = sum(v.mean() for v in terms.values())
        aux = dict(terms)
        aux["pred_max_val"] = pred.max()
        aux["pred_min_val"] = pred.min()
        aux["pred_var"] = pred.var()
        return total, aux

    def prepare_flow(self, batch: Dict[str, Array],
                     test: bool = False) -> Dict[str, Array]:
        """Fill batch['flow'] per optical_flow_source
        (train_utils.py:281-305): only when the TC loss is on and not at
        test/val (the reference never fills there — calc_loss drops the
        flow losses instead). 'gt' asserts presence; 'zeros' makes a
        zero field; RAFT teachers OVERWRITE any stored flow (the
        reference recomputes unconditionally, e.g. over ESIMH5Dataset's
        stored flow in the esim ablation)."""
        cfg = self.loss_cfg
        if cfg.temporal_consistency_weight == 0 or test:
            return batch
        if cfg.optical_flow_source == "gt":
            if "flow" not in batch:
                raise KeyError(
                    "optical_flow_source=gt but batch has no 'flow'")
            return batch
        if cfg.optical_flow_source == "zeros":
            frames = batch["frame"]
            b, t, h, w, _ = frames.shape
            batch = dict(batch)
            batch["flow"] = jnp.zeros((b, t, h, w, 2), frames.dtype)
            return batch
        from .raft import raft_flow  # lazy; needs converted weights
        batch = dict(batch)
        batch["flow"] = raft_flow(cfg.optical_flow_source, batch["frame"],
                                  cfg.temporal_consistency_L0,
                                  num_flow_updates=cfg.raft_num_flow_updates)
        return batch


def aggregate_per_source(terms: Dict[str, np.ndarray],
                         data_source_idx: np.ndarray) -> Dict[str, float]:
    """Host-side per-data-source loss bookkeeping
    (train_utils.py:427-456): mean of each term over the samples of each
    source, plus global means."""
    from ..data.sources import DATA_SOURCES
    out: Dict[str, float] = {}
    loss_total = None
    for name, vals in terms.items():
        vals = np.asarray(vals)
        if vals.ndim == 0:
            out[name] = float(vals)
            continue
        out[name] = float(vals.mean())
        loss_total = vals if loss_total is None else loss_total + vals
        for idx in np.unique(data_source_idx):
            src = DATA_SOURCES[int(idx)]
            mask = data_source_idx == idx
            out[f"{name}/{src}"] = float(vals[mask].mean())
    if loss_total is not None:
        out["loss"] = float(loss_total.mean())
        for idx in np.unique(data_source_idx):
            src = DATA_SOURCES[int(idx)]
            mask = data_source_idx == idx
            out[f"loss/{src}"] = float(loss_total[mask].mean())
    return out
