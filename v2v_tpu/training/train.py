"""Experiment orchestration: the stage loop, resume, checkpointing,
validation, and TensorBoard logging.

Functional rebuild of the reference train driver (train.py:71-252) on the
TPU design: one jitted fused train step (simulation + forward/backward +
update) fed by a host loader; data parallelism via a device mesh instead
of DDP; the ckpt_paths resume protocol kept verbatim.
"""
from __future__ import annotations

import datetime
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import resolve_target
from ..data.interface import DataLoader, make_concat_multi_dataset
from ..ops.voxel import SimConfig
from ..parallel.mesh import make_mesh, replicate, shard_batch
from .checkpoint import (append_ckpt_path, last_ckpt_path, load_checkpoint,
                         save_checkpoint)
from .interface import ModelInterface, aggregate_per_source
from .steps import make_eval_step, make_train_step


def sim_config_from_dataset(cfg: Dict[str, Any]) -> SimConfig:
    """Build the device simulator config from the WebVid dataset config
    block (the reference passes these into imgs_to_voxels,
    data/v2v_datasets.py:54-60)."""
    return SimConfig(
        threshold_range=tuple(cfg.get("threshold_range", [0.05, 2])),
        max_thres_pos_neg_gap=cfg.get("max_thres_pos_neg_gap", 1.5),
        base_noise_std_range=tuple(cfg.get("base_noise_std_range", [0, 0.2])),
        hot_pixel_fraction_range=tuple(
            cfg.get("hot_pixel_fraction_range", [0, 0.001])),
        hot_pixel_std_range=tuple(cfg.get("hot_pixel_std_range", [0, 0.2])),
        put_noise_external=cfg.get("put_noise_external", False),
        scale_noise_strength=cfg.get("scale_noise_strength", False),
    )


def make_optimizer(cfg: Dict[str, Any]):
    cls = resolve_target(cfg["target"])
    return cls(**cfg.get("params", {}))


def make_scheduler(cfg: Dict[str, Any]):
    cls = resolve_target(cfg["target"])
    return cls(**cfg.get("params", {}))


def _host_local(v) -> np.ndarray:
    """Fetch the host-addressable part of a (possibly multi-host) array:
    the full value for scalars/replicated leaves, this host's rows for
    batch-sharded leaves. np.asarray on a global array that spans
    non-addressable devices raises; per-sample aux must also align with
    the HOST-LOCAL data_source_idx for per-source logging."""
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        shards = list(v.addressable_shards)
        if v.ndim == 0:
            return np.asarray(shards[0].data)
        rows = {}
        for s in shards:                   # dedupe replicated shards
            start = s.index[0].start or 0
            rows.setdefault(start, np.asarray(s.data))
        return np.concatenate([rows[k] for k in sorted(rows)])
    return np.asarray(v)


def _prefetch_to_device(iterator, mesh, size: int = 2):
    """Double-buffered host->device prefetch: keep `size` sharded batches
    in flight so decode/collate overlaps device compute (the reference
    relies on torch DataLoader worker prefetch; here transfer is
    explicit)."""
    import collections
    buf = collections.deque()

    def put(item):
        host_meta = {k: item.pop(k) for k in list(item)
                     if not isinstance(item[k], np.ndarray)}
        src_idx = item.get("data_source_idx")
        # keep host numpy until shard_batch places it: jnp.asarray would
        # commit to the default device first (and multi-host assembly
        # needs process-local HOST buffers)
        dev = shard_batch({k: np.asarray(v) for k, v in item.items()}, mesh)
        return dev, src_idx, host_meta

    for item in iterator:
        buf.append(put(dict(item)))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


class _Writer:
    """TensorBoard writer (tensorboardX), no-op if unavailable.

    `enabled=False` makes every method a no-op — multi-host runs
    construct the writer on every process but only rank 0 may write to
    the shared log dir (same convention as checkpoints/val_loss.txt;
    duplicate event files corrupt the TB timeline)."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self.w = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter
            self.w = SummaryWriter(log_dir)
        except Exception:
            self.w = None

    def add_scalar(self, tag, value, step):
        if self.w is not None:
            self.w.add_scalar(tag, value, step)

    def add_video_grid(self, tag, frames_uint8, step):
        if self.w is not None:
            try:
                self.w.add_video(tag, frames_uint8, step, fps=8)
            except Exception:
                pass


def main(configs: Dict[str, Any], max_batches_per_epoch: Optional[int] = None,
         root: str = ".") -> Dict[str, Any]:
    """Run all training stages. Returns final state (for tests).

    `max_batches_per_epoch` caps work per epoch (smoke tests / CI).
    """
    experiment_name = configs["experiment_name"]
    task = configs.get("task", "e2vid")
    assert task in ("e2vid", "flow")
    if task == "flow":
        from .flow_interface import FlowModelInterface
        iface: ModelInterface = FlowModelInterface(configs["module"])
    else:
        iface = ModelInterface(configs["module"])

    # mesh size = largest divisor of the global batch that fits the
    # available devices (replaces torchrun's fixed world size). With
    # multiple processes the mesh MUST span every process's devices —
    # make_array_from_process_local_data needs each host to own
    # addressable shards — so all devices join and the per-host batch is
    # rounded to the local device count instead.
    first_bs = configs["train_stages"][0]["dataset"]["train_batch_size"]
    n_avail = len(jax.devices())
    process_index = jax.process_index()
    process_count = jax.process_count()
    if process_count > 1:
        n_dev = n_avail
    else:
        n_dev = max(d for d in range(1, n_avail + 1) if first_bs % d == 0)
    mesh = make_mesh(n_dev)

    checkpoint_path = last_ckpt_path(experiment_name, root)

    log_dir = os.path.join(root, "tensorboard_logs", experiment_name)
    writer = _Writer(log_dir, enabled=process_index == 0)
    val_loss_txt = os.path.join(log_dir, "val_loss.txt")
    ckpt_dir = os.path.join(root, "checkpoints", experiment_name)
    os.makedirs(ckpt_dir, exist_ok=True)

    epochs_of_stages = [s["max_epochs"] for s in configs["train_stages"]]

    # ---- build params lazily from the first stage's data shape --------
    params = None
    opt_state = None
    cur_epoch = 0
    just_resumed = False
    pending_opt_state = None
    pending_sched_state = None
    key = jax.random.PRNGKey(configs.get("seed", 0))

    # decide start stage from cumulative epochs (train.py:216-222)
    def stage_of_epoch(epoch):
        total = 0
        for i, e in enumerate(epochs_of_stages):
            if epoch < total + e:
                return i
            total += e
        return len(epochs_of_stages) - 1

    for stage_idx, stage_cfg in enumerate(configs["train_stages"]):
        ds_cfg = stage_cfg["dataset"]
        train_cfgs = ds_cfg["train"]
        train_ds = make_concat_multi_dataset(train_cfgs)
        val_ds = make_concat_multi_dataset(ds_cfg.get("val", []))
        batch_size = ds_cfg["train_batch_size"]
        # round the (per-host) batch down to a multiple of the per-host
        # device count (multi-host: the loader yields this host's rows;
        # the global batch is batch_size * process_count)
        local_dev = max(1, n_dev // process_count)
        if batch_size % local_dev:
            batch_size = max(local_dev,
                             (batch_size // local_dev) * local_dev)
        # `worker_type: process` opts into forked workers (the torch-
        # DataLoader model) for decode-heavy video datasets; measured
        # +11% on the synthetic smoke (mp4 seek dominates there). Default
        # stays threads: fork after JAX init risks deadlock, and h5
        # datasets hold open handles that are not fork-safe.
        train_loader = DataLoader(
            train_ds, batch_size, shuffle=True, drop_last=True,
            num_workers=ds_cfg.get("num_workers", 4),
            process_index=process_index, process_count=process_count,
            prefetch=ds_cfg.get("prefetch", 4),
            worker_type=ds_cfg.get("worker_type", "thread"))
        val_loader = DataLoader(
            val_ds, ds_cfg.get("val_batch_size", 1), shuffle=False,
            drop_last=False, num_workers=2) if len(val_ds) else None

        # simulator config if the train data is raw video
        first_item_cfg = train_cfgs[0]
        video_mode = first_item_cfg.get(
            "class_name", "").endswith("WebvidDatasetV2") and \
            first_item_cfg.get("output", "video") == "video"
        sim_cfg = sim_config_from_dataset(first_item_cfg) if video_mode else None
        num_bins = first_item_cfg.get("num_bins", 5)
        frames_per_bin = first_item_cfg.get("frames_per_bin", 1)
        # flow-task training: T+1 GT frames (teacher flow pairs) and,
        # for ERAFT, one extra leading event group (v2v_datasets.py
        # output_additional_frame/evs)
        extra_frame = first_item_cfg.get("output_additional_frame", False)
        extra_evs = first_item_cfg.get("output_additional_evs", False)

        # ---- init params on first stage -------------------------------
        if params is None:
            probe = train_ds[0]
            if "video" in probe:
                h, w = probe["video"].shape[1:3]
            else:
                h, w = probe["events"].shape[1:3]
            params, _ = iface.init(key, batch_size, h, w, num_bins)

        optimizer_spec = make_optimizer(stage_cfg["optimizer"])
        optimizer = optimizer_spec.make()
        scheduler = make_scheduler(stage_cfg["lr_scheduler"]) \
            if "lr_scheduler" in stage_cfg else None
        if scheduler is not None and hasattr(scheduler, "base_lr"):
            # CosineAnnealingLR's eta_min is an absolute LR (torch
            # semantics); it needs the base LR to return a multiplier
            scheduler.base_lr = optimizer_spec.base_lr
        opt_state = optimizer.init(params)

        if checkpoint_path is not None and not just_resumed:
            params, loaded_opt_state, meta = load_checkpoint(
                checkpoint_path, params, opt_state)
            cur_epoch = int(meta["epoch"]) + 1
            just_resumed = True
            pending_opt_state = loaded_opt_state
            pending_sched_state = meta.get("scheduler")
            print(f"Resumed from {checkpoint_path} at epoch {cur_epoch}")

        if stage_of_epoch(cur_epoch) > stage_idx:
            continue    # this stage already finished before resume

        # restore the optimizer state into the stage we actually resume
        # in (reference train.py:240-242); drop it if the stage's
        # optimizer has a different state structure
        if just_resumed and pending_opt_state is not None:
            if (jax.tree.structure(pending_opt_state)
                    == jax.tree.structure(opt_state)):
                opt_state = pending_opt_state
            pending_opt_state = None
        if just_resumed and scheduler is not None and \
                pending_sched_state:
            # stateful schedulers (ReduceLROnPlateau) persist their
            # accumulated decay across resume (reference pickles the
            # whole lr_scheduler object, train.py:146-151,240-242)
            try:
                scheduler.load_state_dict(
                    {k: float(v) for k, v in pending_sched_state.items()})
            except Exception:
                pass

        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        train_step = make_train_step(iface, optimizer, sim_cfg,
                                     num_bins, frames_per_bin,
                                     extra_frame=extra_frame,
                                     extra_evs=extra_evs)
        eval_step = make_eval_step(iface)
        # jitted pseudo-GT fill for flow-task validation (a RAFT source
        # recomputes the target at val even when the h5 stores flow —
        # reference train_flow_utils.py:305-326; eager teacher dispatch
        # would dominate val wall time)
        flow_fill = jax.jit(
            lambda frames: iface.prepare_flow({"frame": frames})["flow"])

        epochs_before = sum(epochs_of_stages[:stage_idx])
        rel_epoch = cur_epoch - epochs_before
        for epoch in range(rel_epoch, stage_cfg["max_epochs"]):
            global_epoch = epochs_before + epoch
            train_loader.set_epoch(global_epoch)
            lr_scale = scheduler(epoch) if scheduler else 1.0
            base_lr = optimizer_spec.base_lr
            writer.add_scalar("train/lr", base_lr * lr_scale, global_epoch)
            if process_index == 0:
                print(f"Stage {stage_idx}, epoch {global_epoch}: "
                      f"lr={base_lr * lr_scale:.3e}", flush=True)

            t0 = time.time()
            n_batches = 0
            prefetched = _prefetch_to_device(iter(train_loader), mesh)
            for batch_idx, (batch, src_idx, host_meta) in enumerate(
                    prefetched):
                if (max_batches_per_epoch is not None
                        and batch_idx >= max_batches_per_epoch):
                    break
                opt_state.hyperparams["learning_rate"] = base_lr * lr_scale
                step_key = jax.random.fold_in(key, global_epoch * 100003
                                              + batch_idx)
                # HyperE2VID GT-mixing curriculum: beta decays over
                # hyper_epochs (train_utils.py:307,329)
                hyper_beta = 0.0
                if iface.hyper_epochs > 0:
                    hyper_beta = max(0.0, 1.0 - epoch / iface.hyper_epochs)
                # optional profiler capture: `profile_steps: [start, end)`
                # traces those global steps of the first visited epoch
                # into tensorboard_logs/{exp}/plugins (the jax.profiler
                # analog of the reference CudaTimer, utils/timers.py)
                prof = configs.get("profile_steps")
                if prof and epoch == rel_epoch and batch_idx == prof[0]:
                    jax.profiler.start_trace(os.path.join(
                        root, "tensorboard_logs",
                        configs["experiment_name"]))
                params, opt_state, loss, aux = train_step(
                    params, opt_state, batch, step_key, hyper_beta)
                if prof and epoch == rel_epoch and batch_idx == prof[1] - 1:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                n_batches += 1
                if batch_idx % 50 == 0:
                    # finite guard — the functional analog of the
                    # reference's per-module NaN forward hooks
                    # (model/train_utils.py:90-113,178-179); for
                    # per-op localization run with JAX_DEBUG_NANS=1
                    if configs.get("check_finite", True) and \
                            not np.isfinite(float(_host_local(loss))):
                        raise FloatingPointError(
                            f"non-finite loss at epoch {global_epoch} "
                            f"batch {batch_idx}: "
                            f"{float(_host_local(loss))} (pred range "
                            f"[{float(_host_local(aux['pred_min_val']))}, "
                            f"{float(_host_local(aux['pred_max_val']))}], "
                            f"grad norm "
                            f"{float(_host_local(aux['grad_norm']))}); "
                            f"rerun with JAX_DEBUG_NANS=1 to localize")
                    logs = aggregate_per_source(
                        {k: _host_local(v) for k, v in aux.items()},
                        np.asarray(src_idx))
                    step = (global_epoch * max(len(train_loader), 1)
                            + batch_idx)
                    for k, v in logs.items():
                        writer.add_scalar(f"train/{k}", v, step)
                    if process_index == 0 and batch_idx > 0:
                        rate = batch_idx / max(time.time() - t0, 1e-9)
                        print(f"  epoch {global_epoch} step {batch_idx}/"
                              f"{len(train_loader)} "
                              f"loss={logs.get('loss', float('nan')):.4f} "
                              f"({rate:.2f} steps/s)", flush=True)
            dt = time.time() - t0
            last_loss = (float(_host_local(loss)) if n_batches
                         else float("nan"))
            print(f"Stage {stage_idx}, epoch {global_epoch}: "
                  f"{n_batches} steps in {dt:.1f}s, loss={last_loss:.4f}")

            is_val_epoch = (global_epoch % configs.get(
                "check_val_every_n_epoch", 1) == 0
                or epoch == stage_cfg["max_epochs"] - 1)
            if is_val_epoch:
                val_losses = []
                if val_loader is not None:
                    for vidx, vbatch in enumerate(val_loader):
                        if (max_batches_per_epoch is not None
                                and vidx >= max_batches_per_epoch):
                            break
                        events = jnp.asarray(vbatch["events"])
                        b, _, h, w, _ = events.shape
                        state = iface.init_state(b, h, w)
                        pred, _ = eval_step(params, events, state)
                        vb = {k: jnp.asarray(v) for k, v in vbatch.items()
                              if isinstance(v, np.ndarray)}
                        if task == "flow" and \
                                iface.loss_cfg.optical_flow_source != "gt":
                            # flow val targets: RAFT/zeros sources fill
                            # (and overwrite) pseudo-GT from the frames
                            # (reference train_flow_utils.py:305-326)
                            vb = dict(vb)
                            vb["flow"] = flow_fill(vb["frame"])
                        vloss, vaux = iface.calc_loss(
                            pred, vb, remove_flow_loss=True)
                        val_losses.append(float(vloss))
                        # per-source val tags (select_best_checkpoint
                        # averages val/perceptual_loss/{source},
                        # scripts/select_best_checkpoint.py)
                        vlogs = aggregate_per_source(
                            {k: np.asarray(v) for k, v in vaux.items()},
                            np.asarray(vbatch["data_source_idx"]).reshape(-1))
                        for k, v in vlogs.items():
                            writer.add_scalar(f"val/{k}", v, global_epoch)
                        if vidx == 0:
                            from .preview import make_preview
                            try:
                                pv = dict(vbatch)
                                if "flow" in vb:   # filled pseudo-GT
                                    pv["flow"] = np.asarray(vb["flow"])
                                writer.add_video_grid(
                                    "val/preview",
                                    make_preview(pv, np.asarray(pred)),
                                    global_epoch)
                            except Exception:
                                pass
                total_val = float(np.mean(val_losses)) if val_losses else 0.0
                writer.add_scalar("val/loss", total_val, global_epoch)
                if scheduler is not None:
                    scheduler.observe(total_val)

                if process_index == 0:
                    ckpt_path = os.path.join(
                        ckpt_dir, f"epoch_{global_epoch:04d}.msgpack")
                    sched_state = (scheduler.state_dict()
                                   if scheduler is not None else {})
                    save_checkpoint(ckpt_path,
                                    jax.tree.map(_host_local, params),
                                    jax.tree.map(_host_local, opt_state),
                                    global_epoch,
                                    extra={"scheduler": sched_state}
                                    if sched_state else None)
                    append_ckpt_path(experiment_name, ckpt_path, root)
                    stamp = datetime.datetime.now().strftime(
                        "%Y-%m-%d %H:%M:%S")
                    with open(val_loss_txt, "a") as f:
                        f.write(f"{stamp} Epoch {global_epoch}: {total_val}\n")
        cur_epoch = sum(epochs_of_stages[:stage_idx + 1])
        just_resumed = False
        checkpoint_path = None

    return {"params": params, "opt_state": opt_state, "epoch": cur_epoch}
