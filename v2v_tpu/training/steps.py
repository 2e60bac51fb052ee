"""Jitted train/eval steps with fused on-device voxel synthesis.

The defining inversion vs the reference (SURVEY.md §7): the ESIM
simulator runs INSIDE the train step — the host ships uint8 video frames
and a PRNG key; threshold sampling, event integration, voxel binning,
the recurrent forward, losses, and the optimizer update are one XLA
program. The reference pays 2 CPU hot loops in dataloader workers for
this (train.py:52-65 + data/v2v_core_esim.py).

Batch contract (train, simulator path):
    video:  (B, N, H, W) uint8/float  N = L*num_bins*frames_per_bin + 1
    keys:   (B, 2) uint32 per-sample PRNG keys
    data_source_idx: (B,) int32
Batch contract (train, pre-voxelized path): events (B,T,H,W,bins),
    frame (B,T,H,W,C) [,flow (B,T,H,W,2)].
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.voxel import SimConfig, simulate_sequence
from .interface import ModelInterface

Array = jax.Array


def _pallas_ok(video: Array, sim_cfg: SimConfig) -> bool:
    if sim_cfg.put_noise_external:
        return False           # kernel implements potential-noise only
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    # the kernel edge-pads H/W to (8, 128) lane multiples itself; the
    # only remaining shape constraint is a feasible VMEM row tile for
    # the PADDED width — fall back loudly, never silently (the scan
    # simulator is ~60x slower synthesis, docs/PERF.md)
    from ..ops.voxel_pallas import _auto_tile_h
    h, w = video.shape[2:4]
    try:
        _auto_tile_h(h + (-h % 8), w + (-w % 128))
    except ValueError:
        import warnings
        warnings.warn(
            f"synthesize_batch: no feasible VMEM tile for crop "
            f"{h}x{w} — falling back to the jnp scan simulator "
            f"(~60x slower synthesis)", stacklevel=3)
        return False
    return True


def synthesize_batch(video: Array, keys: Array, sim_cfg: SimConfig,
                     num_bins: int, frames_per_bin: int,
                     use_pallas: Optional[bool] = None,
                     extra_frame: bool = False, extra_evs: bool = False,
                     fixed_pos: Optional[Array] = None,
                     fixed_neg: Optional[Array] = None,
                     ) -> Tuple[Array, Array]:
    """(B,N,H,W) video + (B,2) keys -> events (B,G,H,W,bins) NHWC and GT
    frames (B,F,H,W,1) in [0,1].

    Default (reconstruction): G = F = L, frame i is
    video[(i+1)*frames_per_img] (reference data/v2v_datasets.py:329-333).
    Flow-task variants mirror the dataset's voxel path
    (data/webvid.py output='voxel' / v2v_datasets.py:290-345):
      * extra_frame: F = L+1 GT frames at i*frames_per_img — flow GT
        pairs (frame[t], frame[t+1]);
      * extra_evs (ERAFT): the video carries frames_per_img extra
        LEADING frames; G = L+1 event groups, frames offset by
        frames_per_img.
    `fixed_pos`/`fixed_neg` (B,) pin per-video thresholds (the
    fixed-threshold ablation).

    On TPU with aligned shapes the fused Pallas kernel
    (ops/voxel_pallas.py) runs the simulation with per-pixel state held
    in VMEM (~2x the scan path); otherwise the jnp scan path runs."""
    fpi = num_bins * frames_per_bin
    b = video.shape[0]
    if (fixed_pos is None) != (fixed_neg is None):
        raise ValueError(
            "fixed_pos and fixed_neg must be given together (per-video "
            "fixed thresholds pin both polarities)")
    if use_pallas is None:
        use_pallas = _pallas_ok(video, sim_cfg)

    from ..ops.voxel import sample_sim_params

    if use_pallas:
        from ..ops.voxel_pallas import simulate_batch_pallas
        if fixed_pos is None:
            params = jax.vmap(
                lambda k: sample_sim_params(k, sim_cfg))(keys)
        else:
            params = jax.vmap(
                lambda k, fp, fn: sample_sim_params(
                    k, sim_cfg, fixed_pos=fp, fixed_neg=fn))(
                keys, fixed_pos, fixed_neg)
        seeds = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, 2 ** 31 - 1))(keys)
        # uint8 straight into the kernel (converted per frame in VMEM)
        counts = simulate_batch_pallas(video, seeds, params)
        groups = counts.shape[1] // fpi
        h, w = video.shape[2:4]
        voxels = counts.reshape(b, groups, num_bins, frames_per_bin,
                                h, w).sum(axis=3)
    else:
        def one(v, k, fp=None, fn=None):
            fixed = None
            if fp is not None:
                # same param-key split as simulate_sequence's own path,
                # thresholds pinned
                kp, _ = jax.random.split(k)
                fixed = sample_sim_params(kp, sim_cfg, fixed_pos=fp,
                                          fixed_neg=fn)
            voxels, _ = simulate_sequence(v.astype(jnp.float32), k, sim_cfg,
                                          num_bins=num_bins,
                                          frames_per_bin=frames_per_bin,
                                          fixed_params=fixed)
            return voxels                              # (G, bins, H, W)

        if fixed_pos is None:
            voxels = jax.vmap(one)(video, keys)        # (B,G,bins,H,W)
        else:
            voxels = jax.vmap(one)(video, keys, fixed_pos, fixed_neg)
    events = jnp.transpose(voxels, (0, 1, 3, 4, 2))    # NHWC
    groups = events.shape[1]
    base = fpi if extra_evs else 0
    n_frames = groups - (1 if extra_evs else 0)        # = L
    if extra_frame:
        gt_idx = base + jnp.arange(n_frames + 1) * fpi
    else:
        gt_idx = base + (jnp.arange(n_frames) + 1) * fpi
    # gather the few GT frames first, cast after (video may be uint8)
    gt = video[:, gt_idx].astype(jnp.float32) / 255.0  # (B,F,H,W)
    return events, gt[..., None]


def make_train_step(interface: ModelInterface,
                    optimizer: optax.GradientTransformation,
                    sim_cfg: Optional[SimConfig] = None,
                    num_bins: int = 5, frames_per_bin: int = 1,
                    donate: bool = True,
                    extra_frame: bool = False, extra_evs: bool = False):
    """Build the jitted train step. If `sim_cfg` is given the step expects
    the raw-video batch contract and synthesizes voxels on device.
    `extra_frame`/`extra_evs` mirror the dataset's
    output_additional_frame/evs flags (flow-task training,
    train_v2v_{evflow,eraft}: T+1 GT frames for the teacher's flow
    pairs; ERAFT additionally one leading event group)."""

    use_hyper = interface.hyper_epochs > 0

    # teacher weights load/init EAGERLY, never inside the step's trace
    # (tracer-leak hazard — see raft.warm_teacher). e2vid task uses the
    # teacher only for the TC loss; the flow task uses it for pseudo-GT
    # whenever the source is a raft model.
    lc = interface.loss_cfg
    src = str(getattr(lc, "optical_flow_source", "gt"))
    if src.startswith("raft") and (
            getattr(lc, "temporal_consistency_weight", 0)
            or hasattr(interface, "forward_type")):
        from .raft import warm_teacher
        warm_teacher(src, getattr(lc, "raft_num_flow_updates", 12))

    def step(params, opt_state, batch: Dict[str, Array], key: Array,
             hyper_beta: Array):
        if sim_cfg is not None:
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(batch["video"].shape[0]))
            events, gt = synthesize_batch(
                batch["video"], keys, sim_cfg, num_bins, frames_per_bin,
                extra_frame=extra_frame, extra_evs=extra_evs,
                fixed_pos=batch.get("pos_thres"),
                fixed_neg=batch.get("neg_thres"))
            batch = dict(batch, events=events, frame=gt)
        batch = interface.prepare_flow(batch)
        b, _, h, w, _ = batch["events"].shape
        state0 = interface.init_state(b, h, w)

        drop_key = jax.random.fold_in(key, 0x5eed)

        def loss_fn(p):
            if "batch_stats" in p:
                # BN running stats are buffers: make their grads
                # structurally zero (live-stat normalization never uses
                # them, but state the invariant rather than rely on it)
                p = {**p, "batch_stats": jax.tree.map(
                    jax.lax.stop_gradient, p["batch_stats"])}
            if use_hyper:
                # GT-mixing curriculum (train_utils.py:307,328-342)
                pred, _, model_upd = interface.forward_sequence(
                    p, batch["events"], state0, train=True,
                    gt_frames=batch["frame"], hyper_beta=hyper_beta,
                    dropout_rng=drop_key, return_updates=True)
            else:
                pred, _, model_upd = interface.forward_sequence(
                    p, batch["events"], state0, train=True,
                    dropout_rng=drop_key, return_updates=True)
            loss, aux = interface.calc_loss(pred, batch)
            return loss, (aux, model_upd)

        ((loss, (aux, model_upd)),
         grads) = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if model_upd:
            # BatchNorm running stats are buffers, not parameters: the
            # optimizer never moves them (their grads are zero under
            # live-stat normalization); install the values accumulated
            # through the scan (torch nn.BatchNorm2d train semantics)
            params = dict(params)
            params["batch_stats"] = jax.tree.map(
                lambda new, old: jax.lax.stop_gradient(new).astype(old.dtype),
                model_upd["batch_stats"], params["batch_stats"])
        aux["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, loss, aux

    jitted = jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def wrapped(params, opt_state, batch, key, hyper_beta=0.0):
        return jitted(params, opt_state, batch, key,
                      jnp.float32(hyper_beta))

    wrapped._jitted = jitted    # AOT access (FLOP accounting, profiling)
    return wrapped


def make_eval_step(interface: ModelInterface):
    """Jitted streaming-eval step: forward a chunk with carried state
    (reset handled by the caller per sequence, test_e2vid.py:53-61)."""

    @jax.jit
    def step(params, events: Array, state: Any):
        return interface.forward_sequence(params, events, state, train=False)

    return step
