"""Flagship train-step benchmark (sim + E2VID T=40 scan fwd/bwd +
LPIPS-VGG + L1 + TC with RAFT-small teacher + Adam, B=12, 128^2, bf16)
— the 0.90 s/step headline in docs/PERF.md, as a repeatable harness.

The RAFT teacher runs with randomly initialized weights (none exist
offline) — identical compute/memory to pretrained ones.

Usage:
    timeout 560 python -u scripts/bench_full_step.py \
        [--lpips-remat full|none] [--remat-policy full|convs]
        [--chunk N] [--steps 5]

Each step is one fused jit dispatch; warm median wall time with a host
scalar fetch as the sync (the jit is a single dispatch, so host timing
is honest here — see .claude/skills/verify/SKILL.md). Loss is printed so
variants can be checked bit-identical.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="train config YAML: bench its module block + "
                         "batch size instead of the built-in flagship")
    ap.add_argument("--lpips-remat", default="full")
    ap.add_argument("--remat-policy", default="full")
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--scan-split", default="on", choices=["on", "off"],
                    help="forward-split path (spine-only scan + T-batched "
                         "pre/tail; interface._forward_split) — 'off' "
                         "forces the original full-body scan")
    ap.add_argument("--flow", default=None,
                    help="raft_small|raft_large|zeros; overrides the "
                         "config's optical_flow_source (teacher ablation)")
    ap.add_argument("--flops", action="store_true",
                    help="print the step's HLO cost analysis (FLOPs) from "
                         "jit lowering — no device compile needed, runs "
                         "on CPU; combine with a measured ms/step for the "
                         "roofline table in docs/PERF.md")
    ap.add_argument("--flops-only", action="store_true",
                    help="--flops without running/compiling the step "
                         "(CPU-safe FLOP accounting)")
    ap.add_argument("--ab-split", action="store_true",
                    help="run scan_split on THEN off in ONE process "
                         "(one relay session, so the comparison is free "
                         "of session drift)")
    args = ap.parse_args()
    if args.ab_split:
        for mode in ("on", "off"):
            args.scan_split = mode
            run(args)
    else:
        run(args)


def build(args):
    """Construct the fused train step + inputs for a config (shared
    with scripts/roofline_floor.py). Returns
    (name, step, params, opt_state, batch, key, step_kwargs, dims)."""
    if args.chunk:
        os.environ["V2V_LPIPS_CHUNK"] = str(args.chunk)

    import jax
    import jax.numpy as jnp
    from v2v_tpu.ops.voxel import SimConfig
    from v2v_tpu.training.interface import ModelInterface
    from v2v_tpu.training.optim import Adam
    from v2v_tpu.training.steps import make_train_step

    b, t, bins, h, w = 12, 40, 5, 128, 128
    task = "e2vid"
    extra_frame = extra_evs = False
    if args.config:
        from v2v_tpu.config import load_yaml
        full = load_yaml(args.config)
        task = full.get("task", "e2vid")
        cfg = dict(full["module"])
        stage = full["train_stages"][0]
        b = stage["dataset"]["train_batch_size"]
        dtrain = stage["dataset"]["train"][0]
        t = dtrain.get("sequence_length", 40)
        bins = dtrain.get("num_bins", 5)
        h = w = dtrain.get("crop_size", 128)
        extra_frame = dtrain.get("output_additional_frame", False)
        extra_evs = dtrain.get("output_additional_evs", False)
        if args.flow is None:
            args.flow = cfg.get("loss", {}).get("optical_flow_source",
                                                "raft_small")
        else:                       # explicit ablation override
            cfg.setdefault("loss", {})["optical_flow_source"] = args.flow
        name = os.path.basename(args.config)
    else:
        name = "flagship-e2vid"
        args.flow = args.flow or "raft_small"
        cfg = {
            "loss": {"lpips_weight": 1.0, "lpips_type": "vgg",
                     "lpips_remat": args.lpips_remat, "l1_weight": 1.0,
                     "temporal_consistency_weight": 1.0,
                     "temporal_consistency_L0": 20,
                     "optical_flow_source": args.flow},
            "normalize_voxels": False,
            "compute_dtype": "bfloat16",
            "remat_policy": args.remat_policy,
            "model": {"target": "model.model.E2VIDRecurrent",
                      "params": {"unet_kwargs": {
                          "num_bins": bins, "skip_type": "sum",
                          "recurrent_block_type": "convlstm",
                          "num_encoders": 3, "base_num_channels": 32,
                          "num_residual_blocks": 2,
                          "use_upsample_conv": True,
                          "final_activation": "", "norm": "none"}}},
        }
    if args.flow.startswith("raft"):
        # random-weight teacher: same compute as pretrained
        from v2v_tpu.training import raft as raft_mod
        raft_mod.seed_random_teacher(
            args.flow, int(cfg.get("loss", {}).get("raft_num_flow_updates",
                                                   12)))

    if getattr(args, "scan_split", "on") == "off":
        cfg["scan_split"] = False
    if task == "flow":
        from v2v_tpu.training.flow_interface import FlowModelInterface
        iface = FlowModelInterface(cfg)
    else:
        iface = ModelInterface(cfg)
    params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
    if args.config:
        from v2v_tpu.training.train import make_optimizer
        opt = make_optimizer(stage["optimizer"]).make()
    else:
        opt = Adam(lr=1e-4, amsgrad=True).make()
    opt_state = opt.init(params)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(),
                           num_bins=bins, extra_frame=extra_frame,
                           extra_evs=extra_evs, donate=False)
    step_kwargs = ({"hyper_beta": 0.5}
                   if getattr(iface, "hyper_epochs", 0) else {})

    rng = np.random.RandomState(0)
    n = (t + (1 if extra_evs else 0)) * bins + 1
    base = rng.randint(0, 255, (b, 1, h, w)).astype(np.float32)
    drift = np.cumsum(rng.randn(b, n, h, w) * 4, axis=1)
    video = np.clip(base + drift, 0, 255).astype(np.uint8)
    batch = {"video": jnp.asarray(video),
             "data_source_idx": jnp.full((b,), 11, jnp.int32)}

    key = jax.random.PRNGKey(1)
    return (name, step, params, opt_state, batch, key, step_kwargs,
            (b, t, h, w))


def run(args):
    import jax
    import jax.numpy as jnp
    (name, step, params, opt_state, batch, key, step_kwargs,
     (b, t, h, w)) = build(args)
    if args.flops or args.flops_only:
        # algorithmic MXU FLOPs of the step as authored (remat recompute
        # included — it is explicit in the jaxpr; scan bodies multiplied
        # by length, which XLA's own cost analysis gets wrong). Trace
        # only: no device compile, so this also runs CPU-only.
        from v2v_tpu.utils.flops import (count_flops_by_shape,
                                         step_flops)
        hb = jnp.float32(step_kwargs.get("hyper_beta", 0.0))
        jxp = jax.make_jaxpr(step._jitted)(params, opt_state, batch,
                                           key, hb)
        from v2v_tpu.utils.flops import count_flops
        flops = count_flops(jxp)
        print(f"{name} (B={b}, {t}x{h}x{w}): {flops / 1e12:.3f} "
              f"MXU TFLOP/step (jaxpr accounting)", flush=True)
        if os.environ.get("V2V_FLOPS_HIST"):
            hist = count_flops_by_shape(jxp)
            for k, v in sorted(hist.items(), key=lambda kv: -kv[1])[:40]:
                print(f"  {v / 1e12:7.3f} TF  {v / flops * 100:5.1f}%  {k}",
                      flush=True)
        if args.flops_only:
            return
    params, opt_state, loss, _ = step(params, opt_state, batch, key,
                                      **step_kwargs)
    print(f"compile ok, first loss {float(loss):.6f}", flush=True)
    ts = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        params, opt_state, loss, _ = step(params, opt_state, batch, key,
                                          **step_kwargs)
        l = float(loss)                     # sync
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name} (B={b}, {t}x{h}x{w}) lpips_remat={args.lpips_remat} "
          f"remat_policy={args.remat_policy} chunk={args.chunk or 'auto'} "
          f"scan_split={getattr(args, 'scan_split', 'on')} "
          f"flow={args.flow}: {med * 1e3:.0f} ms/step (all: "
          f"{', '.join(f'{x * 1e3:.0f}' for x in ts)}), "
          f"last loss {l:.6f}", flush=True)


if __name__ == "__main__":
    main()
