"""Streaming-inference latency of the model zoo at the real benchmark
resolutions — the serving-side numbers (ms/frame, fps) that the quality
harness doesn't report.

Each family runs the SAME jitted eval step the test harness uses
(ModelInterface.forward_sequence train=False: pad x16 -> lax.scan with
carried recurrent state -> crop), B=1 streaming, random weights (same
compute as converted checkpoints), T-frame windows with the state
carried dispatch-to-dispatch like the streaming harness does.

Timing discipline (see .claude/skills/verify/SKILL.md): the scan inside
one dispatch is already a device-side dependency chain over T frames;
sync is a host scalar fetch. Per-frame cost = window time / T, so the
~10-20 ms relay dispatch overhead is amortized over the window exactly
as in production streaming eval.

Resolutions: IJRR 180x240, MVSEC 260x346, HQF 180x240, EVAID 720p
(ETNet's 720p number lives in docs/PERF.md, measured separately).

Usage: timeout 1500 python -u scripts/bench_eval.py [families...]
       families in {e2vid, e2vid++, firenet, etnet, hyper, eraft};
       default all. Prints one table row per (family, resolution, dtype).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = 40          # frames per eval window (test harness chunk)
REPS = 5


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FAMILIES = ("e2vid", "e2vid++", "firenet", "etnet", "hyper", "eraft",
            "evflow")


def load_module_cfg(path):
    from v2v_tpu.config import load_yaml
    return load_yaml(os.path.join(REPO, path))["module"]


def bench_family(name, module_cfg, resolutions, num_bins=5,
                 flow=False, dtypes=("float32", "bfloat16")):
    import jax
    import jax.numpy as jnp
    from v2v_tpu.training.interface import ModelInterface
    from v2v_tpu.training.flow_interface import FlowModelInterface

    def cast_tree(tree, dt):
        return jax.tree.map(
            lambda x: x.astype(dt) if hasattr(x, "dtype")
            and jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

    rows = []
    for dtype in dtypes:
        cfg = dict(module_cfg)
        cfg.pop("loss", None)          # inference only
        iface = (FlowModelInterface if flow else ModelInterface)(cfg)
        step = jax.jit(lambda p, ev, st: iface.forward_sequence(
            p, ev, st, train=False))
        for tag, h, w in resolutions:
            params, _ = iface.init(jax.random.PRNGKey(0), 1, h, w, num_bins)
            state = iface.init_state(1, h, w)
            rng = np.random.RandomState(0)
            t_in = T + 1 if flow else T   # ERAFT: pairs need T+1 voxels
            events = jnp.asarray(rng.randint(
                -3, 4, (1, t_in, h, w, num_bins)).astype(np.float32))
            if dtype != "float32":
                # the serving-style low-precision configuration: cast
                # weights, state, and input (compute_dtype only governs
                # the train path; forward_sequence(train=False) runs in
                # the dtypes it is handed)
                dt = jnp.dtype(dtype)
                params = cast_tree(params, dt)
                events = events.astype(dt)
                try:
                    pred, state_out = step(params, events,
                                           cast_tree(state, dt))
                except TypeError:
                    # models whose carry math promotes to f32 internally
                    # (e.g. ERAFT's warm-start coordinate arithmetic)
                    # keep an f32 carry; weights/activations still bf16
                    pred, state_out = step(params, events, state)
            else:
                pred, state_out = step(params, events, state)
            float(jnp.sum(pred.astype(jnp.float32)))   # compile + sync
            ts = []
            st = state_out                 # carry state across dispatches
            for _ in range(REPS):
                t0 = time.perf_counter()
                pred, st = step(params, events, st)
                float(jnp.sum(pred.astype(jnp.float32)))  # the only
                ts.append(time.perf_counter() - t0)       # reliable sync
            med = sorted(ts)[len(ts) // 2]
            ms = med / T * 1e3
            rows.append((name, tag, f"{h}x{w}", dtype, ms, 1e3 / ms))
            print(f"{name:10s} {tag:6s} {h}x{w:<4d} {dtype:9s} "
                  f"{ms:7.2f} ms/frame  {1e3 / ms:7.1f} fps", flush=True)
    return rows


IJRR = ("ijrr", 180, 240)
MVSEC = ("mvsec", 260, 346)


def main(families):
    cfgs = "configs"
    all_rows = []
    if "e2vid" in families:
        all_rows += bench_family(
            "e2vid", load_module_cfg(f"{cfgs}/train_v2v_e2vid_10k.yaml"),
            [IJRR, MVSEC])
    if "e2vid++" in families:
        all_rows += bench_family(
            "e2vid++", load_module_cfg(f"{cfgs}/test_e2vid++_original.yaml"),
            [IJRR, MVSEC])
    if "firenet" in families:
        all_rows += bench_family(
            "firenet",
            {"model": {"target": "model.model.FireNet",
                       "params": {"unet_kwargs": {
                           "num_bins": 5, "base_num_channels": 16,
                           "kernel_size": 3}}}},
            [IJRR, MVSEC])
    if "etnet" in families:
        all_rows += bench_family(
            "etnet", load_module_cfg(f"{cfgs}/test_etnet_original.yaml"),
            [IJRR])
    if "hyper" in families:
        all_rows += bench_family(
            "hyper",
            load_module_cfg(f"{cfgs}/test_hypere2vid_original.yaml"),
            [IJRR, MVSEC])
    if "eraft" in families:
        all_rows += bench_family(
            "eraft", load_module_cfg(f"{cfgs}/test_eraft_original.yaml"),
            [MVSEC], num_bins=15, flow=True)
    if "evflow" in families:
        all_rows += bench_family(
            "evflow", load_module_cfg(f"{cfgs}/test_evflow_original.yaml"),
            [IJRR, MVSEC], flow=True)
    print("\nname,dataset,resolution,dtype,ms_per_frame,fps")
    for r in all_rows:
        print(f"{r[0]},{r[1]},{r[2]},{r[3]},{r[4]:.2f},{r[5]:.1f}")


if __name__ == "__main__":
    fams = sys.argv[1:] or list(FAMILIES)
    unknown = set(fams) - set(FAMILIES)
    if unknown:
        sys.exit(f"unknown families {sorted(unknown)}; "
                 f"choose from {FAMILIES}")
    main(fams)
