"""Drive the full flow eval harness (the test_flow.py path) on real
hardware at the MVSEC resolution (260x346) with synthetic h5 data and a
real checkpoint round-trip: flow_harness.main() -> ckpt_paths last line
-> load -> streaming eval -> metrics txt + CSV + flow PNG dump.

Covers BOTH flow-test data routes (reference test_flow.py +
train_flow_utils.py:305-326): a flow h5 scores against stored GT; a
reconstruction h5 (no flow key) scores against RAFT pseudo-GT predicted
from the T+1 GT frames (random-init teacher here — identical compute to
pretrained). This drive is what exposed the round-2 zeros-flow
placeholder parity bug.

Usage:
    python scripts/smoke_flow_tpu.py evflow   # EVFlowNet, 5 bins
    python scripts/smoke_flow_tpu.py eraft    # ERAFT warm-start, 15 bins

Env knobs: V2V_DRIVE_ROOT (default /tmp/flowdrive), V2V_DRIVE_HW
("260x346"; use e.g. "40x48" for a CPU smoke), V2V_DRIVE_EPF (events
per frame, default 10000). On CPU run with
`env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu`.
"""
import os
import sys

import numpy as np
import h5py

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROOT = os.environ.get("V2V_DRIVE_ROOT", "/tmp/flowdrive")
H, W = (int(x) for x in
        os.environ.get("V2V_DRIVE_HW", "260x346").split("x"))
EV_PER_FRAME = int(os.environ.get("V2V_DRIVE_EPF", "10000"))


def make_h5(path, n_frames, with_flow, events_per_frame=EV_PER_FRAME,
            seed=0):
    rng = np.random.RandomState(seed)
    n_ev = events_per_frame * n_frames
    ts = np.sort(rng.rand(n_ev)) * (n_frames / 24.0) + 10.0
    with h5py.File(path, "w") as f:
        f.create_dataset("events/ts", data=ts)
        f.create_dataset("events/xs",
                         data=rng.randint(0, W, n_ev).astype(np.uint16))
        f.create_dataset("events/ys",
                         data=rng.randint(0, H, n_ev).astype(np.uint16))
        f.create_dataset("events/ps",
                         data=rng.randint(0, 2, n_ev).astype(np.uint8))
        for i in range(n_frames):
            d = f.create_dataset(
                f"images/image{i:09d}",
                data=rng.randint(0, 255, (H, W), dtype=np.uint8))
            d.attrs["event_idx"] = i * events_per_frame
        if with_flow:
            for i in range(n_frames):
                d = f.create_dataset(
                    f"flow/flow{i:09d}",
                    data=(rng.randn(2, H, W) * 2).astype(np.float32))
                d.attrs["event_idx"] = i * events_per_frame
                d.attrs["image_idx"] = i
    return path


def build_workspace():
    os.makedirs(ROOT, exist_ok=True)
    recon = os.path.join(ROOT, "outdoor_day1.h5")
    flow = os.path.join(ROOT, "indoor_flying1.h5")
    if not os.path.exists(recon):
        make_h5(recon, n_frames=42, with_flow=False, seed=0)
    if not os.path.exists(flow):
        make_h5(flow, n_frames=42, with_flow=True, seed=1)
    with open(os.path.join(ROOT, "mvsec_recon.txt"), "w") as f:
        f.write(recon + "\n")
    with open(os.path.join(ROOT, "mvsec_flow.txt"), "w") as f:
        f.write(flow + "\n")


def config(family):
    recon_list = os.path.join(ROOT, "mvsec_recon.txt")
    flow_list = os.path.join(ROOT, "mvsec_flow.txt")
    if family == "evflow":
        bins = 5
        module = {
            "loss": {"l1_weight": 1.0, "optical_flow_source": "raft_large",
                     "raft_num_flow_updates": 12},
            "normalize_voxels": False,
            "model": {"target": "model.model.EVFlowNet", "params": {
                "unet_kwargs": {
                    "num_bins": 5, "base_num_channels": 32,
                    "num_encoders": 4, "num_residual_blocks": 2,
                    "num_output_channels": 2, "skip_type": "concat",
                    "norm": None, "use_upsample_conv": True,
                    "kernel_size": 3, "channel_multiplier": 2}}},
        }
        tests = [
            {"data_file": recon_list,
             "class_name": "data.testh5.TestH5Dataset",
             "dataset_name": "mvsec", "num_bins": bins,
             "sequence_length": 40, "interpolate_bins": True,
             "output_additional_frame": True, "image_range": 1,
             "max_samples": 2},
            {"data_file": flow_list,
             "class_name": "data.testh5.TestH5FlowDataset",
             "dataset_name": "mvsec", "num_bins": bins,
             "sequence_length": 40, "interpolate_bins": False,
             "output_additional_frame": True, "image_range": 1},
        ]
    else:
        bins = 15
        module = {
            "loss": {"l1_weight": 1.0, "optical_flow_source": "raft_large",
                     "raft_num_flow_updates": 12},
            "normalize_voxels": False,
            "forward_type": "eraft",
            "model": {"target": "model.eraft.eraft.ERAFT", "params": {
                "config": {"subtype": "warm_start"},
                "n_first_channels": bins}},
        }
        tests = [
            {"data_file": recon_list,
             "class_name": "data.testh5.TestH5Dataset",
             "dataset_name": "mvsec", "num_bins": bins,
             "sequence_length": 40, "interpolate_bins": True,
             "output_additional_frame": True,
             "output_additional_evs": True, "image_range": 1,
             "max_samples": 2},
        ]
    return {
        "experiment_name": f"{family}_tpu_smoke",
        "test_output_dir": f"results/{family}_tpu_smoke",
        "task": "flow", "save_png": True, "save_npy": False,
        "module": module,
        "test_stage": {"test_batch_size": 1, "test_num_workers": 2,
                       "test": tests},
    }, bins


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "evflow"
    build_workspace()
    cfg, bins = config(family)

    import jax
    from v2v_tpu.training.raft import seed_random_teacher
    seed_random_teacher("raft_large", 12)   # pseudo-GT without .pth
    from v2v_tpu.eval import flow_harness
    from v2v_tpu.training.checkpoint import (append_ckpt_path,
                                             save_checkpoint)
    from v2v_tpu.training.flow_interface import FlowModelInterface

    # real checkpoint round-trip: save random-init params, register in
    # ckpt_paths, let main() pick up the last line
    exp = cfg["experiment_name"]
    iface = FlowModelInterface(cfg["module"])
    params, _ = iface.init(jax.random.PRNGKey(0), 1, H, W, bins)
    ckpt_dir = os.path.join(ROOT, "checkpoints", exp)
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt = os.path.join(ckpt_dir, "epoch_0000.msgpack")
    save_checkpoint(ckpt, jax.tree.map(np.asarray, params), {"o": 0}, 0)
    append_ckpt_path(exp, ckpt, root=ROOT)

    flow_harness.main(cfg, root=ROOT)

    txt = os.path.join(ROOT, "tensorboard_logs", exp, "test_metrics.txt")
    body = open(txt).read()
    print(body)
    vals = [float(ln.split(": ")[1]) for ln in body.strip().splitlines()]
    assert vals and all(np.isfinite(v) for v in vals), vals
    assert any(v > 0 for v in vals), "all metrics zero (pseudo-GT dead?)"
    out = os.path.join(ROOT, "results", f"{family}_tpu_smoke", "MVSEC")
    seqs = os.listdir(out)
    assert seqs, out
    pngs = [f for s in seqs for f in os.listdir(os.path.join(out, s))
            if f.endswith("_flow.png")]
    assert pngs, "no flow PNGs dumped"
    print(f"{family}: OK — {len(vals)} finite metrics, "
          f"{len(pngs)} flow PNGs across {sorted(seqs)}")


if __name__ == "__main__":
    main()
