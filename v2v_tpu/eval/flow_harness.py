"""Optical-flow test harness (reference test_flow.py): MVSEC sequence
registry, EPE/NPE metrics, flow PNG/NPY dump, CSV bookkeeping."""
from __future__ import annotations

import os
from collections import defaultdict
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..data.interface import DataLoader, make_concat_multi_dataset
from ..data.sources import DATA_SOURCES
from ..training.checkpoint import all_ckpt_paths, load_params_only
from ..training.flow_interface import (FlowModelInterface, flow2rgb_np,
                                       flow_metrics)

FLOW_METRICS = ["dense_EPE", "dense_1PE", "dense_3PE",
                "sparse_EPE", "sparse_1PE", "sparse_3PE"]
FLOW_SEQUENCES = {
    "MVSEC": ["indoor_flying1", "indoor_flying2", "indoor_flying3",
              "outdoor_day1", "outdoor_day2"],
}
ALL_FLOW_METRIC_NAMES = [f"{ds}/{seq}/{m}"
                         for ds, seqs in FLOW_SEQUENCES.items()
                         for seq in seqs for m in FLOW_METRICS]


def run_test(iface: FlowModelInterface, params, configs: Dict[str, Any],
             max_batches: Optional[int] = None,
             root: str = ".") -> Dict[str, float]:
    dataset = make_concat_multi_dataset(configs["test_stage"]["test"])
    loader = DataLoader(dataset, batch_size=1, shuffle=False,
                        drop_last=False,
                        num_workers=configs["test_stage"].get(
                            "test_num_workers", 2))
    output_dir = configs.get("test_output_dir")
    save_npy = configs.get("save_npy", False)
    save_png = configs.get("save_png", True)

    prev_seq = None
    state = None
    output_img_idx = 0
    all_metrics: Dict[str, list] = defaultdict(list)

    # Datasets without GT flow (TestH5Dataset over the reconstruction
    # benchmarks) score against RAFT pseudo-GT predicted from the T+1
    # GT frames, exactly like the reference at test time
    # (train_flow_utils.py:307-321). Jitted (the teacher is ~1k ops —
    # eager dispatch would dominate); retraces once per frame shape.
    import jax

    @jax.jit
    def _pseudo_flow(frames):
        return iface.prepare_flow({"frame": frames}, test=True)["flow"]

    for batch_idx, batch in enumerate(loader):
        if max_batches is not None and batch_idx >= max_batches:
            break
        seq_name = batch["sequence_name"][0]
        events = jnp.asarray(batch["events"])
        b, t_in, h, w, _ = events.shape
        if prev_seq is None or prev_seq != seq_name:
            state = iface.init_state(b, h, w)
            output_img_idx = 0
            if output_dir is not None:
                src = DATA_SOURCES[int(batch["data_source_idx"][0])].upper()
                seq_dir = os.path.join(root, output_dir, src, seq_name)
                os.makedirs(seq_dir, exist_ok=True)
        pred, state = iface.forward_sequence(params, events, state)
        pred = np.asarray(pred)                       # (1,T,H,W,2)

        src = DATA_SOURCES[int(batch["data_source_idx"][0])]
        prefix = f"{src.upper()}/{seq_name}"
        t_out = pred.shape[1]
        # align events/gt with flow outputs (eraft drops the first voxel)
        ev = np.asarray(batch["events"])[:, -t_out:]
        if "flow" in batch:
            gt_full = np.asarray(batch["flow"])
        else:
            gt_full = np.asarray(
                _pseudo_flow(jnp.asarray(batch["frame"])))
        gt = gt_full[:, -t_out:]
        # accumulate every computed metric (the CSV writer later selects
        # the registry columns; test_metrics.txt keeps everything —
        # matches test_flow.py, which never filters here)
        for k, v in flow_metrics(pred, gt, ev, prefix).items():
            all_metrics[k] += v

        if output_dir is not None:
            import cv2
            for ti in range(t_out):
                flow = pred[0, ti]                    # (H,W,2)
                if save_npy:
                    np.save(os.path.join(
                        seq_dir, f"{output_img_idx:06d}.npy"),
                        flow.transpose(2, 0, 1))
                if save_png:
                    vis = flow2rgb_np(flow[..., 0], flow[..., 1])
                    cv2.imwrite(os.path.join(
                        seq_dir, f"{output_img_idx:06d}_flow.png"), vis)
                output_img_idx += 1
        prev_seq = seq_name

    metric_txt = os.path.join(root, "tensorboard_logs",
                              configs["experiment_name"], "test_metrics.txt")
    os.makedirs(os.path.dirname(metric_txt), exist_ok=True)
    final: Dict[str, float] = {}
    with open(metric_txt, "w") as f:
        for k, v in all_metrics.items():
            final[k] = float(np.mean(v))
            print(f"{k}: {final[k]}")
            f.write(f"{k}: {final[k]}\n")
    return final


def run_single_test(checkpoint_path: Optional[str], config: Dict[str, Any],
                    max_batches: Optional[int] = None,
                    root: str = ".") -> Dict[str, float]:
    import jax
    iface = FlowModelInterface(config["module"])
    dataset = make_concat_multi_dataset(config["test_stage"]["test"])
    probe = dataset[0]
    h, w = probe["events"].shape[1:3]
    num_bins = probe["events"].shape[-1]
    params, _ = iface.init(jax.random.PRNGKey(0), 1, h, w, num_bins)
    if checkpoint_path is not None:
        params = load_params_only(checkpoint_path, params)
        print("Loaded checkpoint:", checkpoint_path)
    return run_test(iface, params, config, max_batches=max_batches, root=root)


def main(config: Dict[str, Any], test_all_pths: bool = False,
         max_batches: Optional[int] = None, root: str = ".") -> None:
    assert config.get("task") == "flow", "e2vid should use test_e2vid.py"
    exp = config["experiment_name"]
    output_csv = os.path.join(root, "tensorboard_logs", exp,
                              "all_test_results_new.csv")
    os.makedirs(os.path.dirname(output_csv), exist_ok=True)
    done = []
    if os.path.exists(output_csv):
        with open(output_csv) as f:
            done = [ln.split(",")[0] for ln in f.readlines()[1:]]
    else:
        with open(output_csv, "w") as f:
            f.write("Checkpoint_path," + ",".join(ALL_FLOW_METRIC_NAMES)
                    + ",\n")
    paths = all_ckpt_paths(exp, root)
    if not paths:
        print("No checkpoint paths file found or it is empty.")
        return
    if not test_all_pths:
        paths = paths[-1:]
    for path in paths:
        subpath = path.split("/")[-1]
        if test_all_pths and subpath in done:
            continue
        result = run_single_test(path, config, max_batches=max_batches,
                                 root=root)
        with open(output_csv, "a") as f:
            f.write(subpath + ",")
            for key in ALL_FLOW_METRIC_NAMES:
                f.write(f"{result.get(key, '')},")
            f.write("\n")
