"""E2VID test harness: per-sequence streaming eval, image dump, metric
CSV, baseline comparison.

Rebuild of the reference test driver (test_e2vid.py): fixed sequence
registry, reset-on-sequence-change streaming state, ET-Net-compatible
metrics (eval/metrics.py), `test_metrics.txt` + cumulative
`all_test_results_new.csv` with skip-if-done bookkeeping, and
`beat_method` against the e2vid+ table.
"""
from __future__ import annotations

import os
from collections import defaultdict
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..data.interface import DataLoader, make_concat_multi_dataset
from ..data.sources import DATA_SOURCES
from ..training.checkpoint import all_ckpt_paths, load_params_only
from ..training.interface import ModelInterface
from ..training.steps import make_eval_step
from .metrics import mse as mse_fn
from .metrics import ssim as ssim_fn
from .references import beat_method

# The benchmark sequence registry (test_e2vid.py:26-37).
METRICS = ["MSE", "SSIM", "LPIPS"]
SEQUENCES = {
    "IJRR": ["boxes_6dof", "calibration", "dynamic_6dof", "office_zigzag",
             "poster_6dof", "shapes_6dof", "slider_depth"],
    "MVSEC": ["indoor_flying1", "indoor_flying2", "indoor_flying3",
              "indoor_flying4", "outdoor_day1", "outdoor_day2"],
    "HQF": ["bike_bay_hdr", "boxes", "desk", "desk_fast", "desk_hand_only",
            "desk_slow", "engineering_posters", "high_texture_plants",
            "poster_pillar_1", "poster_pillar_2", "reflective_materials",
            "slow_and_fast_desk", "slow_hand", "still_life"],
    "EVAID": ["ball", "bear", "box", "building", "outdoor", "playball",
              "room1", "sculpture", "toy", "traffic", "wall"],
}
ALL_METRIC_NAMES = [f"{ds}/{seq}/{m}" for ds, seqs in SEQUENCES.items()
                    for seq in seqs for m in METRICS]


def compute_metrics(iface: ModelInterface, pred_255: np.ndarray,
                    batch: Dict[str, Any]) -> Dict[str, list]:
    """Per-frame MSE/LPIPS/SSIM with the reference conventions
    (model/train_utils.py:212-248): computed in [0,1], SSIM with legacy
    data_range=2, LPIPS AlexNet. pred_255 (1,T,H,W,C) in [0,255]."""
    seq_name = batch["sequence_name"][0]
    src = DATA_SOURCES[int(batch["data_source_idx"][0])]
    prefix = f"{src.upper()}/{seq_name}"
    frames = np.asarray(batch["frame"])            # (1,T,H,W,C) in [0,255]
    t = frames.shape[1]
    out = defaultdict(list)
    pred01 = pred_255 / 255.0
    gt01 = frames / 255.0
    # chunk LPIPS over frames: all 80 frames of a 720p EVAID window at
    # once would hold ~19 GB of VGG activations
    lp_chunks = []
    for i in range(0, t, 8):
        lp_chunks.append(np.asarray(iface.lpips_test(
            jnp.asarray(pred01[0, i:i + 8]),
            jnp.asarray(gt01[0, i:i + 8]), True)))
    lp = np.concatenate(lp_chunks)                             # (T,)
    for ti in range(t):
        out[f"{prefix}/MSE"].append(mse_fn(pred01[0, ti], gt01[0, ti]))
        out[f"{prefix}/LPIPS"].append(float(lp[ti]))
        out[f"{prefix}/SSIM"].append(
            ssim_fn(pred01[0, ti, :, :, 0], gt01[0, ti, :, :, 0],
                    data_range=2))
    return out


def run_test(iface: ModelInterface, params, configs: Dict[str, Any],
             max_batches: Optional[int] = None, root: str = ".") -> Dict[str, float]:
    """Streaming evaluation over the test datasets (test_e2vid.py:39-110)."""
    dataset = make_concat_multi_dataset(configs["test_stage"]["test"])
    loader = DataLoader(dataset, batch_size=1, shuffle=False, drop_last=False,
                        num_workers=configs["test_stage"].get(
                            "test_num_workers", 2))
    eval_step = make_eval_step(iface)
    output_dir = configs.get("test_output_dir")

    prev_seq = None
    state = None
    output_img_idx = 0
    all_metrics: Dict[str, list] = defaultdict(list)
    # host metrics (per-frame SSIM/MSE) overlap the next batch's device
    # forward; scipy's uniform_filter releases the GIL. Results merge at
    # the end so ordering doesn't matter (means over frames).
    from concurrent.futures import ThreadPoolExecutor
    metric_pool = ThreadPoolExecutor(max_workers=4)
    metric_futures = []
    # build the lazy LPIPS on the main thread first: the property has no
    # lock, and racing futures would each construct a full LPIPS('alex')
    _ = iface.lpips_test

    for batch_idx, batch in enumerate(loader):
        if max_batches is not None and batch_idx >= max_batches:
            break
        seq_name = batch["sequence_name"][0]
        if iface.is_nernet:
            # raw (N,5) event streams, B=1 (data/testh5.py:305-380)
            events_list = batch["events"][0]
            h, w = batch["frame"].shape[2:4]
            b = 1
        else:
            events = jnp.asarray(batch["events"])
            b, t, h, w, _ = events.shape
        if prev_seq is None or prev_seq != seq_name:
            state = (iface.model.init_state(b, h, w) if iface.is_nernet
                     else iface.init_state(b, h, w))   # reset_states()
            output_img_idx = 0
            if output_dir is not None:
                src = DATA_SOURCES[int(batch["data_source_idx"][0])].upper()
                seq_dir = os.path.join(root, output_dir, src, seq_name)
                os.makedirs(seq_dir, exist_ok=True)
        if iface.is_nernet:
            pred, state = iface.forward_sequence_nernet(params, events_list,
                                                        state)
        else:
            pred, state = eval_step(params, events, state)
        pred = np.asarray(pred)
        if configs["test_stage"].get("need_multi_255", True):
            pred = pred * 255
        pred = np.clip(pred, 0, 255)

        if "frame" in batch:
            gt = np.asarray(batch["frame"])
            if pred.shape[-1] == 3 and gt.shape[-1] == 1:
                # gray-in-BGR-out (test_e2vid.py:79-82)
                pred = (0.5870 * pred[..., 0] + 0.1140 * pred[..., 1]
                        + 0.2989 * pred[..., 2])[..., None]
            metric_futures.append(metric_pool.submit(
                compute_metrics, iface, pred, batch))

        if output_dir is not None:
            import cv2
            for ti in range(pred.shape[1]):
                img = np.clip(pred[0, ti], 0, 255).astype(np.uint8).squeeze()
                cv2.imwrite(os.path.join(
                    seq_dir, f"{output_img_idx:06d}.png"), img)
                output_img_idx += 1
        prev_seq = seq_name

    for fut in metric_futures:
        for k, v in fut.result().items():
            all_metrics[k] += v
    metric_pool.shutdown()

    metric_txt = os.path.join(root, "tensorboard_logs",
                              configs["experiment_name"], "test_metrics.txt")
    os.makedirs(os.path.dirname(metric_txt), exist_ok=True)
    final: Dict[str, float] = {}
    with open(metric_txt, "w") as f:
        for k, v in all_metrics.items():
            final[k] = float(np.mean(v))
            print(f"{k}: {final[k]}")
            f.write(f"{k}: {final[k]}\n")
    beat_method(final, "e2vid+")
    return final


def run_single_test(checkpoint_path: Optional[str], config: Dict[str, Any],
                    max_batches: Optional[int] = None,
                    root: str = ".") -> Dict[str, float]:
    """(test_e2vid.py:177-194)"""
    import jax
    iface = ModelInterface(config["module"])
    # probe test data for shape
    dataset = make_concat_multi_dataset(config["test_stage"]["test"])
    probe = dataset[0]
    if iface.is_nernet:
        h, w = probe["frame"].shape[1:3]
        state = iface.model.init_state(1, h, w)
        dummy = jnp.zeros((1024, 5), jnp.float32)
        params = iface.model.init(jax.random.PRNGKey(0), dummy,
                                  jnp.int32(0), state)
    else:
        h, w = probe["events"].shape[1:3]
        num_bins = probe["events"].shape[-1]
        params, _ = iface.init(jax.random.PRNGKey(0), 1, h, w, num_bins)
    if checkpoint_path is not None:
        params = load_params_only(checkpoint_path, params)
        print("Loaded checkpoint:", checkpoint_path)
    return run_test(iface, params, config, max_batches=max_batches, root=root)


def main(config: Dict[str, Any], test_all_pths: bool = False,
         max_batches: Optional[int] = None, root: str = ".") -> None:
    """CSV bookkeeping + per-checkpoint testing (test_e2vid.py:113-175)."""
    assert config.get("task", "e2vid") == "e2vid"
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
            f.write("Checkpoint_path," + ",".join(ALL_METRIC_NAMES) + ",\n")

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
            for key in ALL_METRIC_NAMES:
                f.write(f"{result.get(key, '')},")
            f.write("\n")
