"""The minimum end-to-end slice (SURVEY.md §7): config YAML -> WebVid
reader -> fused device voxel synthesis -> scanned E2VID -> loss -> optax
step -> checkpoint + ckpt_paths protocol -> test harness with streaming
eval + CSV + beat_method."""
import os

import pytest

from test_data import make_hqf_h5, _write_video


@pytest.fixture
def workspace(tmp_path):
    # synthetic webvid
    root = tmp_path / "webvid"
    root.mkdir()
    n = _write_video(str(root / "v0.mp4"), n=40)
    video_list = tmp_path / "videos.txt"
    video_list.write_text(f"v0.mp4 {n}\n")
    webvid_root_file = tmp_path / "webvid_root.txt"
    webvid_root_file.write_text(str(root) + "\n")
    # synthetic hqf test set
    h5 = make_hqf_h5(str(tmp_path / "testseq.h5"), n_frames=7)
    h5_list = tmp_path / "hqf_test.txt"
    h5_list.write_text(h5 + "\n")
    return tmp_path, str(webvid_root_file), str(video_list), str(h5_list)


def make_config(tmp_path, webvid_root_file, video_list, h5_list):
    return {
        "experiment_name": "smoke_e2e",
        "check_val_every_n_epoch": 1,
        "test_output_dir": "results/smoke_e2e",
        "module": {
            "loss": {"l1_weight": 1.0},
            "normalize_voxels": False,
            "model": {
                "target": "model.model.E2VIDRecurrent",
                "params": {"unet_kwargs": {
                    "num_bins": 5, "skip_type": "sum",
                    "recurrent_block_type": "convlstm", "num_encoders": 3,
                    "base_num_channels": 4, "num_residual_blocks": 1,
                    "use_upsample_conv": True, "final_activation": "",
                    "norm": "none"}},
            },
        },
        "train_stages": [{
            "stage_name": "stage1", "max_epochs": 2,
            "optimizer": {"target": "torch.optim.Adam",
                          "params": {"lr": 0.001, "amsgrad": True}},
            "lr_scheduler": {"target": "torch.optim.lr_scheduler.StepLR",
                             "params": {"step_size": 50, "gamma": 1.0}},
            "dataset": {
                "train_batch_size": 2, "num_workers": 2, "val_batch_size": 1,
                "train": [{
                    "data_file": webvid_root_file,
                    "class_name": "data.v2v_datasets.WebvidDatasetV2",
                    "video_list_file": video_list,
                    "data_source_name": "webvid", "sequence_length": 3,
                    "crop_size": 32, "num_bins": 5, "min_resize_scale": 1,
                    "max_resize_scale": 1, "max_samples_per_shot": 4,
                    "threshold_range": [0.05, 2],
                    "base_noise_std_range": [0, 0.1],
                    "hot_pixel_std_range": [0, 10]}],
                "val": [{
                    "data_file": h5_list,
                    "class_name": "data.testh5.TestH5Dataset",
                    "dataset_name": "hqf", "num_bins": 5,
                    "sequence_length": 6, "image_range": 1}],
            },
        }],
        "test_stage": {
            "test_num_workers": 1,
            "test": [{
                "data_file": h5_list,
                "class_name": "data.testh5.TestH5Dataset",
                "dataset_name": "hqf", "num_bins": 5,
                "sequence_length": 6}],
        },
    }


def test_train_resume_and_eval(workspace):
    from v2v_tpu.training.train import main as train_main
    from v2v_tpu.training.checkpoint import all_ckpt_paths
    from v2v_tpu.eval.harness import main as test_main

    tmp_path, webvid_root_file, video_list, h5_list = workspace
    cfg = make_config(tmp_path, webvid_root_file, video_list, h5_list)
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "ckpt_paths"), exist_ok=True)

    out = train_main(cfg, max_batches_per_epoch=2, root=root)
    assert out["epoch"] == 2
    paths = all_ckpt_paths("smoke_e2e", root)
    assert len(paths) == 2 and paths[-1].endswith("epoch_0001.msgpack")
    assert os.path.exists(os.path.join(
        root, "tensorboard_logs", "smoke_e2e", "val_loss.txt"))

    # resume: raise max_epochs, training continues from epoch 2
    cfg["train_stages"][0]["max_epochs"] = 3
    out = train_main(cfg, max_batches_per_epoch=2, root=root)
    assert out["epoch"] == 3
    paths = all_ckpt_paths("smoke_e2e", root)
    assert paths[-1].endswith("epoch_0002.msgpack")

    # eval harness: last checkpoint, streaming state, CSV + metrics
    test_main(cfg, max_batches=2, root=root)
    csv = os.path.join(root, "tensorboard_logs", "smoke_e2e",
                       "all_test_results_new.csv")
    with open(csv) as f:
        lines = f.readlines()
    assert lines[0].startswith("Checkpoint_path,")
    assert lines[1].startswith("epoch_0002.msgpack,")
    metrics_txt = os.path.join(root, "tensorboard_logs", "smoke_e2e",
                               "test_metrics.txt")
    content = open(metrics_txt).read()
    assert "HQF/testseq/MSE" in content

    # test-all-checkpoints mode (test_e2vid.py argv[2]): every saved
    # checkpoint gets a CSV row, already-done rows skip on rerun
    test_main(cfg, test_all_pths=True, max_batches=2, root=root)
    with open(csv) as f:
        lines = f.readlines()
    rows = [ln.split(",")[0] for ln in lines[1:]]
    assert set(rows) == {"epoch_0000.msgpack", "epoch_0001.msgpack",
                         "epoch_0002.msgpack"}, rows
    # rerun: skip-if-done leaves the CSV unchanged
    test_main(cfg, test_all_pths=True, max_batches=2, root=root)
    assert len(open(csv).readlines()) == len(lines)
    assert "HQF/testseq/SSIM" in content
    # image dump
    dump_dir = os.path.join(root, "results", "smoke_e2e", "HQF", "testseq")
    assert len(os.listdir(dump_dir)) == 6


def test_flow_task_train_end_to_end(workspace):
    """Flow-task training through the full driver: WebVid video mode ->
    device synthesis with the extra GT frame -> RAFT pseudo-GT flow
    (random-init teacher) -> EVFlowNet scan -> optimizer -> validation
    (pseudo-GT fill over BOTH val variants: a no-flow TestH5Dataset and
    a flow h5, the RAFT source overwriting its stored GT —
    train_flow_utils.py:305-326) -> checkpoint. The reference path is
    train.py + FlowModelInterface (train_flow_utils.py:304-430)."""
    from v2v_tpu.training.raft import seed_random_teacher
    from v2v_tpu.training.train import main as train_main
    from v2v_tpu.training.checkpoint import all_ckpt_paths

    tmp_path, webvid_root_file, video_list, h5_list = workspace
    from test_data import make_hqf_h5
    flow_h5 = make_hqf_h5(str(tmp_path / "flowseq.h5"), n_frames=7,
                          with_flow=True)
    flow_list = tmp_path / "flow_val.txt"
    flow_list.write_text(flow_h5 + "\n")
    seed_random_teacher("raft_small", 2)

    cfg = make_config(tmp_path, webvid_root_file, video_list, h5_list)
    cfg["experiment_name"] = "smoke_flow"
    cfg["task"] = "flow"
    cfg["module"] = {
        "loss": {"l1_weight": 1.0, "optical_flow_source": "raft_small",
                 "raft_num_flow_updates": 2},
        "normalize_voxels": False,
        "forward_type": "evflow",
        "model": {"target": "model.model.EVFlowNet",
                  "params": {"unet_kwargs": {
                      "num_bins": 5, "num_encoders": 2,
                      "base_num_channels": 4, "num_residual_blocks": 1,
                      "kernel_size": 3, "skip_type": "concat",
                      "num_output_channels": 2}}},
    }
    train_block = cfg["train_stages"][0]["dataset"]["train"][0]
    train_block["output_additional_frame"] = True
    cfg["train_stages"][0]["max_epochs"] = 1
    cfg["train_stages"][0]["dataset"]["val"] = [
        {"data_file": h5_list,
         "class_name": "data.testh5.TestH5Dataset",
         "dataset_name": "hqf", "num_bins": 5, "sequence_length": 4,
         "output_additional_frame": True, "image_range": 1},
        {"data_file": str(flow_list),
         "class_name": "data.testh5.TestH5FlowDataset",
         "dataset_name": "mvsec", "num_bins": 5, "sequence_length": 4,
         "output_additional_frame": True},
    ]

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "ckpt_paths"), exist_ok=True)
    out = train_main(cfg, max_batches_per_epoch=2, root=root)
    assert out["epoch"] == 1
    paths = all_ckpt_paths("smoke_flow", root)
    assert len(paths) == 1
    # val ran over both variants: val_loss.txt written with finite loss
    val_txt = os.path.join(root, "tensorboard_logs", "smoke_flow",
                           "val_loss.txt")
    body = open(val_txt).read().strip()
    assert body
    import numpy as np
    assert np.isfinite(float(body.splitlines()[-1].split()[-1]))


def test_fixed_threshold_ablation_train(workspace):
    """train_ablation_e2vid_10k_fixed path: per-video thresholds stamped
    in the video list ('name frames pos neg',
    scripts/generate_random_thresholds.py) reach the device simulator."""
    from v2v_tpu.training.train import main as train_main

    tmp_path, webvid_root_file, video_list, h5_list = workspace
    # re-stamp the list with fixed thresholds
    name, frames = open(video_list).read().split()
    fixed_list = tmp_path / "videos_fixed.txt"
    fixed_list.write_text(f"{name} {frames} 0.31 0.47\n")

    cfg = make_config(tmp_path, webvid_root_file, str(fixed_list), h5_list)
    cfg["experiment_name"] = "smoke_fixed"
    cfg["train_stages"][0]["max_epochs"] = 1
    cfg["train_stages"][0]["dataset"]["val"] = []
    cfg["train_stages"][0]["dataset"]["train"][0][
        "use_fixed_thresholds"] = True

    # the dataset must flag fixed thresholds and ship them per sample
    from v2v_tpu.data.webvid import WebvidDataset
    webvid_root = open(webvid_root_file).read().strip()
    ds = WebvidDataset(webvid_root,
                       cfg["train_stages"][0]["dataset"]["train"][0]
                       | {"video_list_file": str(fixed_list)})
    assert ds.use_fixed_thresholds
    item = ds[0]
    assert abs(float(item["pos_thres"]) - 0.31) < 1e-6
    assert abs(float(item["neg_thres"]) - 0.47) < 1e-6

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "ckpt_paths"), exist_ok=True)
    out = train_main(cfg, max_batches_per_epoch=1, root=root)
    assert out["epoch"] == 1
