"""Generate the experiment config YAMLs (configs/).

The config schema is the reference's public API (README.md:9-13); this
script emits the full experiment set — 5 V2V train configs, 4 ablations,
7 original-checkpoint test configs — from compact specs so hyper-
parameters live in one place. Run: python scripts/generate_configs.py
"""
import copy
import os

import yaml

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs")

# ---------------------------------------------------------------------------
# shared blocks
# ---------------------------------------------------------------------------

E2VID_UNET = {
    "num_bins": 5, "skip_type": "sum", "recurrent_block_type": "convlstm",
    "num_encoders": 3, "base_num_channels": 32, "num_residual_blocks": 2,
    "use_upsample_conv": True, "final_activation": "", "norm": "none",
}

RECON_TRAIN_LOSS = {
    "lpips_weight": 1.0, "lpips_type": "vgg", "l2_weight": 0,
    "l1_weight": 1.0, "ssim_weight": 0, "temporal_consistency_weight": 1.0,
    "optical_flow_source": "raft_small", "temporal_consistency_L0": 20,
}

RECON_TEST_LOSS = {
    "lpips_weight": 1.0, "lpips_type": "alex", "l2_weight": 0,
    "l1_weight": 0, "ssim_weight": 0, "temporal_consistency_weight": 1.0,
}

FLOW_LOSS = {"l1_weight": 1.0, "optical_flow_source": "raft_large",
             "raft_num_flow_updates": 12}


def webvid_train(video_list="configs/webvid10000_unfiltered.txt", **extra):
    block = {
        "data_file": "configs/webvid_root.txt",
        "class_name": "data.v2v_datasets.WebvidDatasetV2",
        "video_list_file": video_list,
        "data_source_name": "webvid", "video_reader": "opencv",
        "sequence_length": 40, "pause_granularity": 5,
        "proba_pause_when_running": 0.0102,
        "proba_pause_when_paused": 0.9791,
        "crop_size": 128, "random_flip": True, "num_bins": 5,
        "min_resize_scale": 1, "max_resize_scale": 1, "frames_per_bin": 1,
        "threshold_range": [0.05, 2], "max_thres_pos_neg_gap": 1.5,
        "base_noise_std_range": [0, 0.1], "hot_pixel_std_range": [0, 10],
        "max_samples_per_shot": 10,
    }
    block.update(extra)
    return block


def h5_block(name, seq_len=80, interpolate=False, **extra):
    block = {
        "data_file": f"configs/{name}_test.txt",
        "class_name": "data.testh5.TestH5Dataset",
        "dataset_name": name, "num_bins": 5, "sequence_length": seq_len,
        "interpolate_bins": interpolate,
    }
    block.update(extra)
    return block


def val_blocks(interpolate=False, **extra):
    out = []
    for name in ("evaid", "ijrr", "hqf", "mvsec"):
        b = h5_block(name, interpolate=interpolate, image_range=1, **extra)
        if name == "evaid":
            b["max_samples"] = 1    # 720p val is slow
        out.append(b)
    return out


def test_blocks(interpolate, **extra):
    return [h5_block(name, interpolate=interpolate, **extra)
            for name in ("evaid", "ijrr", "hqf", "mvsec")]


def flow_test_fixups(blocks):
    """Reference-parity quirks of the FLOW test configs
    (test_{evflow,eraft}_original.yaml — round-5 rehearsal finding):

      * EVAID runs sequence_length 10, not 80 (reference :31-32): the
        RAFT-family all-pairs correlation is quadratic in 1/8-scale
        tokens, so 720p windows must stay short;
      * MVSEC scores against STORED GT flow — TestH5FlowDataset over
        mvsec_test_flow.txt with unbounded samples (reference :58-67),
        while the other three datasets use pseudo-GT with
        max_samples: 2.
    """
    out = []
    for b in blocks:
        b = dict(b)
        if b["dataset_name"] == "evaid":
            b["sequence_length"] = 10
        if b["dataset_name"] == "mvsec":
            b["data_file"] = "configs/mvsec_test_flow.txt"
            b["class_name"] = "data.testh5.TestH5FlowDataset"
            b.pop("max_samples", None)
        out.append(b)
    return out


def stage(max_epochs, lr, optimizer="torch.optim.Adam", weight_decay=0,
          scheduler=("torch.optim.lr_scheduler.StepLR",
                     {"step_size": 50, "gamma": 1.0}),
          batch_size=12, num_workers=9, train=None, val=None):
    return {
        "stage_name": "stage1", "max_epochs": max_epochs,
        "optimizer": {"target": optimizer,
                      "params": {"lr": lr, "weight_decay": weight_decay,
                                 "amsgrad": True}},
        "lr_scheduler": {"target": scheduler[0], "params": scheduler[1]},
        "dataset": {
            "train_batch_size": batch_size, "num_workers": num_workers,
            "val_batch_size": 1, "persistent_workers": True,
            "pin_memory": True,
            "train": train, "val": val,
        },
    }


def train_config(name, model, loss, stages, **top):
    cfg = {
        "experiment_name": name, "check_val_every_n_epoch": 1,
        "test_output_dir": f"results/{name}", "use_compile": False,
        "module": {"loss": loss, "normalize_voxels": False, "model": model},
        "train_stages": stages,
        "test_stage": {"test_batch_size": 1, "test_num_workers": 4,
                       "test": test_blocks(False)},
    }
    cfg.update(top)
    # compute_dtype is a v2v_tpu extension over the reference schema:
    # bf16 recurrent forward/backward (master params, BN stats and the
    # loss stay f32) — the MXU-native mixed precision the measured step
    # times assume. Delete the key for exact-f32 training like the
    # reference. Flow-task training casts the same way
    # (FlowModelInterface._cast_compute); before round 3 it silently
    # ran f32 (docs/PERF.md dtype census).
    cfg["module"]["compute_dtype"] = "bfloat16"
    return cfg


def test_config(name, model, loss, tests, **top):
    cfg = {
        "experiment_name": name,
        "test_output_dir": f"results/{name}",
        "module": {"loss": loss, "normalize_voxels": False, "model": model},
        "test_stage": {"test_batch_size": 1, "test_num_workers": 4,
                       "test": tests},
    }
    cfg.update(top)
    return cfg


CONFIGS = {}

# ---- V2V train configs (README.md:17-24) ---------------------------------
CONFIGS["train_v2v_e2vid_10k"] = train_config(
    "v2v_e2vid_10k",
    {"target": "model.model.E2VIDRecurrent",
     "params": {"unet_kwargs": dict(E2VID_UNET)}},
    dict(RECON_TRAIN_LOSS),
    [stage(80, 0.0001, train=[webvid_train()], val=val_blocks())])

CONFIGS["train_v2v_etnet_10k"] = train_config(
    "v2v_etnet_10k",
    {"target": "model.eitr.eitr.EITR",
     "params": {"eitr_kwargs": {"num_bins": 5, "norm": "none"}}},
    dict(RECON_TRAIN_LOSS),
    [stage(100, 0.0002, optimizer="torch.optim.AdamW", weight_decay=0.01,
           scheduler=("torch.optim.lr_scheduler.ExponentialLR",
                      {"gamma": 0.94}),
           batch_size=6,
           train=[webvid_train("configs/webvid10000_filtered.txt")],
           val=val_blocks())])

CONFIGS["train_v2v_hyper_10k"] = train_config(
    "v2v_hyper_10k",
    {"target": "model.hyper_model.HyperE2VID",
     "params": {"unet_kwargs": dict(E2VID_UNET, kernel_size=5,
                                    channel_multiplier=2,
                                    num_output_channels=1,
                                    use_dynamic_decoder=True)}},
    dict(RECON_TRAIN_LOSS),
    [stage(80, 0.001, train=[webvid_train()], val=val_blocks())])
CONFIGS["train_v2v_hyper_10k"]["module"]["hyper_epochs"] = 16
del CONFIGS["train_v2v_hyper_10k"]["module"]["model"]["params"][
    "unet_kwargs"]["final_activation"]

EVFLOW_UNET = {
    "num_bins": 5, "base_num_channels": 32, "num_encoders": 4,
    "num_residual_blocks": 2, "num_output_channels": 2,
    "skip_type": "concat", "norm": None, "use_upsample_conv": True,
    "kernel_size": 3, "channel_multiplier": 2,
}

CONFIGS["train_v2v_evflow_10k"] = train_config(
    "v2v_evflow_10k",
    {"target": "model.model.EVFlowNet",
     "params": {"unet_kwargs": dict(EVFLOW_UNET)}},
    dict(FLOW_LOSS),
    [stage(50, 0.0001, batch_size=10, num_workers=10,
           train=[webvid_train("configs/webvid10000_full.txt",
                               output_additional_frame=True)],
           val=[h5_block("hqf", image_range=1, max_samples=1,
                         output_additional_frame=True),
                {"data_file": "configs/mvsec_test_flow.txt",
                 "class_name": "data.testh5.TestH5FlowDataset",
                 "dataset_name": "mvsec", "num_bins": 5,
                 "sequence_length": 80, "interpolate_bins": False,
                 "output_additional_frame": True, "image_range": 1}])],
    task="flow", save_npy=False, save_png=True)
CONFIGS["train_v2v_evflow_10k"]["test_stage"]["test"] = test_blocks(
    True, output_additional_frame=True, image_range=1)

CONFIGS["train_v2v_eraft_10k"] = train_config(
    "v2v_eraft_10k",
    {"target": "model.eraft.eraft.ERAFT",
     "params": {"config": {"subtype": "warm_start"}, "n_first_channels": 5}},
    dict(FLOW_LOSS),
    [stage(50, 0.0001, batch_size=10, num_workers=10,
           train=[webvid_train(output_additional_frame=True,
                               output_additional_evs=True)],
           val=[h5_block("hqf", image_range=1, max_samples=1,
                         output_additional_frame=True,
                         output_additional_evs=True),
                {"data_file": "configs/mvsec_test_flow.txt",
                 "class_name": "data.testh5.TestH5FlowDataset",
                 "dataset_name": "mvsec", "num_bins": 5,
                 "sequence_length": 80, "interpolate_bins": False,
                 "output_additional_frame": True,
                 "output_additional_evs": True, "image_range": 1}])],
    task="flow", save_npy=False, save_png=True)
CONFIGS["train_v2v_eraft_10k"]["module"]["forward_type"] = "eraft"
CONFIGS["train_v2v_eraft_10k"]["test_stage"]["test"] = test_blocks(
    True, output_additional_frame=True, output_additional_evs=True,
    image_range=1, max_samples=2)

# ---- ablation train configs ----------------------------------------------
_abl = copy.deepcopy(CONFIGS["train_v2v_e2vid_10k"])
_abl["experiment_name"] = "ablation_e2vid_10k_fixed"
_abl["test_output_dir"] = "results/ablation_e2vid_10k_fixed"
_abl["train_stages"][0]["dataset"]["train"][0].update(
    {"use_fixed_thresholds": True,
     "video_list_file": "configs/webvid10000_fixed_thresholds.txt"})
CONFIGS["train_ablation_e2vid_10k_fixed"] = _abl

_abl = copy.deepcopy(CONFIGS["train_v2v_e2vid_10k"])
_abl["experiment_name"] = "ablation_e2vid_filtered"
_abl["test_output_dir"] = "results/ablation_e2vid_filtered"
_abl["train_stages"][0]["dataset"]["train"][0][
    "video_list_file"] = "configs/webvid10000_filtered.txt"
CONFIGS["train_ablation_e2vid_filtered"] = _abl

_abl = copy.deepcopy(CONFIGS["train_v2v_e2vid_10k"])
_abl["experiment_name"] = "ablation_e2vid_hdr"
_abl["test_output_dir"] = "results/ablation_e2vid_hdr"
_abl["train_stages"][0]["dataset"]["train"][0].update(
    {"video_degrade": "hdr", "degrade_ratio": 0.5})
CONFIGS["train_ablation_e2vid_hdr"] = _abl

_abl = copy.deepcopy(CONFIGS["train_v2v_e2vid_10k"])
_abl["experiment_name"] = "ablation_e2vid_esim"
_abl["test_output_dir"] = "results/ablation_e2vid_esim"
_abl["train_stages"][0]["dataset"]["train"] = [{
    "data_file": "configs/esim_h5.txt",
    "class_name": "data.esim_dataset.ESIMH5Dataset",
    "data_source_name": "esim", "sequence_length": 40,
    "proba_pause_when_running": 0.05, "proba_pause_when_paused": 0.9,
    "noise_std": 0.1, "noise_fraction": 1.0, "hot_pixel_std": 0.1,
    "max_hot_pixel_fraction": 0.001, "random_crop_size": 128,
    "random_flip": True}]
_abl["train_stages"][0]["dataset"]["val"] = val_blocks(interpolate=True)
CONFIGS["train_ablation_e2vid_esim"] = _abl

# ---- original-checkpoint test configs ------------------------------------
CONFIGS["test_e2vid++_original"] = test_config(
    "e2vid++_original",
    {"target": "model.model.FlowNet",
     "params": {"unet_kwargs": dict(E2VID_UNET, num_output_channels=3)}},
    dict(RECON_TEST_LOSS), test_blocks(True))
del CONFIGS["test_e2vid++_original"]["module"]["model"]["params"][
    "unet_kwargs"]["final_activation"]

CONFIGS["test_etnet_original"] = test_config(
    "etnet_original",
    {"target": "model.eitr.eitr.EITR",
     "params": {"eitr_kwargs": {"num_bins": 5, "norm": "none"}}},
    dict(RECON_TEST_LOSS), test_blocks(True))

CONFIGS["test_hypere2vid_original"] = test_config(
    "hypere2vid_original",
    {"target": "model.hyper_model.HyperE2VID",
     "params": {"unet_kwargs": dict(E2VID_UNET, kernel_size=5,
                                    channel_multiplier=2,
                                    num_output_channels=1,
                                    use_dynamic_decoder=True)}},
    dict(RECON_TEST_LOSS), test_blocks(True))
del CONFIGS["test_hypere2vid_original"]["module"]["model"]["params"][
    "unet_kwargs"]["final_activation"]

CONFIGS["test_evflow_original"] = test_config(
    "evflow_original",
    {"target": "model.model.EVFlowNet",
     "params": {"unet_kwargs": dict(EVFLOW_UNET)}},
    dict(FLOW_LOSS),
    flow_test_fixups(test_blocks(True, output_additional_frame=True,
                                 image_range=1, max_samples=2)),
    task="flow", use_compile=False)

CONFIGS["test_eraft_original"] = test_config(
    "eraft_original",
    {"target": "model.eraft.eraft.ERAFT",
     "params": {"config": {"subtype": "warm_start"},
                "n_first_channels": 15}},
    dict(FLOW_LOSS),
    flow_test_fixups([dict(b, num_bins=15) for b in test_blocks(
        True, output_additional_frame=True, output_additional_evs=True,
        image_range=1, max_samples=2)]),
    task="flow", save_npy=False, save_png=True, use_compile=False)
CONFIGS["test_eraft_original"]["module"]["forward_type"] = "eraft"

CONFIGS["test_nernet_original"] = test_config(
    "nernet_original",
    {"target": "model.nernet_model.RepresentationRecurrent",
     "params": {"unet_kwargs": {
         "num_bins": 5, "skip_type": "sum",
         "recurrent_network": "NIAM_STcell_GCB", "recurrent_block_type": "",
         "num_encoders": 3, "base_num_channels": 32,
         "num_residual_blocks": 2, "use_upsample_conv": True, "norm": "",
         "crop_size": 224, "mlp_layers": [1, 50, 50, 50, 1],
         "use_cnn_representation": True, "normalize": False,
         "combine_voxel": False, "RepCNN_kernel_size": 3,
         "RepCNN_padding": 1, "RepCNN_channel": 64, "RepCNN_num_layers": 1,
         "num_output_channels": 1}}},
    dict(RECON_TEST_LOSS),
    [dict(b, class_name="data.testh5.TestH5EventDataset")
     for b in test_blocks(True)])
CONFIGS["test_nernet_original"]["module"]["is_nernet"] = True
CONFIGS["test_nernet_original"]["test_stage"]["test_num_workers"] = 0

CONFIGS["test_evbird"] = test_config(
    "v2v_e2vid_10k",
    {"target": "model.model.E2VIDRecurrent",
     "params": {"unet_kwargs": dict(E2VID_UNET)}},
    dict(RECON_TEST_LOSS),
    [{"data_file": "configs/evbird_test.txt",
      "class_name": "data.testh5.FPS_H5Dataset",
      "dataset_name": "evbird", "FPS": 100, "H": 260, "W": 346,
      "num_bins": 5, "sequence_length": 80, "interpolate_bins": False}])


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, cfg in CONFIGS.items():
        path = os.path.join(OUT, f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False, default_flow_style=None)
        print("wrote", path)


if __name__ == "__main__":
    main()
