"""Config system: YAML + `{target, params}` reflection.

Keeps the exact YAML schema of the reference (`config/*.yaml`,
utils/util.py:14-30) so existing experiment configs run verbatim: torch
target strings like `model.model.E2VIDRecurrent` or `torch.optim.Adam`
resolve to the TPU-native implementations through TARGET_ALIASES instead
of python import reflection.
"""
from __future__ import annotations

import importlib
from typing import Any, Dict

import yaml


# Reference target string -> v2v_tpu implementation path.
TARGET_ALIASES: Dict[str, str] = {
    # model zoo (reference model/model.py, model/hyper_model.py, ...)
    "model.model.E2VIDRecurrent": "v2v_tpu.models.model.E2VIDRecurrent",
    "model.model.FlowNet": "v2v_tpu.models.model.FlowNet",
    "model.model.ColorE2VID": "v2v_tpu.models.model.ColorE2VID",
    "model.model.WFlowNet": "v2v_tpu.models.model.WFlowNet",
    "model.model.FlowNetNoRecur": "v2v_tpu.models.model.FlowNetNoRecur",
    "model.model.EVFlowNet": "v2v_tpu.models.model.EVFlowNet",
    "model.model.FireNet": "v2v_tpu.models.model.FireNet",
    "model.eitr.eitr.EITR": "v2v_tpu.models.eitr.EITR",
    "model.hyper_model.HyperE2VID": "v2v_tpu.models.hyper.HyperE2VID",
    "model.eraft.eraft.ERAFT": "v2v_tpu.models.eraft.ERAFT",
    "model.nernet_model.RepresentationRecurrent":
        "v2v_tpu.models.nernet.RepresentationRecurrent",
    "model.legacy.FireNet_legacy": "v2v_tpu.models.legacy.FireNetLegacy",
    # optimizers / schedulers (resolved by v2v_tpu.training.optim)
    "torch.optim.Adam": "v2v_tpu.training.optim.Adam",
    "torch.optim.AdamW": "v2v_tpu.training.optim.AdamW",
    "torch.optim.SGD": "v2v_tpu.training.optim.SGD",
    "torch.optim.lr_scheduler.StepLR": "v2v_tpu.training.optim.StepLR",
    "torch.optim.lr_scheduler.ReduceLROnPlateau":
        "v2v_tpu.training.optim.ReduceLROnPlateau",
    "torch.optim.lr_scheduler.CosineAnnealingLR":
        "v2v_tpu.training.optim.CosineAnnealingLR",
    "torch.optim.lr_scheduler.ExponentialLR":
        "v2v_tpu.training.optim.ExponentialLR",
    # datasets (reference data/*.py class_name strings)
    "data.v2v_datasets.WebvidDatasetV2": "v2v_tpu.data.webvid.WebvidDataset",
    "data.testh5.TestH5Dataset": "v2v_tpu.data.h5.TestH5Dataset",
    "data.testh5.TestH5FlowDataset": "v2v_tpu.data.h5.TestH5FlowDataset",
    "data.testh5.TestH5EventDataset": "v2v_tpu.data.h5.TestH5EventDataset",
    "data.testh5.TestH5CacheDataset": "v2v_tpu.data.h5.TestH5CacheDataset",
    "data.testh5.FPS_H5Dataset": "v2v_tpu.data.h5.FPSH5Dataset",
    "data.esim_dataset.ESIMH5Dataset": "v2v_tpu.data.esim.ESIMH5Dataset",
}


def resolve_target(target: str) -> Any:
    """Resolve a target string (reference-style or native) to an object."""
    target = TARGET_ALIASES.get(target, target)
    module, name = target.rsplit(".", 1)
    return getattr(importlib.import_module(module), name)


def instantiate_from_config(config: Dict[str, Any], **extra) -> Any:
    """`{"target": "pkg.Class", "params": {...}}` -> instance.
    Mirrors utils/util.py:14-17."""
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    cls = resolve_target(config["target"])
    return cls(**{**config.get("params", {}), **extra})


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.load(f, Loader=yaml.Loader)
