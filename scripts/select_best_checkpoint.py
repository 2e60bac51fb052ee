"""Pick the best epoch by averaged validation perceptual loss.

Reference scripts/select_best_checkpoint.py scrapes TensorBoard event
files for val/perceptual_loss/{evaid,hqf,ijrr,mvsec}; this version reads
TB events when the `tensorboard` package is available and falls back to
the plain-text val_loss.txt the trainer writes.

Usage: python scripts/select_best_checkpoint.py <experiment_name>
"""
import glob
import os
import re
import sys

import numpy as np

TAGS = ["val/perceptual_loss/evaid", "val/perceptual_loss/hqf",
        "val/perceptual_loss/ijrr", "val/perceptual_loss/mvsec"]


def from_tensorboard(experiment: str):
    try:
        from tensorboard.backend.event_processing import event_accumulator
    except ImportError:
        return None
    logs = sorted(glob.glob(
        f"tensorboard_logs/{experiment}/events.out.tfevents*"))
    if not logs:
        return None
    per_epoch = {}
    for path in logs:
        ea = event_accumulator.EventAccumulator(
            path, size_guidance={event_accumulator.SCALARS: 100000})
        ea.Reload()
        for tag in TAGS:
            try:
                for ev in ea.scalars.Items(tag):
                    per_epoch.setdefault(ev.step, []).append(ev.value)
            except KeyError:
                pass
    if not per_epoch:
        return None
    return {ep: float(np.mean(v)) for ep, v in per_epoch.items()}


def from_val_loss_txt(experiment: str):
    path = os.path.join("tensorboard_logs", experiment, "val_loss.txt")
    if not os.path.exists(path):
        return None
    per_epoch = {}
    with open(path) as f:
        for line in f:
            m = re.search(r"Epoch (\d+): ([0-9.eE+-]+)", line)
            if m:
                per_epoch[int(m.group(1))] = float(m.group(2))
    return per_epoch or None


def main(experiment: str) -> None:
    losses = from_tensorboard(experiment) or from_val_loss_txt(experiment)
    if not losses:
        print(f"no validation records found for {experiment}")
        sys.exit(1)
    best_epoch = min(losses, key=losses.get)
    print(f"best epoch: {best_epoch} (val loss {losses[best_epoch]:.6f})")
    ckpt_file = f"ckpt_paths/{experiment}.txt"
    if os.path.exists(ckpt_file):
        with open(ckpt_file) as f:
            for line in f:
                if f"epoch_{best_epoch:04d}" in line:
                    print("checkpoint:", line.strip())
                    return
    print("checkpoint file not found in ckpt_paths/")


if __name__ == "__main__":
    main(sys.argv[1])
