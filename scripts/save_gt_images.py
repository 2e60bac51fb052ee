"""Dump the ground-truth frames of h5 test sequences as PNGs in the same
layout as test output dirs (reference scripts/save_gt_images.py), for
side-by-side videos and figures.

Usage: python scripts/save_gt_images.py <h5_list.txt> <dataset_name> <out_dir>
"""
import os
import sys

import cv2
import h5py

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from v2v_tpu.data.interface import read_path_list  # noqa: E402


def main(list_file: str, dataset_name: str, out_dir: str) -> None:
    for path in read_path_list(list_file):
        seq = os.path.basename(path).split(".")[0]
        seq_dir = os.path.join(out_dir, dataset_name.upper(), seq)
        os.makedirs(seq_dir, exist_ok=True)
        with h5py.File(path, "r") as f:
            keys = sorted(f["images"].keys())
            # frame i pairs with events[i-1, i]: start at index 1
            # (data/testh5.py:110)
            for out_idx, key in enumerate(keys[1:]):
                cv2.imwrite(os.path.join(seq_dir, f"{out_idx:06d}.png"),
                            f["images"][key][()])
        print(f"{seq}: {len(keys) - 1} frames")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
