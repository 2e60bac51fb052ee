"""Pre-build voxel caches from HQF-format test h5 files, producing the
input format of TestH5CacheDataset (the reference references this script
at data/testh5.py:386 but never shipped it).

Usage: python scripts/testh5_to_voxel_cache.py <h5_list.txt> <out_dir>
           [--num-bins 5] [--interpolate]
"""
import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v2v_tpu.data.h5 import TestH5Dataset  # noqa: E402
from v2v_tpu.data.interface import read_path_list  # noqa: E402


def convert(h5_path: str, out_path: str, num_bins: int,
            interpolate: bool) -> None:
    ds = TestH5Dataset(h5_path, {"sequence_length": 10 ** 9,
                                 "num_bins": num_bins,
                                 "interpolate_bins": interpolate})
    item = ds[0]
    frames = item["frame"][..., 0]                     # (T,H,W) [0,255]
    events = item["events"].transpose(0, 3, 1, 2)      # (T,bins,H,W)
    with h5py.File(out_path, "w") as f:
        f.attrs["num_bins"] = num_bins
        f.attrs["interpolate_bins"] = interpolate
        f.create_dataset("frames", data=frames.astype(np.float32))
        f.create_dataset("events", data=events.astype(np.float32))
    print(f"wrote {out_path}: {frames.shape[0]} frames")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("h5_list")
    p.add_argument("out_dir")
    p.add_argument("--num-bins", type=int, default=5)
    p.add_argument("--interpolate", action="store_true")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for path in read_path_list(args.h5_list):
        out = os.path.join(args.out_dir, os.path.basename(path))
        convert(path, out, args.num_bins, args.interpolate)
