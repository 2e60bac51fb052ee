"""Pre-stack ESIM event h5 files into cached voxel h5 (reference
scripts/esim_to_voxel.py): runs DynamicH5Dataset over each input and
stores stacked frames/flow/events (bilinear and discrete variants).

Usage: python scripts/esim_to_voxel.py <in_glob> <out_dir> [--discrete]
"""
import argparse
import glob
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v2v_tpu.data.legacy import DynamicH5Dataset  # noqa: E402


def convert(in_path: str, out_path: str, temporal_bilinear: bool) -> None:
    ds = DynamicH5Dataset(in_path, temporal_bilinear=temporal_bilinear)
    frames, flow, events, stamps, dts = [], [], [], [], []
    for i in range(len(ds)):
        item = ds[i]
        # store channels-first like the reference caches
        frames.append(np.moveaxis(item["frame"], -1, 0))
        flow.append(np.moveaxis(item["flow"], -1, 0))
        events.append(np.moveaxis(item["events"], -1, 0))
        stamps.append(item["timestamp"])
        dts.append(item["dt"])
    with h5py.File(out_path, "w") as f:
        f.attrs["sensor_resolution"] = ds.sensor_resolution
        f.attrs["source"] = "esim"
        f.create_dataset("frames", data=np.stack(frames), dtype=np.float32)
        f.create_dataset("flow", data=np.stack(flow), dtype=np.float32)
        f.create_dataset("events", data=np.stack(events), dtype=np.float32)
        f.create_dataset("timestamps", data=np.stack(stamps),
                         dtype=np.float32)
        f.create_dataset("dt", data=np.stack(dts), dtype=np.float32)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("in_glob")
    p.add_argument("out_dir")
    p.add_argument("--discrete", action="store_true",
                   help="discrete binning instead of temporal bilinear")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    for path in sorted(glob.glob(args.in_glob)):
        out = os.path.join(args.out_dir, os.path.basename(path))
        convert(path, out, temporal_bilinear=not args.discrete)
