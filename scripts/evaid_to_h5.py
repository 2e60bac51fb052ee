"""Convert an EVAID-R sequence directory to the unified HQF-style h5
(reference scripts/evaid_to_h5.py).

EVAID layout: event/NNNNNN.txt (lines "{t_us} {x} {y} {p}"), gt/*.png,
shape.txt ("W H"), timestamps.txt (one µs timestamp per image).
event/000001.txt holds the events between image 1 and image 2, so the
first image is dropped.

Usage: python scripts/evaid_to_h5.py <evaid_dir> <out.h5> [begin_s end_s]
"""
import glob
import os
import sys

import cv2
import h5py
import numpy as np


def convert(evaid_dir: str, out_path: str, begin_s: float = 0.0,
            end_s: float = 1e9) -> None:
    with open(os.path.join(evaid_dir, "timestamps.txt")) as f:
        timestamps = [int(x.strip()) for x in f if x.strip()]
    rel = np.array(timestamps) - timestamps[0]
    b = int(np.searchsorted(rel, begin_s * 1e6))
    e = int(np.searchsorted(rel, end_s * 1e6))
    timestamps = timestamps[b:e + 1]
    images = (sorted(glob.glob(os.path.join(evaid_dir, "gt/*.png")))
              + sorted(glob.glob(os.path.join(evaid_dir, "gt/*.jpg"))))[b:e + 1]
    with open(os.path.join(evaid_dir, "shape.txt")) as f:
        w, h = map(int, f.readline().split())

    all_ts, all_xs, all_ys, all_ps = [], [], [], []
    event_idx_per_img = [0]
    ev_files = sorted(glob.glob(os.path.join(evaid_dir, "event/*.txt")))
    for i in range(b + 1, e + 1):
        data = np.loadtxt(ev_files[i - 1], dtype=np.int64).reshape(-1, 4)
        all_ts.append(data[:, 0] / 1e6)
        all_xs.append(data[:, 1])
        all_ys.append(data[:, 2])
        all_ps.append(data[:, 3])
        event_idx_per_img.append(event_idx_per_img[-1] + len(data))

    with h5py.File(out_path, "w") as of:
        of.create_dataset("events/ts", data=np.concatenate(all_ts),
                          dtype=np.float64)
        of.create_dataset("events/xs", data=np.concatenate(all_xs),
                          dtype=np.uint16)
        of.create_dataset("events/ys", data=np.concatenate(all_ys),
                          dtype=np.uint16)
        of.create_dataset("events/ps", data=np.concatenate(all_ps),
                          dtype=np.uint8)
        for idx, img_path in enumerate(images):
            img = cv2.imread(img_path, cv2.IMREAD_GRAYSCALE)
            name = f"images/image{idx:09d}"
            of.create_dataset(name, data=img)
            of[name].attrs["event_idx"] = event_idx_per_img[
                min(idx, len(event_idx_per_img) - 1)]
            of[name].attrs["timestamp"] = timestamps[idx] / 1e6
        of.attrs["sensor_resolution"] = (h, w)
        of.attrs["num_imgs"] = len(images)
        of.attrs["num_events"] = int(event_idx_per_img[-1])
        of.attrs["data_source"] = "evaid"
    print(f"wrote {out_path}")


if __name__ == "__main__":
    begin_s = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    end_s = float(sys.argv[4]) if len(sys.argv) > 4 else 1e9
    convert(sys.argv[1], sys.argv[2], begin_s, end_s)
