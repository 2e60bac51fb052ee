"""Convert HS-ERGB sequences (Tulyakov et al. high-speed events + RGB)
to the unified HQF-style h5 (reference scripts/hs_ergb_to_h5.py).

HS-ERGB layout per sequence: events/*.npz (chunks with x, y, t[µs], p)
and images/*.png with images/timestamp.txt.

Usage: python scripts/hs_ergb_to_h5.py <seq_dir> <out.h5>
"""
import glob
import os
import sys

import cv2
import h5py
import numpy as np


def convert(seq_dir: str, out_path: str) -> None:
    ev_files = sorted(glob.glob(os.path.join(seq_dir, "events", "*.npz")))
    xs, ys, ts, ps = [], [], [], []
    for f in ev_files:
        d = np.load(f)
        xs.append(d["x"])
        ys.append(d["y"])
        ts.append(d["t"].astype(np.float64) / 1e6)
        ps.append(d["p"])
    xs = np.concatenate(xs)
    ys = np.concatenate(ys)
    ts = np.concatenate(ts)
    ps = np.concatenate(ps)
    order = np.argsort(ts, kind="stable")
    xs, ys, ts, ps = xs[order], ys[order], ts[order], ps[order]

    stamp_file = os.path.join(seq_dir, "images", "timestamp.txt")
    with open(stamp_file) as f:
        img_ts = np.array([float(l) for l in f if l.strip()]) / 1e6
    img_paths = sorted(glob.glob(os.path.join(seq_dir, "images", "*.png")))

    with h5py.File(out_path, "w") as of:
        of.create_dataset("events/ts", data=ts, dtype=np.float64)
        of.create_dataset("events/xs", data=xs, dtype=np.uint16)
        of.create_dataset("events/ys", data=ys, dtype=np.uint16)
        of.create_dataset("events/ps", data=(ps > 0).astype(np.uint8))
        h = w = None
        for idx, (p, t) in enumerate(zip(img_paths, img_ts)):
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            h, w = img.shape
            name = f"images/image{idx:09d}"
            of.create_dataset(name, data=img)
            of[name].attrs["event_idx"] = int(np.searchsorted(ts, t))
            of[name].attrs["timestamp"] = t
        of.attrs["sensor_resolution"] = (h, w)
        of.attrs["num_imgs"] = len(img_paths)
        of.attrs["num_events"] = len(ts)
        of.attrs["data_source"] = "hs-ergb"
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
