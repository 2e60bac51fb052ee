"""Convert IJRR/ECD sequences (zip of images.txt + events.txt + pngs) to
the unified HQF-style h5 (reference scripts/ijrr_to_h5.py).

Usage: python scripts/ijrr_to_h5.py <seq_dir> <out.h5> [seq_name]
Each seq_dir contains images.txt ("{t} {path}" lines), events.txt
("{t} {x} {y} {p}" lines) and the referenced images.
"""
import os
import sys

import cv2
import h5py
import numpy as np

# per-sequence evaluation cuts in seconds (reference scripts/ijrr_to_h5.py:22-29)
CUT_SECONDS = {
    "boxes_6dof": (5, 20),
    "calibration": (5, 20),
    "dynamic_6dof": (5, 20),
    "office_zigzag": (5, 12),
    "poster_6dof": (5, 20),
    "shapes_6dof": (5, 20),
    "slider_depth": (1, 2.5),
}


def convert(seq_dir: str, out_path: str, seq_name: str = None) -> None:
    seq_name = seq_name or os.path.basename(seq_dir.rstrip("/"))
    begin_s, end_s = CUT_SECONDS.get(seq_name, (0, 1e9))

    ts_list, paths = [], []
    with open(os.path.join(seq_dir, "images.txt")) as f:
        for line in f:
            t, p = line.split()
            ts_list.append(float(t))
            paths.append(p)
    img_ts = np.array(ts_list)
    rel = img_ts - img_ts[0]
    b = int(np.searchsorted(rel, begin_s))
    e = int(np.searchsorted(rel, end_s))

    events = np.loadtxt(os.path.join(seq_dir, "events.txt"))
    ev_ts = events[:, 0]
    i0 = int(np.searchsorted(ev_ts, img_ts[b]))
    i1 = int(np.searchsorted(ev_ts, img_ts[min(e, len(img_ts) - 1)]))

    with h5py.File(out_path, "w") as of:
        of.create_dataset("events/ts", data=ev_ts[i0:i1], dtype=np.float64)
        of.create_dataset("events/xs", data=events[i0:i1, 1],
                          dtype=np.uint16)
        of.create_dataset("events/ys", data=events[i0:i1, 2],
                          dtype=np.uint16)
        of.create_dataset("events/ps", data=events[i0:i1, 3],
                          dtype=np.uint8)
        h = w = None
        for idx, i in enumerate(range(b, e)):
            img = cv2.imread(os.path.join(seq_dir, paths[i]),
                             cv2.IMREAD_GRAYSCALE)
            h, w = img.shape
            name = f"images/image{idx:09d}"
            of.create_dataset(name, data=img)
            of[name].attrs["event_idx"] = int(
                np.searchsorted(ev_ts, img_ts[i])) - i0
            of[name].attrs["timestamp"] = img_ts[i]
        of.attrs["sensor_resolution"] = (h, w)
        of.attrs["num_imgs"] = e - b
        of.attrs["num_events"] = i1 - i0
        of.attrs["data_source"] = "ijrr"
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2],
            sys.argv[3] if len(sys.argv) > 3 else None)
