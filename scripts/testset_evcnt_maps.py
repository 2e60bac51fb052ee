"""Event-count maps per test sequence (reference
scripts/testset_evcnt_maps.py): accumulate |events| over each h5 test
sequence and save a normalized count image — used to eyeball hot pixels
and sensor coverage.

Usage: python scripts/testset_evcnt_maps.py <h5_list.txt> <out_dir>
"""
import os
import sys

import cv2
import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from v2v_tpu.data.interface import read_path_list  # noqa: E402


def main(list_file: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for path in read_path_list(list_file):
        name = os.path.basename(path).split(".")[0]
        with h5py.File(path, "r") as f:
            xs = f["events/xs"][:]
            ys = f["events/ys"][:]
            if "images" in f:
                keys = sorted(f["images"].keys())
                h, w = f["images"][keys[0]].shape[:2]
            else:
                h, w = int(ys.max()) + 1, int(xs.max()) + 1
        counts = np.zeros((h, w))
        np.add.at(counts, (ys, xs), 1)
        norm = np.clip(counts / max(np.percentile(counts, 99), 1) * 255,
                       0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, f"{name}_evcnt.png"), norm)
        print(f"{name}: {int(counts.sum())} events, "
              f"max/pixel {int(counts.max())}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "debug/evcnt")
