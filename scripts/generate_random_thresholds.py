"""Stamp fixed random (pos, neg) thresholds into a video list file for
the fixed-threshold ablation (reference
scripts/generate_random_thresholds.py). Rewrites the file in place:
`{subpath} {framecount}` -> `{subpath} {framecount} {pos} {neg}`.

Usage: python scripts/generate_random_thresholds.py <video_list.txt>
"""
import sys

import numpy as np


def ran_thres(threshold_range=(0.05, 2), max_thres_pos_neg_gap=1.5):
    thres_1 = np.random.uniform(*threshold_range)
    thres_2 = thres_1 * np.random.uniform(1, max_thres_pos_neg_gap)
    if np.random.rand() > 0.5:
        return thres_1, thres_2
    return thres_2, thres_1


def process_file(path: str) -> None:
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    out = []
    for line in lines:
        parts = line.split()
        pos, neg = ran_thres()
        out.append(f"{parts[0]} {parts[1]} {pos:.3f} {neg:.3f}")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"stamped {len(out)} lines in {path}")


if __name__ == "__main__":
    process_file(sys.argv[1])
