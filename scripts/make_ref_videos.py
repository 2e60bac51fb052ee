"""Side-by-side comparison videos from test output dirs (reference
scripts/make_ref_videos.py): stitch per-frame PNGs of several methods
horizontally into an mp4 per sequence.

Usage: python scripts/make_ref_videos.py <out_dir> <results_dir1> [dir2 ...]
Each results_dir is a test_output_dir layout: {DATASET}/{seq}/NNNNNN.png
"""
import glob
import os
import sys

import cv2
import numpy as np


def main(out_dir: str, result_dirs) -> None:
    os.makedirs(out_dir, exist_ok=True)
    base = result_dirs[0]
    for seq_dir in sorted(glob.glob(os.path.join(base, "*", "*"))):
        rel = os.path.relpath(seq_dir, base)
        frames = sorted(glob.glob(os.path.join(seq_dir, "*.png")))
        if not frames:
            continue
        sample = cv2.imread(frames[0])
        h, w = sample.shape[:2]
        out_path = os.path.join(out_dir, rel.replace(os.sep, "_") + ".mp4")
        vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             20, (w * len(result_dirs), h))
        for fpath in frames:
            name = os.path.basename(fpath)
            row = []
            for rd in result_dirs:
                img = cv2.imread(os.path.join(rd, rel, name))
                if img is None:
                    img = np.zeros((h, w, 3), np.uint8)
                row.append(cv2.resize(img, (w, h)))
            vw.write(np.concatenate(row, axis=1))
        vw.release()
        print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
