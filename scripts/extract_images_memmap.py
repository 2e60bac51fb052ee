"""Dump a MemMap dataset directory's frames to numbered PNGs.

Equivalent of the reference utility `utils/extract_images_MMP.py` (walk
a directory for `images.npy` / `timestamps.npy`, write
`frame_{i:010d}.png` plus a `timestamps.txt` sidecar). Useful for
inspecting MemMapDataset inputs (v2v_tpu/data/legacy.py).

Usage: python scripts/extract_images_memmap.py DATA_DIR OUTPUT_DIR
"""
import argparse
import os
from os.path import join

import numpy as np


def load_data(data_path, timestamp_fname="timestamps.npy",
              image_fname="images.npy"):
    assert os.path.isdir(data_path), f"{data_path} is not a directory"
    data = {}
    for subroot, _, fnames in sorted(os.walk(data_path)):
        for fname in sorted(fnames):
            path = join(subroot, fname)
            if fname.endswith(timestamp_fname):
                data["frame_stamps"] = np.load(path)
            elif fname.endswith(image_fname):
                data["images"] = np.load(path, mmap_mode="r")  # N,H,W[,C]
    assert "images" in data, f"no {image_fname} under {data_path}"
    assert "frame_stamps" in data, f"no {timestamp_fname} under {data_path}"
    return data


def save_images(data, output_folder):
    import cv2
    os.makedirs(output_folder, exist_ok=True)
    ts_path = join(output_folder, "timestamps.txt")
    with open(ts_path, "w") as ts_file:
        for i, (image, ts) in enumerate(zip(data["images"],
                                            data["frame_stamps"])):
            fname = f"frame_{i:010d}.png"
            cv2.imwrite(join(output_folder, fname), np.asarray(image))
            ts_file.write(f"{fname} {float(np.ravel(ts)[-1])}\n")
    return ts_path


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_path")
    parser.add_argument("output_folder")
    args = parser.parse_args()
    data = load_data(args.data_path)
    ts_path = save_images(data, args.output_folder)
    print(f"wrote {len(data['frame_stamps'])} frames; timestamps at "
          f"{ts_path}")


if __name__ == "__main__":
    main()
