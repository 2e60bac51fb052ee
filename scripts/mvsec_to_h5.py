"""Convert MVSEC hdf5 (davis left camera) to the unified HQF-style h5
(reference scripts/mvsec_to_h5.py).

Output contract (h5):
  images/image{idx:09d}: (H,W) uint8, attrs[event_idx, timestamp]
  events/{ts,xs,ys,ps}: (N,) arrays, ps in {0,1}
  flow/flow{idx:09d}: (2,H,W), attrs[event_idx, image_idx]  (GT flow)

Usage: python scripts/mvsec_to_h5.py <in_data.h5> <in_gt.h5> <out.h5>
"""
import os
import sys

import h5py
import numpy as np

# per-sequence evaluation cuts in seconds (reference scripts/mvsec_to_h5.py:5-12)
CUT_SECONDS = {
    "indoor_flying1": (10, 70),
    "indoor_flying2": (10, 70),
    "indoor_flying3": (10, 70),
    "indoor_flying4": (10, 19.8),
    "outdoor_day1": (0, 60),
    "outdoor_day2": (100, 160),
}


def convert(in_path: str, in_flow_path: str, out_path: str,
            side: str = "left") -> None:
    seq = os.path.basename(in_path).split("_data")[0]
    begin_s, end_s = CUT_SECONDS[seq]
    with h5py.File(out_path, "w") as of, h5py.File(in_path, "r") as f:
        davis = f["davis"][side]
        img_ts = davis["image_raw_ts"][:]
        base_time = img_ts[0]
        rel = img_ts - base_time
        start = int(np.searchsorted(rel, begin_s))
        end = int(np.searchsorted(rel, end_s))
        imgs = davis["image_raw"][start:end]
        ev_inds = davis["image_raw_event_inds"][:]
        i0 = max(int(ev_inds[start]), 0)
        i1 = int(ev_inds[end])
        events = davis["events"][i0:i1]
        of.create_dataset("events/ts", data=events[:, 2], dtype=np.float64)
        of.create_dataset("events/xs", data=events[:, 0], dtype=np.uint16)
        of.create_dataset("events/ys", data=events[:, 1], dtype=np.uint16)
        of.create_dataset("events/ps", data=(events[:, 3] + 1) / 2,
                          dtype=np.uint8)
        for idx, img in enumerate(imgs):
            name = f"images/image{idx:09d}"
            of.create_dataset(name, data=img)
            of[name].attrs["event_idx"] = max(
                int(ev_inds[start + idx]) - i0, 0)
            of[name].attrs["timestamp"] = img_ts[start + idx]
        of.attrs["sensor_resolution"] = imgs.shape[1:]
        of.attrs["num_events"] = events.shape[0]
        of.attrs["num_imgs"] = imgs.shape[0]
        of.attrs["data_source"] = "mvsec"
        ev_ts = events[:, 2]

        with h5py.File(in_flow_path, "r") as ff:
            gt = ff["davis"]["left"]
            flow_ts = gt["flow_dist_ts"][:] if "flow_dist_ts" in gt \
                else gt["depth_image_raw_ts"][:]
            flows = gt["flow_dist"] if "flow_dist" in gt else None
            rel_f = flow_ts - base_time
            fb = int(np.searchsorted(rel_f, begin_s))
            fe = int(np.searchsorted(rel_f, end_s))
            to_ev = np.searchsorted(ev_ts, flow_ts)
            to_img = np.searchsorted(img_ts[start:end], flow_ts)
            for out_idx, i in enumerate(range(fb, fe)):
                name = f"flow/flow{out_idx:09d}"
                data = (flows[i] if flows is not None
                        else np.zeros((2, *imgs.shape[1:]), np.float32))
                of.create_dataset(name, data=data.astype(np.float32))
                of[name].attrs["event_idx"] = int(to_ev[i])
                of[name].attrs["image_idx"] = int(to_img[i])
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2], sys.argv[3])
