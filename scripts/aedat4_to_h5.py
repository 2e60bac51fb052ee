"""Convert .aedat4 (iniVation DV) captures to events-only HQF-style h5
(reference scripts/aedat4_to_h5.py; used for the EvBird fixed-FPS set).

Requires the `dv_processing` package (C++ pybind library, not bundled);
fails with a clear message otherwise.

Usage: python scripts/aedat4_to_h5.py <in.aedat4> <out.h5>
"""
import sys

import h5py
import numpy as np


def convert(in_path: str, out_path: str) -> None:
    try:
        import dv_processing as dv
    except ImportError as e:
        raise SystemExit(
            "aedat4 conversion needs the dv-processing package "
            "(pip install dv-processing on a machine with network): "
            f"{e}")
    reader = dv.io.MonoCameraRecording(in_path)
    xs, ys, ts, ps = [], [], [], []
    while reader.isRunning():
        events = reader.getNextEventBatch()
        if events is None:
            continue
        arr = events.numpy()
        xs.append(arr["x"])
        ys.append(arr["y"])
        ts.append(arr["timestamp"].astype(np.float64) / 1e6)
        ps.append(arr["polarity"])
    xs = np.concatenate(xs)
    ys = np.concatenate(ys)
    ts = np.concatenate(ts)
    ps = np.concatenate(ps)
    res = reader.getEventResolution()
    with h5py.File(out_path, "w") as of:
        of.create_dataset("events/ts", data=ts, dtype=np.float64)
        of.create_dataset("events/xs", data=xs, dtype=np.uint16)
        of.create_dataset("events/ys", data=ys, dtype=np.uint16)
        of.create_dataset("events/ps", data=ps.astype(np.uint8))
        of.attrs["sensor_resolution"] = (res[1], res[0])
        of.attrs["num_events"] = len(ts)
        of.attrs["data_source"] = "evbird"
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
