"""Host decode-loader throughput benchmark (the 'feed the chip' math).

Generates synthetic WebVid-style mp4s, then measures DataLoader
throughput at the production sample shape (201 frames decoded + cropped
to 128^2 per clip, batch 12) for several worker counts and both worker
types. Prints clips/s and the host-sizing math against the 0.90 s/step
device time (docs/PERF.md).

Usage: python scripts/bench_loader.py [--workers 4,8,16] [--batches 8]
       [--worker-type thread,process]
"""
import argparse
import os
import sys
import tempfile
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from v2v_tpu.data.interface import DataLoader  # noqa: E402
from v2v_tpu.data.webvid import WebvidDataset  # noqa: E402

DEVICE_STEP_S = 0.90          # flagship train step (docs/PERF.md)
BATCH = 12


def make_videos(root, n_videos=10, frames=420, h=256, w=340, fps=24):
    names = []
    rng = np.random.RandomState(0)
    for vi in range(n_videos):
        name = f"synth_{vi}.mp4"
        path = os.path.join(root, name)
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
        base = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        for i in range(frames):
            m = np.roll(base, shift=(i * 2) % h, axis=0)
            noise = rng.randint(0, 30, (h, w, 3), dtype=np.uint8)
            vw.write(cv2.add(m, noise))
        vw.release()
        names.append((name, frames))
    list_path = os.path.join(root, "list.txt")
    with open(list_path, "w") as f:
        for name, cnt in names:
            f.write(f"{name} {cnt}\n")
    return list_path


def bench(root, list_path, num_workers, worker_type, n_batches, prefetch):
    ds = WebvidDataset(root, {
        "video_list_file": list_path, "sequence_length": 40,
        "num_bins": 5, "crop_size": 128, "step_size": 10,
        "max_samples_per_shot": 100, "output": "video",
    })
    loader = DataLoader(ds, BATCH, shuffle=True, num_workers=num_workers,
                        worker_type=worker_type, prefetch=prefetch)
    it = iter(loader)
    # warm-up: codec init AND drain the prefetch buffer, otherwise the
    # timed window just consumes pre-buffered batches and reads ~0
    try:
        for _ in range(1 + prefetch):
            next(it)
    except StopIteration:
        return None
    t0 = time.perf_counter()
    done = 0
    for _ in range(n_batches):
        try:
            next(it)
            done += 1
        except StopIteration:
            break
    dt = time.perf_counter() - t0
    if not done:
        return None
    s_per_batch = dt / done
    clips_s = BATCH / s_per_batch
    return s_per_batch, clips_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="4,8,16")
    ap.add_argument("--worker-type", default="thread,process")
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--prefetch", type=int, default=4)
    args = ap.parse_args()

    ncpu = os.cpu_count()
    need_clips_s = BATCH / DEVICE_STEP_S
    print(f"host cores: {ncpu}; device step needs {need_clips_s:.1f} "
          f"clips/s (B={BATCH} / {DEVICE_STEP_S} s)")

    with tempfile.TemporaryDirectory() as root:
        list_path = make_videos(root)
        best, best_nw = 0.0, 1
        for wt in args.worker_type.split(","):
            for nw in [int(x) for x in args.workers.split(",")]:
                r = bench(root, list_path, nw, wt, args.batches,
                          args.prefetch)
                if r is None:
                    continue
                s_per_batch, clips_s = r
                if clips_s > best:
                    best, best_nw = clips_s, nw
                print(f"{wt:8s} workers={nw:3d}: {s_per_batch:6.2f} s/batch "
                      f"= {clips_s:6.2f} clips/s "
                      f"({clips_s / need_clips_s * 100:5.1f}% of device "
                      f"demand)")
        # attribute throughput to the cores the winning config can
        # actually use, not the whole host
        per_core = best / max(1, min(best_nw, ncpu))
        print(f"\nscaling math: best steady-state {best:.2f} clips/s on "
              f"{ncpu} core(s) ({per_core:.2f} clips/s/core); one chip "
              f"needs {need_clips_s:.1f} clips/s => "
              f"~{need_clips_s / max(per_core, 1e-9):.1f} cores/chip "
              f"(synthetic 340x256 mp4v clips; real WebVid H.264 at "
              f"larger resolutions decodes slower — scale accordingly)")


if __name__ == "__main__":
    main()
