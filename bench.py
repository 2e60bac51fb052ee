"""Headline benchmark: WebVid->voxel synthesis throughput, clips/sec/chip.

Measures the fused on-device ESIM simulator (v2v_tpu.ops.voxel) on the
training workload shape (B=12 clips x (40*5+1) frames x 128^2, the
reference train config train_v2v_e2vid_10k.yaml:32-76).

vs_baseline = speedup over the reference's CPU numpy simulator
(data/v2v_core_esim.py run in dataloader workers) with the same
per-clip workload, against a PINNED idle-host baseline (see
PINNED_BASELINE_CLIPS_PER_SEC) — round 4 showed the live-measured
baseline swings 3x with host load (2,266x vs 6,985x for the identical
kernel number), so the ratio now uses the pinned figure and the live
measurement is reported alongside as an annotation.

Prints ONE JSON line on stdout; all diagnostics go to stderr.

Wedge-proofing (round-5 verdict #1): BENCH_r04.json was rc=124/
parsed-null — the TPU child wedged at first relay contact (a lost
claim accrues no CPU forever; a fresh process gets the chip in ~100 s).
bench.py therefore supervises itself: the default invocation spawns a
child (V2V_BENCH_CHILD=1) under the same no-progress watchdog the
release rehearsal uses (v2v_tpu/utils/watchdog.py), with milestone
heartbeats, kill-by-process-group + retry, and the persistent XLA
compile cache enabled (V2V_COMPILE_CACHE, defaulted into .cache/xla)
so a retry after a mid-compile kill is cheaper.
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# Reference numpy simulator, idle host, median-of-3 x 3 clips (this
# container, 2026-08-21: 6.00/5.51/6.00 clips/s across trials; earlier
# idle sessions measured 7.5-7.8 on a different host state). Pinned so
# vs_baseline compares kernels, not host load.
PINNED_BASELINE_CLIPS_PER_SEC = 6.0


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _status(msg):
    """Milestone for the supervisor's watchdog (file append = progress)."""
    _log(msg)
    path = os.environ.get("V2V_BENCH_STATUS")
    if path:
        with open(path, "a") as f:
            f.write(f"{time.time():.0f} {msg}\n")


def make_videos(b, n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (b, 1, h, w)).astype(np.float32)
    drift = np.cumsum(rng.randn(b, n, h, w).astype(np.float32) * 4, axis=1)
    return np.clip(base + drift, 0, 255).astype(np.uint8)


def numpy_baseline_clip_time(videos):
    """Reference-equivalent numpy simulator (golden model): median of 3
    runs over each of 3 distinct pinned-seed clips, averaged. Reported
    as an annotation only — the headline ratio uses the pinned value."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from golden_esim import golden_video_to_voxel
    per_clip = []
    for ci in range(3):
        video = videos[ci]
        n, h, w = video.shape
        rng = np.random.RandomState(ci)
        base_noise = rng.randn(n - 1, h, w).astype(np.float32) * 0.05
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            golden_video_to_voxel(video.astype(np.float32), 0.4, 0.5,
                                  base_noise=base_noise)
            times.append(time.perf_counter() - t0)
        per_clip.append(sorted(times)[1])
    return float(np.mean(per_clip))


def run_benchmark():
    """The actual measurement (child process). Milestones at every
    phase so the supervisor can tell a relay compile from a wedge."""
    from v2v_tpu.utils.compile_cache import maybe_enable
    cache = maybe_enable()
    _status(f"imports done (compile cache: {cache or 'off'})")

    import jax
    import jax.numpy as jnp
    from v2v_tpu.ops.voxel import SimConfig, sample_sim_params
    from v2v_tpu.training.steps import _pallas_ok

    devs = jax.devices()
    _status(f"backend up: {len(devs)}x {devs[0].platform}")

    B, L, BINS, H, W = 12, 40, 5, 128, 128
    N = L * BINS + 1
    videos = make_videos(B, N, H, W)
    cfg = SimConfig()

    use_pallas = _pallas_ok(jnp.zeros((1, 1, H, W)), cfg)

    def video_to_voxels(video, step):
        """The video->voxel conversion proper: simulate + bin-sum, voxels
        in native (B, L, bins, H, W) layout (the NHWC transpose fuses
        into the consumer conv inside the real train step). Per-step key
        derivation lives inside the jit — separate host dispatches cost
        ~10ms each through the remote-execution relay."""
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(0), step), B)
        params = jax.vmap(lambda k: sample_sim_params(k, cfg))(keys)
        if use_pallas:
            from v2v_tpu.ops.voxel_pallas import simulate_batch_pallas
            seeds = jax.vmap(
                lambda k: jax.random.randint(k, (), 0, 2 ** 31 - 1))(keys)
            counts = simulate_batch_pallas(video, seeds, params)
        else:
            from v2v_tpu.ops.voxel import esim_video_to_voxel
            counts = jax.vmap(
                lambda v, k, p: esim_video_to_voxel(v, p, key=k))(
                video, keys, params)
        return counts.reshape(B, L, BINS, H, W)

    # Device-side chained loop: one dispatch; the step index is
    # loop-varying (different keys per iteration -> no CSE) and the
    # carried scalar consumes each iteration's output so the while loop
    # body cannot be elided. (Host-side loops measure the execution
    # relay's per-dispatch overhead, not the kernel; float(acc) at the
    # end is the only reliable sync on the relay — block_until_ready
    # does not block there.)
    #
    # iters=1000: the relay charges a ~33 ms FIXED overhead per chained
    # dispatch (measured round 3 by solving t = iters*k + C from
    # iters=50/200 pairs; docs/PERF.md). At the historical iters=50 that
    # overhead was ~33% of the measurement and its session-to-session
    # jitter WAS the "bench variance" (8.7k-10.6k across rounds, same
    # code). At 1000 iters it is ~4%, and the number measures the
    # kernel, not the relay.
    iters = int(os.environ.get("V2V_BENCH_ITERS", "1000"))

    @jax.jit
    def chained(video):
        def body(i, acc):
            # acc*0 keeps a true data dependency (not folded: NaN*0!=0)
            step = i + (acc * 0).astype(jnp.int32)
            voxels = video_to_voxels(video, step)
            return acc + voxels[0, 0, 0, 0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    v_dev = jnp.asarray(videos)                 # uint8, as the loader ships
    _status("compiling (relay compiles are client-CPU-idle; healthy)")
    float(chained(v_dev))                       # compile + warm
    _status("compiled + warm")
    times = []
    for i in range(5):                          # median damps relay jitter
        t0 = time.perf_counter()
        float(chained(v_dev))
        times.append(time.perf_counter() - t0)
        _status(f"timed run {i + 1}/5: {times[-1]:.3f}s")
    dt = sorted(times)[2]
    clips_per_sec = B * iters / dt

    # live reference CPU baseline (annotation only; ratio uses pinned)
    base_t = numpy_baseline_clip_time(videos)
    live_baseline = 1.0 / base_t
    _status(f"live numpy baseline {live_baseline:.2f} clips/s "
            f"(pinned {PINNED_BASELINE_CLIPS_PER_SEC})")

    print(json.dumps({
        "metric": "webvid_to_voxel_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(
            clips_per_sec / PINNED_BASELINE_CLIPS_PER_SEC, 2),
        "baseline_clips_per_sec_pinned": PINNED_BASELINE_CLIPS_PER_SEC,
        "baseline_clips_per_sec_live": round(live_baseline, 2),
    }), flush=True)


def supervise():
    """Spawn run_benchmark() in a watched child; forward its JSON line.

    Wedge windows: before the FIRST milestone lands, 240 s (a healthy
    fresh process reaches the backend in ~100 s; a lost-claim child
    never does). After first life, 420 s of no CPU AND no milestone
    (covers the relay's client-idle compile of this kernel, ~1-3 min,
    with margin). Up to 3 attempts.
    """
    from v2v_tpu.utils.watchdog import run_watched

    os.environ.setdefault("V2V_COMPILE_CACHE",
                          os.path.join(REPO, ".cache", "xla"))
    workdir = os.path.join(REPO, ".cache", "bench")
    os.makedirs(workdir, exist_ok=True)
    log_path = os.path.join(workdir, "bench_child.log")
    status_path = os.path.join(workdir, "bench_status.txt")
    for p in (log_path, status_path):
        try:
            os.remove(p)
        except OSError:
            pass

    env = dict(os.environ)
    env["V2V_BENCH_CHILD"] = "1"
    env["V2V_BENCH_STATUS"] = status_path

    def beat(msg):
        last = ""
        try:
            lines = open(status_path).read().splitlines()
            if lines:
                last = lines[-1].split(" ", 1)[-1]
        except OSError:
            pass
        _log(msg + (f" | last milestone: {last}" if last else ""))

    _log(f"supervisor: watching child (log {log_path})")
    rc, wall, wedges = run_watched(
        [sys.executable, "-u", os.path.abspath(__file__)],
        log_path, REPO, env=env,
        wedge_s=420.0, first_progress_s=240.0, poll_s=10.0,
        retries=2, progress_cpu_s=1.0,
        status_path=status_path, heartbeat=beat, heartbeat_s=30.0)

    # echo the child's milestone trail so a failure (or the driver's
    # captured tail) shows exactly how far each attempt got
    try:
        for ln in open(status_path).read().splitlines():
            _log("milestone | " + ln)
    except OSError:
        pass

    result = None
    try:
        with open(log_path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        obj = json.loads(line)
                        if obj.get("metric"):
                            result = line
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass

    if result is not None:
        _log(f"done: rc={rc} wall={wall:.0f}s wedge_kills={wedges}")
        print(result, flush=True)
        sys.exit(0)
    _log(f"FAILED: rc={rc} wall={wall:.0f}s wedge_kills={wedges}; "
         f"child log tail:")
    try:
        for ln in open(log_path).read().splitlines()[-15:]:
            _log("  | " + ln)
    except OSError:
        pass
    sys.exit(1)


def main():
    if os.environ.get("V2V_BENCH_CHILD"):
        run_benchmark()
    else:
        supervise()


if __name__ == "__main__":
    main()
