"""Micro-benchmark for the voxelization kernels (the reference keeps one
inline at utils/event_utils.py:761-854): numpy vs C++ vs device
events->voxel, and the jnp-scan vs Pallas simulators.

Usage: python scripts/bench_voxel_kernels.py [--events 2000000]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_events: int) -> None:
    import jax
    import jax.numpy as jnp
    from v2v_tpu.data.native import events_to_voxel_native, native_available
    from v2v_tpu.ops.voxel import (SimParams, events_to_voxel,
                                   events_to_voxel_np, relative_us)
    from v2v_tpu.ops.voxel_pallas import simulate_batch_pallas

    h, w, nb = 260, 346, 5
    rng = np.random.RandomState(0)
    ts = np.sort(rng.rand(n_events)) * 0.05 + 100.0
    xs = rng.randint(0, w, n_events)
    ys = rng.randint(0, h, n_events)
    ps = rng.randint(0, 2, n_events).astype(np.uint8)

    def timeit(fn, reps=3):
        fn()                       # warm up / compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    for interp in (False, True):
        tag = "bilinear" if interp else "discrete"
        t_np = timeit(lambda: events_to_voxel_np(
            ts, xs, ys, ps, num_bins=nb, height=h, width=w,
            interpolate_bins=interp))
        print(f"events->voxel {tag}: numpy {t_np * 1000:.1f} ms "
              f"({n_events / t_np / 1e6:.0f} Mev/s)")
        if native_available():
            t_cc = timeit(lambda: events_to_voxel_native(
                ts, xs, ys, ps, num_bins=nb, height=h, width=w,
                interpolate_bins=interp))
            print(f"events->voxel {tag}: C++   {t_cc * 1000:.1f} ms "
                  f"({n_events / t_cc / 1e6:.0f} Mev/s, "
                  f"{t_np / t_cc:.1f}x)")
        t_us = jnp.asarray(relative_us(ts), jnp.int32)
        xsd = jnp.asarray(xs, jnp.int32)
        ysd = jnp.asarray(ys, jnp.int32)
        psd = jnp.asarray(ps, jnp.int32)
        nd = jnp.int32(n_events)

        def dev():
            events_to_voxel(t_us, xsd, ysd, psd, nd, num_bins=nb,
                            height=h, width=w,
                            interpolate_bins=interp).block_until_ready()
        t_dev = timeit(dev)
        print(f"events->voxel {tag}: device {t_dev * 1000:.1f} ms "
              f"({n_events / t_dev / 1e6:.0f} Mev/s)")

    # simulator kernels
    B, N, sh, sw = 12, 201, 128, 128
    videos = rng.randint(0, 255, (B, N, sh, sw)).astype(np.float32)
    v_dev = jnp.asarray(videos)
    params = SimParams(*[jnp.full((B,), v)
                         for v in (0.3, 0.25, 0.05, 0.001, 2.0)])
    seeds = jnp.arange(B, dtype=jnp.int32)
    if jax.default_backend() not in ("cpu", "gpu"):
        sim = jax.jit(lambda v, s: simulate_batch_pallas(v, s, params))

        def run():
            sim(v_dev, seeds).block_until_ready()
        t = timeit(run)
        print(f"pallas simulator: {t * 1000:.1f} ms / {B} clips "
              f"(incl. dispatch overhead; see bench.py for chained timing)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--events", type=int, default=2000000)
    args = p.parse_args()
    main(args.events)
