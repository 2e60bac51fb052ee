"""NerNet trail-voxelization microbench (TPU): per-bin scalar scatter
(reference shape, representation_modules.py:175-261) vs the row-scatter
rewrite vs sort+segment_sum, on the 262k-event MVSEC bucket.

Device-chained timing (one dispatch, data dependency between iterations,
host scalar fetch as the sync — see docs/PERF.md).

    python scripts/bench_nernet_voxel.py [n_events] [iters]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from v2v_tpu.models.nernet import QuantizationLayerTrail

H, W, C = 260, 346, 5


def make_events(e, seed=0):
    rng = np.random.RandomState(seed)
    evs = np.zeros((e, 5), np.float32)
    evs[:, 0] = rng.randint(0, W, e)
    evs[:, 1] = rng.randint(0, H, e)
    evs[:, 2] = np.sort(rng.rand(e).astype(np.float32))
    evs[:, 3] = rng.choice([-1.0, 1.0], e)
    return evs


def main():
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    evs = jnp.asarray(make_events(e))
    n_ev = jnp.int32(e)

    fast = QuantizationLayerTrail(num_bins=C, height=H, width=W)
    slow = QuantizationLayerTrail(num_bins=C, height=H, width=W,
                                  row_scatter=False)
    params = fast.init(jax.random.PRNGKey(0), evs, n_ev)

    def chained(module):
        @jax.jit
        def run(events):
            def body(i, acc):
                ev = events.at[0, 2].add(acc * 0)   # loop-varying dep
                vox = module.apply(params, ev, n_ev)
                return acc + vox[0, 0, 0, 0]
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return run

    variants = {"row_scatter": chained(fast),
                "per_bin_scatter": chained(slow)}
    sums = {}
    for name, fn in variants.items():
        print(f"compiling {name} ...", flush=True)
        sums[name] = float(fn(evs))                 # compile + warm
        times = []
        for _ in range(3):
            tt0 = time.perf_counter()
            float(fn(evs))
            times.append(time.perf_counter() - tt0)
        dt = sorted(times)[1] / iters
        print(f"{name:>18}: {dt * 1e3:8.2f} ms  "
              f"({e / dt / 1e6:7.1f} Mev/s)", flush=True)

    # correctness cross-check on-device (same params)
    vf = fast.apply(params, evs, n_ev)
    vs = slow.apply(params, evs, n_ev)
    err = float(jnp.abs(vf - vs).max())
    print(f"row vs per-bin max abs err: {err:.2e}")


if __name__ == "__main__":
    main()
