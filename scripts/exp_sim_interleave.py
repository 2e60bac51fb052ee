"""Experiment: interleave independent per-sample state chains in the
Pallas simulator kernel (docs/PERF.md round-3 lead — the frame loop is a
~30-op f32 dependency chain; two+ independent chains per program might
hide VPU latency).

Variant: each grid program simulates `spp` samples x (128/spp)-row tiles
(same total vector volume and VMEM as the shipped 1x128 kernel), with
the per-sample chains unrolled inside the frame loop so the scheduler
can interleave them.

Timing: device-chained fori_loop, host scalar fetch (bench.py rules).

Usage: timeout 560 python -u scripts/exp_sim_interleave.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from v2v_tpu.ops.voxel_pallas import _gaussian, _uniform01

B, L, BINS, H, W = 12, 40, 5, 128, 128
N = L * BINS + 1


def _kernel(seed_ref, pos_ref, neg_ref, noise_ref, video_ref, out_ref,
            pot_ref, logprev_ref, hot_ref, *, spp: int):
    bp = pl.program_id(0)
    tile = pl.program_id(1)
    n = video_ref.shape[1]
    shape = pot_ref.shape[1:]                    # (tile_h, w)

    pltpu.prng_seed(seed_ref[bp * spp] + tile * 7919)
    for j in range(spp):
        u = _uniform01(shape)
        pot_ref[j] = u * (pos_ref[bp * spp + j] + neg_ref[bp * spp + j]) \
            - neg_ref[bp * spp + j]
        hot_ref[j] = 0.05 * _gaussian(shape)

    def load(j, i):
        f = video_ref[j, i]
        if f.dtype == jnp.uint8:
            f = f.astype(jnp.int32)
        return f.astype(jnp.float32)

    for j in range(spp):
        logprev_ref[j] = jnp.log(0.001 + (load(j, 0) * (1.0 / 255.0)) ** 2.2)

    def body(i, _):
        # unrolled independent chains: one per sample
        for j in range(spp):
            b = bp * spp + j
            frame = load(j, i)
            log_new = jnp.log(0.001 + (frame * (1.0 / 255.0)) ** 2.2)
            pot = pot_ref[j] + (log_new - logprev_ref[j])
            pot = pot + noise_ref[b] * _gaussian(shape) + hot_ref[j]
            pos_ev = jnp.where(pot >= pos_ref[b],
                               jnp.floor(pot / pos_ref[b]), 0.0)
            neg_ev = jnp.where(pot <= -neg_ref[b],
                               jnp.floor(-pot / neg_ref[b]), 0.0)
            pot_ref[j] = pot - pos_ev * pos_ref[b] + neg_ev * neg_ref[b]
            logprev_ref[j] = log_new
            out_ref[j, i - 1] = (pos_ev - neg_ev).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(1, n, body, 0)


@functools.partial(jax.jit, static_argnames=("spp", "tile_h"))
def simulate(video, seeds, pos, neg, noise, *, spp: int, tile_h: int):
    b, n, h, w = video.shape
    grid = (b // spp, h // tile_h)
    return pl.pallas_call(
        functools.partial(_kernel, spp=spp),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
        + [pl.BlockSpec((spp, n, tile_h, w), lambda bi, ti: (bi, 0, ti, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((spp, n - 1, tile_h, w),
                               lambda bi, ti: (bi, 0, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n - 1, h, w), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((spp, tile_h, w), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(seeds.astype(jnp.int32), pos, neg, noise, video)


def main():
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (B, 1, H, W)).astype(np.float32)
    drift = np.cumsum(rng.randn(B, N, H, W).astype(np.float32) * 4, axis=1)
    video = jnp.asarray(np.clip(base + drift, 0, 255).astype(np.uint8))
    pos = jnp.full((B,), 0.4, jnp.float32)
    neg = jnp.full((B,), 0.5, jnp.float32)
    noise = jnp.full((B,), 0.05, jnp.float32)

    iters = 50
    for spp, tile_h in [(1, 128), (2, 64), (4, 32), (2, 128)]:
        try:
            @jax.jit
            def chained(v):
                def it(i, acc):
                    seeds = jnp.full((B,), 7, jnp.int32) + i \
                        + (acc * 0).astype(jnp.int32)
                    out = simulate(v, seeds, pos, neg, noise,
                                   spp=spp, tile_h=tile_h)
                    return acc + out[0, 0, 0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, iters, it, jnp.float32(0))

            float(chained(video))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(video))
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[1]
            print(f"spp={spp} tile_h={tile_h}: "
                  f"{B * iters / dt:8.0f} clips/s", flush=True)
        except Exception as e:
            print(f"spp={spp} tile_h={tile_h}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
