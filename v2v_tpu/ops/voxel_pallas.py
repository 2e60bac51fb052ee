"""Pallas TPU kernel for the fused video->voxel event simulator.

The jnp scan version (ops/voxel.py) pays per-frame kernel dispatches and
HBM round-trips for the carried membrane potential. This kernel keeps
the per-pixel state (potential, previous log frame, hot-pixel noise) in
VMEM scratch for an entire (batch, row-tile) block and loops over all N
frames on-core:

  grid: (B, H/TILE_H) — each program simulates TILE_H rows of one clip
  in : video block (N, TILE_H, W) f32, streamed from HBM once
  out: counts block (N-1, TILE_H, W) f32, written once
  rng: on-core PRNG (pltpu.prng_random_bits) + Box-Muller for the
       gaussian base/hot-pixel noise; per-(sample, tile) seeds

HBM traffic is exactly read-video + write-counts — the bandwidth lower
bound. Threshold/noise parameters are per-sample scalars in SMEM.

Noise parity vs the numpy reference is statistical (different RNG); the
zero-noise path is bit-compatible with esim_video_to_voxel (same
float32 ops; golden tests in tests/test_voxel_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .voxel import SimParams

Array = jax.Array

_TWO_PI = 6.283185307179586


def _uniform01(shape):
    """random bits -> float32 uniform in (0, 1]. prng_random_bits yields
    SIGNED int32 — bitcast before shifting or the arithmetic shift
    biases the sample negative."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # logical shift leaves 24 bits; go back to int32 for the float cast
    # (mosaic has no uint32->float32 lowering)
    small = pltpu.bitcast(bits >> 8, jnp.int32)
    return small.astype(jnp.float32) * (1.0 / (1 << 24)) + (
        1.0 / (1 << 24))


def _gaussian(shape, fast: bool = True):
    """Gaussian noise. fast=True: Irwin-Hall sum of the 4 independent
    uniform bytes of ONE prng word, scaled to unit variance — no
    transcendentals and a single prng_random_bits call (the per-frame
    gaussian is the kernel's hottest op; 4 separate uniform draws made
    RNG the dominant cost). Quantized to 1021 levels and truncated at
    ±3.45σ — irrelevant for noise augmentation. fast=False: exact
    Box-Muller."""
    if fast:
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        s = ((bits & 0xFF) + ((bits >> 8) & 0xFF)
             + ((bits >> 16) & 0xFF) + ((bits >> 24) & 0xFF))
        s = pltpu.bitcast(s, jnp.int32).astype(jnp.float32)
        # mean 4*255/2 = 510; std sqrt(4*(256^2-1)/12) = 147.795
        return (s - 510.0) * (1.0 / 147.7950834)
    u1 = _uniform01(shape)
    u2 = _uniform01(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def sample_gaussian_pallas(seed: int, shape=(256, 256), fast: bool = True,
                           interpret: bool = False) -> Array:
    """Draw raw samples from the kernel's gaussian generator (the fast
    Irwin-Hall path by default) for statistical verification — the
    moment checks in tests/test_voxel_pallas.py run this on TPU."""
    def kern(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0])
        out_ref[:] = _gaussian(out_ref.shape, fast)

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32))


def _sim_kernel(seed_ref, pos_ref, neg_ref, noise_ref, hotfrac_ref,
                hotstd_ref, video_ref, out_ref, pot_ref, logprev_ref,
                hot_ref, *, noise_free: bool, fast_gaussian: bool = True):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    n = video_ref.shape[1]          # block is (1, N, TILE_H, W)

    # scalar params arrive as whole (B,) SMEM arrays (rank-1 partial
    # blocking is not supported by the TPU lowering)
    pos_thres = pos_ref[b]
    neg_thres = neg_ref[b]
    base_std = noise_ref[b]
    hot_frac = hotfrac_ref[b]
    hot_std = hotstd_ref[b]

    shape = pot_ref.shape                      # (TILE_H, W)

    # initial state: potential ~ U(-neg, pos); persistent hot noise.
    # (prng only touched when noise is on — the TPU prng primitives have
    # no CPU-interpreter lowering, and the noise-free path must stay
    # runnable there for the golden tests)
    if noise_free:
        pot_ref[:] = jnp.zeros(shape, jnp.float32)
        hot_ref[:] = jnp.zeros(shape, jnp.float32)
    else:
        pltpu.prng_seed(seed_ref[b] + tile * 7919)
        u = _uniform01(shape)
        pot_ref[:] = u * (pos_thres + neg_thres) - neg_thres
        hot_mask = _uniform01(shape) < hot_frac
        hot_ref[:] = jnp.where(
            hot_mask, hot_std * _gaussian(shape, fast_gaussian), 0.0)

    def load_frame(i):
        f = video_ref[0, i]
        if f.dtype == jnp.uint8:
            # mosaic has no direct uint8->f32 cast; hop through int32
            f = f.astype(jnp.int32)
        return f.astype(jnp.float32)

    logprev_ref[:] = jnp.log(0.001 + (load_frame(0) * (1.0 / 255.0)) ** 2.2)

    def body(i, _):
        frame = load_frame(i)
        log_new = jnp.log(0.001 + (frame * (1.0 / 255.0)) ** 2.2)
        pot = pot_ref[:] + (log_new - logprev_ref[:])
        if not noise_free:
            pot = pot + base_std * _gaussian(shape, fast_gaussian) + hot_ref[:]
        pos_ev = jnp.where(pot >= pos_thres,
                           jnp.floor(pot / pos_thres), 0.0)
        neg_ev = jnp.where(pot <= -neg_thres,
                           jnp.floor(-pot / neg_thres), 0.0)
        pot_ref[:] = pot - pos_ev * pos_thres + neg_ev * neg_thres
        logprev_ref[:] = log_new
        # counts are small integers (|.| <= ~140): exact in bf16, and
        # the f32 upcast downstream restores them bit-exactly while the
        # write traffic halves
        out_ref[0, i - 1] = (pos_ev - neg_ev).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(1, n, body, 0)


def _auto_tile_h(h: int, w: int) -> int:
    """Largest row-tile that divides H within the VMEM block budget.
    Bigger tiles amortize the per-frame loop overhead: 16->64 rows
    measured 5060->7740 clips/s at 128^2. Prefers multiple-of-8 tiles
    (f32 sublane packing); falls back to ANY divisor so sensor
    resolutions like 180 rows still run, and raises a clear error when
    no tile fits (callers should use the esim_video_to_voxel scan
    path then, as the train-step gate _pallas_ok does)."""
    for tile in (128, 64, 32, 16, 8):
        if h % tile == 0 and tile * w <= 16384:
            return tile
    for tile in range(min(h, 16384 // max(w, 1)), 0, -1):
        if h % tile == 0:
            return tile
    raise ValueError(
        f"no feasible row tile for H={h}, W={w} (W too wide for the "
        f"VMEM block budget); use the jnp scan simulator instead")


@functools.partial(jax.jit, static_argnames=("tile_h", "noise_free",
                                             "interpret", "fast_gaussian"))
def simulate_batch_pallas(
    video: Array, seeds: Array, params: SimParams,
    *, tile_h: int = None, noise_free: bool = False,
    interpret: bool = False, fast_gaussian: bool = True,
) -> Array:
    """(B, N, H, W) video + (B,) int32 seeds + per-sample SimParams
    (each field (B,)) -> (B, N-1, H, W) signed event-count frames.

    The drop-in fast path for `synthesize_batch`; bin summation and GT
    frame selection stay in XLA (cheap reshapes).

    uint8 video is consumed directly (converted per frame in VMEM) —
    casting to f32 up front would quadruple the kernel's HBM read
    traffic and add a full materialization pass.

    Non-lane-aligned shapes (H not a multiple of 8, W not a multiple of
    128) are edge-padded up front and the counts sliced back: each pixel
    simulates independently, so padded pixels are discarded rows, and
    the kernel is VPU-latency-bound, not bandwidth-bound (docs/PERF.md),
    so the padding costs only its area fraction — vs a ~60x slower jnp
    scan fallback a silent gate used to impose on e.g. 160^2 crops.
    """
    if video.dtype not in (jnp.uint8, jnp.float32):
        video = video.astype(jnp.float32)
    b, n, h, w = video.shape
    pad_h, pad_w = -h % 8, -w % 128
    if pad_h or pad_w:
        video = jnp.pad(video, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)),
                        mode="edge")
        counts = simulate_batch_pallas(
            video, seeds, params, tile_h=tile_h, noise_free=noise_free,
            interpret=interpret, fast_gaussian=fast_gaussian)
        return counts[:, :, :h, :w]
    if tile_h is None:
        tile_h = _auto_tile_h(h, w)
    assert h % tile_h == 0, (h, tile_h)
    grid = (b, h // tile_h)

    def scalar_spec():
        return pl.BlockSpec(memory_space=pltpu.SMEM)   # whole (B,) array

    kernel = functools.partial(_sim_kernel, noise_free=noise_free,
                               fast_gaussian=fast_gaussian)
    counts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[scalar_spec() for _ in range(6)]
        + [pl.BlockSpec((1, n, tile_h, w),
                        lambda bi, ti: (bi, 0, ti, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n - 1, tile_h, w),
                               lambda bi, ti: (bi, 0, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n - 1, h, w), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((tile_h, w), jnp.float32),   # potential
            pltpu.VMEM((tile_h, w), jnp.float32),   # prev log frame
            pltpu.VMEM((tile_h, w), jnp.float32),   # hot noise
        ],
        # The 128-row tile's double-buffered blocks sit at ~19 MB, above
        # the compiler's 16 MB scoped-VMEM default; whether a compile
        # fits then depends on the surrounding program (the fused train
        # step tripped it, the standalone kernel did not). Raise the
        # limit explicitly — v5e VMEM is 128 MB.
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seeds.astype(jnp.int32),
      params.pos_thres.astype(jnp.float32),
      params.neg_thres.astype(jnp.float32),
      params.base_noise_std.astype(jnp.float32),
      params.hot_pixel_fraction.astype(jnp.float32),
      params.hot_pixel_std.astype(jnp.float32),
      video)
    # f32 API: noise-free counts (<= ~140) round-trip bf16 exactly; the
    # upcast fuses into the caller's bin-sum under jit
    return counts.astype(jnp.float32)
