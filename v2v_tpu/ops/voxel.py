"""Video->voxel event simulation and events->voxel binning, on device.

This module is the TPU-native replacement for the reference's CPU-side
simulator and voxel builders:

  * `esim_video_to_voxel`     — per-pixel log-intensity threshold-crossing
    event emulation, semantics matching data/v2v_core_esim.py:26-69 of the
    reference (reverse gamma, membrane potential, multi-event quantization
    via floor division, base + persistent hot-pixel noise).
  * `simulate_sequence`       — the imgs->voxels pipeline of
    data/v2v_datasets.py:363-410 (random per-video thresholds, noise
    sampling, bin accumulation) as a pure function of a PRNG key.
  * `events_to_voxel_np`      — exact numpy twin of the h5 test-path
    voxelizer (data/testh5.py:60-90), discrete and temporal-bilinear.
  * `events_to_voxel`         — jittable padded/masked version of the same
    math for on-device voxelization of raw event streams.

Everything here is shape-static and jit/vmap/scan friendly. The reference
runs all of this in numpy inside dataloader worker processes; here the
host only ships uint8 frames and the simulation runs fused on the TPU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def reverse_gamma_correction(imgs, gamma: float = 2.2):
    """Linearize sRGB-ish video. Matches data/v2v_core_esim.py:3-4."""
    return (imgs / 255.0) ** gamma * 255.0


class SimParams(NamedTuple):
    """Per-sample ESIM emulator parameters (all scalars, traceable)."""
    pos_thres: jax.Array        # positive contrast threshold
    neg_thres: jax.Array        # negative contrast threshold
    base_noise_std: jax.Array   # gaussian noise added to potential each frame
    hot_pixel_fraction: jax.Array
    hot_pixel_std: jax.Array


DEFAULT_SIM_PARAMS = SimParams(
    pos_thres=jnp.float32(0.2),
    neg_thres=jnp.float32(0.2),
    base_noise_std=jnp.float32(0.1),
    hot_pixel_fraction=jnp.float32(0.001),
    hot_pixel_std=jnp.float32(0.1),
)


def _quantize_events(potential, pos_thres, neg_thres):
    """Multi-event threshold crossing: how many events fire this frame and
    the residual potential. Matches v2v_core_esim.py:51-58 exactly
    (float floor-division semantics)."""
    pos_events = jnp.where(
        potential >= pos_thres, jnp.floor(potential / pos_thres), 0.0)
    neg_events = jnp.where(
        potential <= -neg_thres, jnp.floor(-potential / neg_thres), 0.0)
    new_potential = potential - pos_events * pos_thres + neg_events * neg_thres
    return pos_events - neg_events, new_potential


def esim_video_to_voxel(
    video: jax.Array,
    params: SimParams = DEFAULT_SIM_PARAMS,
    *,
    key: Optional[jax.Array] = None,
    put_noise_external: bool = False,
    init_potential: Optional[jax.Array] = None,
) -> jax.Array:
    """Simulate event count frames from a grayscale video.

    Args:
      video: (N, H, W) float32 in [0, 255] (uint8 accepted, will be cast).
      params: emulator parameters (scalars; vmap over batch for per-sample
        randomized thresholds).
      key: PRNG key for potential init + noise. If None, runs noise-free
        with zero-initialized potential (the deterministic golden path).
      put_noise_external: if True, noise is added to the output count frame
        instead of the membrane potential (v2v_core_esim.py:62-65).
      init_potential: optional (H, W) explicit initial potential (overrides
        the U(-neg_thres, pos_thres) random init).

    Returns:
      (N-1, H, W) float32 signed event-count frames (pos - neg), plus noise
      if put_noise_external.
    """
    video = video.astype(jnp.float32)
    n, h, w = video.shape
    log_imgs = jnp.log(0.001 + reverse_gamma_correction(video) / 255.0)
    diffs = log_imgs[1:] - log_imgs[:-1]

    noise_free = key is None
    if noise_free:
        key = jax.random.PRNGKey(0)
    k_pot, k_hot_mask, k_hot_val, k_base = jax.random.split(key, 4)

    if init_potential is not None:
        potential = init_potential.astype(jnp.float32)
    elif noise_free:
        potential = jnp.zeros((h, w), jnp.float32)
    else:
        potential = (jax.random.uniform(k_pot, (h, w))
                     * (params.pos_thres + params.neg_thres) - params.neg_thres)

    if noise_free:
        hot_noise = jnp.zeros((h, w), jnp.float32)
        base_noise = jnp.zeros((n - 1, h, w), jnp.float32)
    else:
        hot_mask = jax.random.uniform(k_hot_mask, (h, w)) < params.hot_pixel_fraction
        hot_noise = jnp.where(
            hot_mask, params.hot_pixel_std * jax.random.normal(k_hot_val, (h, w)), 0.0)
        base_noise = params.base_noise_std * jax.random.normal(k_base, (n - 1, h, w))

    def step(potential, xs):
        diff, noise = xs
        potential = potential + diff
        if not put_noise_external:
            potential = potential + noise + hot_noise
        counts, potential = _quantize_events(
            potential, params.pos_thres, params.neg_thres)
        if put_noise_external:
            counts = counts + noise + hot_noise
        return potential, counts

    _, voxels = jax.lax.scan(step, potential, (diffs, base_noise))
    return voxels


class SimConfig(NamedTuple):
    """Randomization ranges for per-sample simulator parameters.
    Defaults mirror data/v2v_datasets.py:54-60 / config
    train_v2v_e2vid_10k.yaml:72-75."""
    threshold_range: Tuple[float, float] = (0.05, 2.0)
    max_thres_pos_neg_gap: float = 1.5
    base_noise_std_range: Tuple[float, float] = (0.0, 0.2)
    hot_pixel_fraction_range: Tuple[float, float] = (0.0, 0.001)
    hot_pixel_std_range: Tuple[float, float] = (0.0, 0.2)
    put_noise_external: bool = False
    scale_noise_strength: bool = False


def sample_sim_params(key: jax.Array, cfg: SimConfig,
                      fixed_pos: Optional[jax.Array] = None,
                      fixed_neg: Optional[jax.Array] = None) -> SimParams:
    """Draw per-sample emulator parameters.
    Semantics of data/v2v_datasets.py:368-386: theta1 ~ U(range),
    gap ~ U(1, max_gap), random pos/neg assignment, noise stds ~ U(range),
    optional scaling of noise by pos_thres.

    `fixed_pos`/`fixed_neg` pin the thresholds (the fixed-threshold
    ablation stamps them per video, scripts/generate_random_thresholds);
    noise is still sampled — and scaled by the FIXED pos threshold when
    scale_noise_strength, matching the reference's order."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    lo, hi = cfg.threshold_range
    thres_1 = jax.random.uniform(k1, minval=lo, maxval=hi)
    gap = jax.random.uniform(k2, minval=1.0, maxval=cfg.max_thres_pos_neg_gap)
    thres_2 = thres_1 * gap
    swap = jax.random.uniform(k3) > 0.5
    pos_thres = jnp.where(swap, thres_1, thres_2)
    neg_thres = jnp.where(swap, thres_2, thres_1)
    if fixed_pos is not None:
        pos_thres = jnp.asarray(fixed_pos, jnp.float32)
    if fixed_neg is not None:
        neg_thres = jnp.asarray(fixed_neg, jnp.float32)

    base_noise_std = jax.random.uniform(
        k4, minval=cfg.base_noise_std_range[0], maxval=cfg.base_noise_std_range[1])
    hot_pixel_fraction = jax.random.uniform(
        k5, minval=cfg.hot_pixel_fraction_range[0],
        maxval=cfg.hot_pixel_fraction_range[1])
    hot_pixel_std = jax.random.uniform(
        k6, minval=cfg.hot_pixel_std_range[0], maxval=cfg.hot_pixel_std_range[1])

    if cfg.scale_noise_strength and not cfg.put_noise_external:
        base_noise_std = base_noise_std * pos_thres
        hot_pixel_std = hot_pixel_std * pos_thres

    return SimParams(pos_thres, neg_thres, base_noise_std,
                     hot_pixel_fraction, hot_pixel_std)


def simulate_sequence(
    frames: jax.Array,
    key: jax.Array,
    cfg: SimConfig = SimConfig(),
    *,
    num_bins: int = 5,
    frames_per_bin: int = 1,
    fixed_params: Optional[SimParams] = None,
) -> Tuple[jax.Array, SimParams]:
    """Full imgs->voxels pipeline for one sample.

    Args:
      frames: (N, H, W) grayscale video, N = L*num_bins*frames_per_bin + 1.
    Returns:
      voxels: (L, num_bins, H, W) signed event counts, summing
        frames_per_bin count-frames per bin (v2v_datasets.py:398-400).
      params: the sampled emulator parameters (the reference returns these
        as `v2e_params`, v2v_datasets.py:402-408).
    """
    n = frames.shape[0]
    fpi = num_bins * frames_per_bin
    assert (n - 1) % fpi == 0, (n, num_bins, frames_per_bin)
    seq_len = (n - 1) // fpi

    k_params, k_sim = jax.random.split(key)
    params = fixed_params if fixed_params is not None else sample_sim_params(k_params, cfg)

    counts = esim_video_to_voxel(
        frames, params, key=k_sim, put_noise_external=cfg.put_noise_external)
    h, w = frames.shape[1:]
    voxels = counts.reshape(seq_len, num_bins, frames_per_bin, h, w).sum(axis=2)
    return voxels, params


# vmapped batch variant: frames (B, N, H, W), keys (B, 2)
simulate_batch = jax.vmap(simulate_sequence, in_axes=(0, 0), out_axes=(0, 0))


def esim_video_to_voxel_np(
    video: np.ndarray, pos_thres: float, neg_thres: float,
    base_noise_std: float = 0.0, hot_pixel_fraction: float = 0.0,
    hot_pixel_std: float = 0.0, put_noise_external: bool = False,
) -> np.ndarray:
    """Host-side numpy emulator for the CPU-parity dataloader path.

    Uses numpy's global RNG with the reference's draw order
    (data/v2v_core_esim.py:26-69): potential init, hot mask, hot values,
    then one base-noise field per frame. Returns (N-1, H, W) float64.
    """
    n, h, w = video.shape
    potential = np.random.rand(h, w) * (pos_thres + neg_thres) - neg_thres
    video = reverse_gamma_correction(video)
    log_imgs = np.log(0.001 + video / 255.0)
    hot_mask = np.random.rand(h, w) < hot_pixel_fraction
    hot_noise = np.where(hot_mask, hot_pixel_std * np.random.randn(h, w), 0)

    out = []
    for i in range(n - 1):
        potential += log_imgs[i + 1] - log_imgs[i]
        base_noise = base_noise_std * np.random.randn(h, w)
        if not put_noise_external:
            potential += base_noise + hot_noise
        pos_ev = np.where(potential >= pos_thres,
                          np.floor_divide(potential, pos_thres), 0)
        neg_ev = np.where(potential <= -neg_thres,
                          np.floor_divide(-potential, neg_thres), 0)
        potential -= pos_ev * pos_thres
        potential += neg_ev * neg_thres
        frame = pos_ev - neg_ev
        if put_noise_external:
            frame = frame + base_noise + hot_noise
        out.append(frame)
    return np.asarray(out)


# ---------------------------------------------------------------------------
# events -> voxel (the h5 test path)
# ---------------------------------------------------------------------------

def events_to_voxel_np(
    ts: np.ndarray, xs: np.ndarray, ys: np.ndarray, ps: np.ndarray,
    *, num_bins: int, height: int, width: int, interpolate_bins: bool = False,
) -> np.ndarray:
    """Exact host-side twin of the reference h5 voxelizer
    (data/testh5.py:60-90). Polarities arrive in {0,1}; timestamps in
    seconds (float). Returns (num_bins, H, W) float64.

    Used by the h5 test datasets so that test-time voxels are bit-identical
    to the reference pipeline; `events_to_voxel` below is the on-device
    equivalent (validated against this in tests/test_voxel.py).
    """
    voxel = np.zeros((num_bins, height, width))
    if ts.shape[0] == 0:
        return voxel
    pol = ps.astype(np.int8) * 2 - 1
    t_us = ((ts - ts[0]) * 1e6).astype(np.int64)
    if not interpolate_bins:
        t_per_bin = (t_us[-1] + 0.001) / num_bins
        bin_idx = np.floor(t_us / t_per_bin).astype(np.uint8)
        np.add.at(voxel, (bin_idx, ys, xs), pol)
    else:
        dt = t_us[-1] - t_us[0]
        t_norm = (t_us - t_us[0]) / (dt + 0.0001) * (num_bins - 1)
        for bi in range(num_bins):
            weights = np.maximum(0, 1.0 - np.abs(t_norm - bi))
            np.add.at(voxel, (bi, ys, xs), weights * pol)
    return voxel


def relative_us(ts: np.ndarray) -> np.ndarray:
    """Host-side exact conversion of float64 second timestamps to
    int microseconds relative to the first event (data/testh5.py:68).
    Do this on host — float32 seconds lose ~10us of precision on device."""
    if ts.shape[0] == 0:
        return ts.astype(np.int64)
    return ((ts - ts[0]) * 1e6).astype(np.int64)


@functools.partial(
    jax.jit, static_argnames=("num_bins", "height", "width", "interpolate_bins"))
def events_to_voxel(
    t_us: jax.Array, xs: jax.Array, ys: jax.Array, ps: jax.Array,
    n_events: jax.Array,
    *, num_bins: int, height: int, width: int, interpolate_bins: bool = False,
) -> jax.Array:
    """Jittable events->voxel for padded event streams.

    Args:
      t_us: (E,) int32/float32 microseconds relative to the first valid
        event (use `relative_us` on host; sorted; pad tail arbitrary).
      xs, ys: (E,) int32 pixel coordinates.
      ps: (E,) polarities in {0, 1}.
      n_events: scalar int32, number of valid events (<= E).

    Same math as `events_to_voxel_np`; padded tail is masked to zero
    weight. Returns (num_bins, H, W) float32.
    """
    e = t_us.shape[0]
    idx = jnp.arange(e)
    valid = idx < n_events
    pol = jnp.where(valid, ps.astype(jnp.int32) * 2 - 1, 0).astype(jnp.float32)

    t_us = t_us.astype(jnp.float32)
    t_last = t_us[jnp.maximum(n_events - 1, 0)]

    flat_hw = ys.astype(jnp.int32) * width + xs.astype(jnp.int32)

    if not interpolate_bins:
        t_per_bin = (t_last + 0.001) / num_bins
        bin_idx = jnp.floor(t_us / t_per_bin).astype(jnp.int32)
        bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)
        flat = bin_idx * (height * width) + flat_hw
        voxel = jnp.zeros((num_bins * height * width,), jnp.float32)
        voxel = voxel.at[flat].add(pol, mode="drop")
    else:
        dt = t_last - 0.0
        t_norm = t_us / (dt + 0.0001) * (num_bins - 1)
        voxel = jnp.zeros((num_bins * height * width,), jnp.float32)
        for bi in range(num_bins):
            weights = jnp.maximum(0.0, 1.0 - jnp.abs(t_norm - bi)) * pol
            voxel = voxel.at[bi * height * width + flat_hw].add(
                weights, mode="drop")
    return voxel.reshape(num_bins, height, width)
