"""V2E-style full DVS pixel model, on device (reference
data/v2v_core_v2e.py — kept by the reference as a deprecated but more
physical alternative to the ESIM emulator).

Models, per pixel:
  * lin-log intensity mapping — NOTE the reference's lin_log overwrites
    its piecewise linear/log result with `log(x/255 + 0.01)`
    (v2v_core_v2e.py:135), so that is the effective mapping, kept here;
  * intensity-dependent first-order IIR low-pass photoreceptor
    (cutoff_hz, tau scaled by rescaled intensity, :139-182);
  * leak current with per-pixel log-normal rate and jitter (:192-211);
  * multi-event threshold quantization (floor division, :44-63);
  * Poisson shot noise scaled by intensity and per-pixel threshold
    (:65-105);
  * refractory-period clipping (:534-537);
  * four per-pixel threshold models (:280-283,333-343,417-426):
    pn_related, spatial_temporal_independent, spatial_independent,
    spatial_independent_temporal_changing.

Implemented as a `lax.scan` over frames with the pixel state
(base/lowpass log frames, thresholds) as carry.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

SHOT_NOISE_INTEN_FACTOR = 0.25

THRESHOLD_MODELS = ("pn_related", "spatial_temporal_independent",
                    "spatial_independent",
                    "spatial_independent_temporal_changing")


class V2EConfig(NamedTuple):
    threshold_model: str = "pn_related"
    thres_mean_mean: float = 0.5
    thres_mean_std: float = 0.1
    thres_diff_mean: float = 0.0
    thres_diff_std: float = 0.1
    cutoff_hz: float = 0.0
    leak_rate_hz: float = 0.1
    refractory_period_s: float = 0.0
    shot_noise_rate_hz: float = 0.0
    leak_jitter_fraction: float = 0.1
    noise_rate_cov_decades: float = 0.1


def lin_log(x: Array) -> Array:
    """Effective reference mapping (v2v_core_v2e.py:135)."""
    return jnp.log(x / 255.0 + 0.01)


def rescale_intensity_frame(frame: Array) -> Array:
    """(v2v_core_v2e.py:185-191)"""
    return (frame + 20.0) / 275.0


def _clip_thres(pos, neg, cfg: V2EConfig):
    pos = jnp.maximum(pos, 0.01)
    neg = jnp.maximum(neg, 0.01)
    pos_nominal = cfg.thres_mean_mean + cfg.thres_diff_mean / 2
    neg_nominal = cfg.thres_mean_mean - cfg.thres_diff_mean / 2
    return pos, neg, pos_nominal / pos, neg_nominal / neg


def v2e_video_to_voxel(video: Array, cfg: V2EConfig, key: Array,
                       fps: float = 24.0) -> Array:
    """(N, H, W) uint8/float video -> (N-1, H, W) signed event counts
    (+ shot noise), the v2e equivalent of esim_video_to_voxel
    (video_to_voxel, v2v_core_v2e.py:560-585)."""
    video = video.astype(jnp.float32)
    n, h, w = video.shape
    delta_time = 1.0 / fps
    k_init, k_noise_rate, k_scan = jax.random.split(key, 3)

    # --- initial per-pixel thresholds (_init, :333-343) ---------------
    k1, k2 = jax.random.split(k_init)
    if cfg.threshold_model == "pn_related":
        pn_mean = (cfg.thres_mean_mean
                   + cfg.thres_mean_std * jax.random.normal(k1, (h, w)))
        pn_diff = (cfg.thres_diff_mean
                   + cfg.thres_diff_std * jax.random.normal(k2, (h, w)))
        pos0 = pn_mean + pn_diff / 2
        neg0 = pn_mean - pn_diff / 2
    elif cfg.threshold_model in THRESHOLD_MODELS:
        pos0 = (cfg.thres_mean_mean
                + cfg.thres_mean_std * jax.random.normal(k1, (h, w)))
        neg0 = (cfg.thres_mean_mean
                + cfg.thres_mean_std * jax.random.normal(k2, (h, w)))
    else:
        raise ValueError(cfg.threshold_model)

    # per-pixel log-normal leak/noise rate (:348-350)
    noise_rate = jnp.exp(math.log(10) * cfg.noise_rate_cov_decades
                         * jax.random.normal(k_noise_rate, (h, w)))

    log0 = lin_log(video[0])

    def step(carry, xs):
        base_log, lp_log, pos_thres, neg_thres = carry
        frame, k = xs
        k_th1, k_th2, k_leak, k_shot1, k_shot2 = jax.random.split(k, 5)

        # threshold model updates (:417-426)
        if cfg.threshold_model == "spatial_temporal_independent":
            pos_thres = (cfg.thres_mean_mean + cfg.thres_mean_std
                         * jax.random.normal(k_th1, (h, w)))
            neg_thres = (cfg.thres_mean_mean + cfg.thres_mean_std
                         * jax.random.normal(k_th2, (h, w)))
        elif cfg.threshold_model == "spatial_independent_temporal_changing":
            pos_thres = pos_thres + cfg.thres_diff_std * jax.random.normal(
                k_th1, (h, w))
            neg_thres = neg_thres + cfg.thres_diff_std * jax.random.normal(
                k_th2, (h, w))
        pos_thres, neg_thres, pos_pre, neg_pre = _clip_thres(
            pos_thres, neg_thres, cfg)

        log_new = lin_log(frame)
        inten01 = rescale_intensity_frame(frame)

        # intensity-dependent IIR low pass (:139-182)
        if cfg.cutoff_hz > 0:
            tau = 1.0 / (math.pi * 2 * cfg.cutoff_hz)
            eps = jnp.minimum(inten01 * (delta_time / tau), 1.0)
            lp_log = (1 - eps) * lp_log + eps * log_new
        else:
            lp_log = log_new

        # leak current (:192-211)
        if cfg.leak_rate_hz > 0:
            rand = jax.random.normal(k_leak, (h, w))
            leak_rate = (cfg.leak_rate_hz * noise_rate
                         * (1 - cfg.leak_jitter_fraction * rand))
            base_log = base_log - delta_time * leak_rate * pos_thres

        diff = lp_log - base_log
        pos_evts = jnp.floor(jnp.maximum(diff, 0.0) / pos_thres)
        neg_evts = jnp.floor(jnp.maximum(-diff, 0.0) / neg_thres)

        # shot noise (:65-105)
        if cfg.shot_noise_rate_hz > 0:
            inten_factor = 1 - (1 - SHOT_NOISE_INTEN_FACTOR) * inten01
            pos_factor = inten_factor * pos_pre
            pos_pix = pos_factor / pos_factor.mean()
            neg_factor = inten_factor * neg_pre
            neg_pix = neg_factor / neg_factor.mean()
            shot = (cfg.shot_noise_rate_hz / 2) * delta_time
            pos_shot = jax.random.poisson(k_shot1, pos_pix * shot, (h, w))
            neg_shot = jax.random.poisson(k_shot2, neg_pix * shot, (h, w))
            pos_evts = pos_evts + pos_shot
            neg_evts = neg_evts + neg_shot

        if cfg.refractory_period_s > 0:
            max_evs = int(delta_time / cfg.refractory_period_s)
            pos_evts = jnp.minimum(pos_evts, max_evs)
            neg_evts = jnp.minimum(neg_evts, max_evs)

        base_log = (base_log + pos_evts * pos_thres
                    - neg_evts * neg_thres)
        return (base_log, lp_log, pos_thres, neg_thres), pos_evts - neg_evts

    keys = jax.random.split(k_scan, n - 1)
    init = (log0, log0, pos0, neg0)
    _, voxels = jax.lax.scan(step, init, (video[1:], keys))
    return voxels
