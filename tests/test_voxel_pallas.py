"""Pallas simulator kernel: parity with the jnp/golden path (noise-free
exact) and statistical checks for the noisy path. Runs in interpreter
mode on CPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from v2v_tpu.ops import voxel as vx
from v2v_tpu.ops.voxel_pallas import simulate_batch_pallas
from golden_esim import golden_video_to_voxel

INTERPRET = jax.default_backend() == "cpu"
# the TPU prng primitives have no CPU-interpreter lowering
needs_tpu_prng = pytest.mark.skipif(
    INTERPRET, reason="pltpu.prng_* unsupported in CPU interpret mode")


def _videos(b=2, n=11, h=32, w=128, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (b, 1, h, w)).astype(np.float32)
    drift = np.cumsum(rng.randn(b, n, h, w) * 6, axis=1)
    return np.clip(base + drift, 0, 255).astype(np.float32)


def _batch_params(b, pos=0.3, neg=0.25, noise=0.0, hot_frac=0.0, hot_std=0.0):
    return vx.SimParams(
        pos_thres=jnp.full((b,), pos), neg_thres=jnp.full((b,), neg),
        base_noise_std=jnp.full((b,), noise),
        hot_pixel_fraction=jnp.full((b,), hot_frac),
        hot_pixel_std=jnp.full((b,), hot_std))


def test_pallas_noise_free_matches_golden():
    videos = _videos()
    b = videos.shape[0]
    out = simulate_batch_pallas(
        jnp.asarray(videos), jnp.zeros((b,), jnp.int32), _batch_params(b),
        noise_free=True, interpret=INTERPRET)
    out = np.asarray(out)
    for i in range(b):
        want = golden_video_to_voxel(videos[i], 0.3, 0.25)
        diff = np.abs(out[i] - want)
        assert (diff > 0).mean() < 1e-4, (diff > 0).mean()
        assert diff.max() <= 1.0


def test_pallas_black_video_finite():
    b = 1
    videos = np.zeros((b, 5, 16, 128), np.float32)
    out = np.asarray(simulate_batch_pallas(
        jnp.asarray(videos), jnp.zeros((b,), jnp.int32), _batch_params(b),
        noise_free=True, interpret=INTERPRET))
    assert np.isfinite(out).all()
    assert np.abs(out).sum() == 0


@needs_tpu_prng
def test_pallas_noise_statistics():
    """Noise-on path: event rate from pure noise should match theory
    roughly (potential random walk with std sigma per frame against
    threshold theta)."""
    b, n, h, w = 1, 41, 64, 128
    videos = np.full((b, n, h, w), 128.0, np.float32)   # static video
    sigma, theta = 0.2, 0.3
    out = np.asarray(simulate_batch_pallas(
        jnp.asarray(videos), jnp.asarray([123], jnp.int32),
        _batch_params(b, pos=theta, neg=theta, noise=sigma),
        interpret=INTERPRET))
    # noise events must fire and be roughly polarity-balanced
    total = np.abs(out).sum()
    assert total > 1000
    assert abs(out.sum()) / total < 0.2
    # different seeds -> different noise
    out2 = np.asarray(simulate_batch_pallas(
        jnp.asarray(videos), jnp.asarray([77], jnp.int32),
        _batch_params(b, pos=theta, neg=theta, noise=sigma),
        interpret=INTERPRET))
    assert not np.array_equal(out, out2)
    # same seed -> deterministic
    out3 = np.asarray(simulate_batch_pallas(
        jnp.asarray(videos), jnp.asarray([123], jnp.int32),
        _batch_params(b, pos=theta, neg=theta, noise=sigma),
        interpret=INTERPRET))
    np.testing.assert_array_equal(out, out3)


@needs_tpu_prng
def test_pallas_hot_pixels_persistent():
    b, n, h, w = 1, 21, 32, 128
    videos = np.full((b, n, h, w), 128.0, np.float32)
    out = np.asarray(simulate_batch_pallas(
        jnp.asarray(videos), jnp.asarray([5], jnp.int32),
        _batch_params(b, pos=0.3, neg=0.3, noise=0.0,
                      hot_frac=0.05, hot_std=1.0),
        interpret=INTERPRET))
    # hot pixels fire repeatedly at the same locations
    rates = np.abs(out).sum(axis=1)[0]      # (h, w) counts over time
    hot = rates > 5
    assert hot.sum() > 10                    # ~5% of 4096 pixels
    assert (rates[~hot] == 0).mean() > 0.9   # non-hot pixels quiet
