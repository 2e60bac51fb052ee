"""Property-based tests (hypothesis) for the kernel invariants.

The golden/example tests pin exact reference semantics at fixed inputs;
these sweep randomized inputs for the structural invariants that must
hold for EVERY input — the class of checks the reference repo has none
of (SURVEY.md §4).
"""
import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from v2v_tpu.ops.events import (events_to_image, events_to_voxel_bilinear)
from v2v_tpu.ops.pad import CropParameters, pad_to_multiple, crop_from_multiple
from v2v_tpu.ops.voxel import (DEFAULT_SIM_PARAMS, SimParams,
                               esim_video_to_voxel, events_to_voxel_np)
from v2v_tpu.ops.warp import warp_by_flow, warp_by_flow_mxu

COMMON = dict(deadline=None, max_examples=20, derandomize=True,
              database=None)


# ---------------------------------------------------------------- events

@st.composite
def event_batches(draw, h=12, w=16):
    n = draw(st.integers(1, 64))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    xs = rng.randint(0, w, n).astype(np.float32)
    ys = rng.randint(0, h, n).astype(np.float32)
    ts = np.sort(rng.rand(n)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], n).astype(np.float32)
    return xs, ys, ts, ps, h, w


@settings(**COMMON)
@given(event_batches(), st.booleans())
def test_events_to_image_mass_conserved(batch, bilinear):
    """In-bounds events deposit exactly their weight (scatter-add is
    lossy only for out-of-range coords)."""
    xs, ys, ts, ps, h, w = batch
    img = events_to_image(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ps),
        jnp.int32(len(xs)), sensor_size=(h, w),
        interpolation="bilinear" if bilinear else None,
        # integer coords splat onto the x+1/y+1 neighbors with weight 0,
        # but x=w-1 would index out of range: pad like the reference does
        padding=bilinear)
    assert np.isclose(float(img.sum()), ps.sum(), atol=1e-4)


@settings(**COMMON)
@given(event_batches(), st.integers(0, 64))
def test_events_to_image_tail_masked(batch, n_valid):
    """Events past n_events must contribute nothing (bucket padding)."""
    xs, ys, ts, ps, h, w = batch
    n_valid = min(n_valid, len(xs))
    img_masked = events_to_image(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ps),
        jnp.int32(n_valid), sensor_size=(h, w))
    img_trunc = events_to_image(
        jnp.asarray(xs[:n_valid]), jnp.asarray(ys[:n_valid]),
        jnp.asarray(ps[:n_valid]), jnp.int32(n_valid), sensor_size=(h, w))
    np.testing.assert_allclose(np.asarray(img_masked),
                               np.asarray(img_trunc), atol=1e-6)


@settings(**COMMON)
@given(event_batches(), st.integers(2, 7), st.booleans())
def test_events_to_voxel_mass_conserved(batch, num_bins, temporal_bilinear):
    """Every event lands with total weight 1 across bins: discrete
    binning puts it in exactly one bin; the tent weights of the
    temporal-bilinear path sum to 1 for t_norm in [0, B-1]."""
    xs, ys, ts, ps, h, w = batch
    vox = events_to_voxel_bilinear(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts), jnp.asarray(ps),
        jnp.int32(len(xs)), num_bins=num_bins, sensor_size=(h, w),
        temporal_bilinear=temporal_bilinear)
    assert vox.shape == (num_bins, h, w)
    assert np.isclose(float(vox.sum()), ps.sum(), atol=1e-3)


@settings(**COMMON)
@given(event_batches(), st.integers(2, 5))
def test_events_to_voxel_np_matches_mass_and_dtype(batch, num_bins):
    xs, ys, ts, ps, h, w = batch
    pol01 = (ps > 0).astype(np.int8)          # reference h5 polarity {0,1}
    vox = events_to_voxel_np(ts.astype(np.float64), xs.astype(np.int64),
                             ys.astype(np.int64), pol01,
                             num_bins=num_bins, height=h, width=w)
    assert vox.shape == (num_bins, h, w)
    assert float(vox.sum()) == float((pol01.astype(np.int64) * 2 - 1).sum())
    # discrete path: strictly integer counts
    assert np.all(vox == np.round(vox))


@settings(**COMMON)
@given(st.integers(1, 400), st.integers(2, 40), st.integers(2, 40),
       st.integers(1, 6), st.booleans(), st.booleans(),
       st.integers(0, 2**31 - 1))
def test_native_builder_matches_numpy_everywhere(n, h, w, num_bins,
                                                 interp, same_ts, seed):
    """The C++ builder must equal the numpy voxelizer on arbitrary
    event streams, including degenerate ones (single event, all events
    at one timestamp, duplicate coords)."""
    from v2v_tpu.data.native import events_to_voxel_native, native_available
    if not native_available():
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(seed)
    ts = (np.full(n, 1000.0) if same_ts
          else np.sort(rng.rand(n)) * 0.05 + 1000.0)
    xs = rng.randint(0, w, n).astype(np.uint16)
    ys = rng.randint(0, h, n).astype(np.uint16)
    ps = rng.randint(0, 2, n).astype(np.uint8)
    want = events_to_voxel_np(ts, xs, ys, ps, num_bins=num_bins,
                              height=h, width=w, interpolate_bins=interp)
    got = events_to_voxel_native(ts, xs, ys, ps, num_bins=num_bins,
                                 height=h, width=w, interpolate_bins=interp)
    np.testing.assert_allclose(got, want, atol=1e-9)


# ------------------------------------------------------------------ warp

@st.composite
def image_and_flow(draw):
    b = draw(st.integers(1, 2))
    h = draw(st.integers(3, 10))
    w = draw(st.integers(3, 10))
    c = draw(st.integers(1, 3))
    rng = np.random.RandomState(draw(st.integers(0, 2**31 - 1)))
    img = rng.rand(b, h, w, c).astype(np.float32)
    flow = (rng.rand(b, h, w, 2).astype(np.float32) * 6 - 3)
    return img, flow


@settings(**COMMON)
@given(image_and_flow())
def test_warp_mxu_equals_gather_warp(data):
    """The separable tent-weight matmul warp must match the gather-based
    bilinear warp everywhere, including the zero-padding boundary."""
    img, flow = data
    a = np.asarray(warp_by_flow(jnp.asarray(img), jnp.asarray(flow)))
    b = np.asarray(warp_by_flow_mxu(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(a, b, atol=2e-5)


@settings(**COMMON)
@given(image_and_flow())
def test_warp_zero_flow_is_identity(data):
    img, _ = data
    out = warp_by_flow_mxu(jnp.asarray(img), jnp.zeros(img.shape[:3] + (2,)))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


@settings(**COMMON)
@given(image_and_flow(), st.integers(-3, 3), st.integers(-3, 3))
def test_warp_integer_flow_is_shift(data, dx, dy):
    """Constant integer flow = pure translation with zero fill:
    out(i,j) = img(i+dy, j+dx)."""
    img, _ = data
    b, h, w, c = img.shape
    flow = np.zeros((b, h, w, 2), np.float32)
    flow[..., 0] = dx
    flow[..., 1] = dy
    out = np.asarray(warp_by_flow_mxu(jnp.asarray(img), jnp.asarray(flow)))
    expect = np.zeros_like(img)
    src_y = np.arange(h) + dy
    src_x = np.arange(w) + dx
    vy = (src_y >= 0) & (src_y < h)
    vx = (src_x >= 0) & (src_x < w)
    dst = np.ix_(np.arange(b), np.arange(h)[vy], np.arange(w)[vx])
    src = np.ix_(np.arange(b), src_y[vy], src_x[vx])
    expect[dst] = img[src]
    np.testing.assert_allclose(out, expect, atol=1e-5)


# ------------------------------------------------------------------- pad

@settings(**COMMON)
@given(st.integers(1, 65), st.integers(1, 65), st.sampled_from([8, 16, 32]))
def test_pad_crop_roundtrip(h, w, multiple):
    rng = np.random.RandomState(h * 100 + w)
    x = rng.rand(2, h, w, 3).astype(np.float32)
    padded, hw = pad_to_multiple(jnp.asarray(x), multiple)
    assert padded.shape[1] % multiple == 0
    assert padded.shape[2] % multiple == 0
    np.testing.assert_array_equal(
        np.asarray(crop_from_multiple(padded, hw)), x)


@settings(**COMMON)
@given(st.integers(8, 80), st.integers(8, 80), st.integers(1, 3))
def test_crop_parameters_roundtrip(h, w, levels):
    """CropParameters.pad then .crop is the identity for any H, W
    (model/model_util.py:195-225 semantics)."""
    cp = CropParameters(w, h, levels)
    rng = np.random.RandomState(h + w)
    x = rng.rand(1, h, w, 2).astype(np.float32)
    padded = cp.pad(jnp.asarray(x))
    assert padded.shape[1] % (2 ** levels) == 0
    assert padded.shape[2] % (2 ** levels) == 0
    np.testing.assert_allclose(np.asarray(cp.crop(padded)), x, atol=0)


# -------------------------------------------------------------- simulator

@settings(**COMMON)
@given(st.integers(0, 255), st.integers(2, 8))
def test_esim_constant_video_emits_nothing(level, n_frames):
    video = jnp.full((n_frames, 6, 8), float(level))
    vox = esim_video_to_voxel(video)            # noise-free path
    assert float(jnp.abs(vox).sum()) == 0.0


@settings(**COMMON)
@given(st.integers(0, 2**31 - 1), st.floats(0.05, 2.0))
def test_esim_counts_are_integers_and_bounded(seed, thres):
    """Noise-free counts are exact integers (floor quantization) and the
    cumulative |count| per pixel is bounded by total |log-diff| / thres."""
    rng = np.random.RandomState(seed)
    video = rng.randint(0, 256, (6, 5, 7)).astype(np.float32)
    params = SimParams(pos_thres=jnp.float32(thres),
                       neg_thres=jnp.float32(thres),
                       base_noise_std=jnp.float32(0),
                       hot_pixel_fraction=jnp.float32(0),
                       hot_pixel_std=jnp.float32(0))
    vox = np.asarray(esim_video_to_voxel(jnp.asarray(video), params))
    assert np.all(vox == np.round(vox))
    log_imgs = np.log(0.001 + (video / 255.0) ** 2.2)
    budget = np.abs(np.diff(log_imgs, axis=0)).sum(0) / thres
    assert np.all(np.abs(vox).sum(0) <= budget + 1e-3)


@settings(**COMMON)
@given(st.integers(0, 2**31 - 1))
def test_esim_threshold_monotonicity(seed):
    """A larger threshold can never produce more events (same video,
    noise-free)."""
    rng = np.random.RandomState(seed)
    video = jnp.asarray(rng.randint(0, 256, (8, 6, 6)).astype(np.float32))

    def total(thres):
        p = SimParams(jnp.float32(thres), jnp.float32(thres),
                      jnp.float32(0), jnp.float32(0), jnp.float32(0))
        return float(jnp.abs(esim_video_to_voxel(video, p)).sum())

    assert total(0.1) >= total(0.4) >= total(1.6)
