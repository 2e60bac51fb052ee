"""Native C++ voxel builder: exact parity with the numpy reference path
and a throughput sanity check."""
import time

import numpy as np
import pytest

from v2v_tpu.data.native import events_to_voxel_native, native_available
from v2v_tpu.ops.voxel import events_to_voxel_np

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def _events(n=200000, h=260, w=346, seed=0):
    rng = np.random.RandomState(seed)
    ts = np.sort(rng.rand(n)) * 0.05 + 1000.0
    xs = rng.randint(0, w, n).astype(np.uint16)
    ys = rng.randint(0, h, n).astype(np.uint16)
    ps = rng.randint(0, 2, n).astype(np.uint8)
    return ts, xs, ys, ps


@pytest.mark.parametrize("interp", [False, True])
def test_native_matches_numpy(interp):
    h, w, nb = 260, 346, 5
    ts, xs, ys, ps = _events()
    want = events_to_voxel_np(ts, xs, ys, ps, num_bins=nb, height=h,
                              width=w, interpolate_bins=interp)
    got = events_to_voxel_native(ts, xs, ys, ps, num_bins=nb, height=h,
                                 width=w, interpolate_bins=interp)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_native_empty():
    got = events_to_voxel_native(np.zeros(0), np.zeros(0, np.int32),
                                 np.zeros(0, np.int32), np.zeros(0, np.uint8),
                                 num_bins=5, height=8, width=8)
    assert got.sum() == 0


def test_native_faster_than_numpy():
    h, w, nb = 260, 346, 5
    ts, xs, ys, ps = _events(n=1000000)
    # warm both paths
    events_to_voxel_native(ts[:10], xs[:10], ys[:10], ps[:10],
                           num_bins=nb, height=h, width=w)
    t0 = time.perf_counter()
    events_to_voxel_np(ts, xs, ys, ps, num_bins=nb, height=h, width=w)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    events_to_voxel_native(ts, xs, ys, ps, num_bins=nb, height=h, width=w)
    t_native = time.perf_counter() - t0
    print(f"np {t_np * 1000:.1f}ms native {t_native * 1000:.1f}ms "
          f"({t_np / t_native:.1f}x)")
    assert t_native < t_np
