"""Data layer tests with synthetic HQF-format h5 files and synthetic
videos."""

import h5py
import numpy as np
import pytest

from v2v_tpu.data.h5 import (FPSH5Dataset, TestH5Dataset, TestH5EventDataset,
                             TestH5FlowDataset)
from v2v_tpu.data.interface import (ConcatDataset, DataLoader, collate,
                                    make_concat_multi_dataset)
from v2v_tpu.data.webvid import WebvidDataset


def make_hqf_h5(path, n_frames=12, h=24, w=32, events_per_frame=200, seed=0,
                with_flow=False):
    rng = np.random.RandomState(seed)
    n_ev = events_per_frame * n_frames
    ts = np.sort(rng.rand(n_ev)) * 0.5 + 10.0
    xs = rng.randint(0, w, n_ev).astype(np.uint16)
    ys = rng.randint(0, h, n_ev).astype(np.uint16)
    ps = rng.randint(0, 2, n_ev).astype(np.uint8)
    with h5py.File(path, "w") as f:
        f.create_dataset("events/ts", data=ts)
        f.create_dataset("events/xs", data=xs)
        f.create_dataset("events/ys", data=ys)
        f.create_dataset("events/ps", data=ps)
        for i in range(n_frames):
            d = f.create_dataset(f"images/image{i:09d}",
                                 data=rng.randint(0, 255, (h, w), dtype=np.uint8))
            d.attrs["event_idx"] = i * events_per_frame
        if with_flow:
            for i in range(n_frames):
                d = f.create_dataset(f"flow/flow{i:09d}",
                                     data=rng.randn(2, h, w).astype(np.float32))
                d.attrs["event_idx"] = i * events_per_frame
                d.attrs["image_idx"] = i
    return path


@pytest.fixture
def hqf_file(tmp_path):
    return make_hqf_h5(str(tmp_path / "seq_a.h5"))


def test_testh5_dataset(hqf_file):
    ds = TestH5Dataset(hqf_file, {"sequence_length": 5, "num_bins": 5,
                                  "dataset_name": "hqf"})
    assert len(ds) == 3   # ceil(11/5) windows over 12 frames
    item = ds[0]
    assert item["frame"].shape == (5, 24, 32, 1)
    assert item["events"].shape == (5, 24, 32, 5)
    # each window voxel holds that window's events (200/frame, ±cancel)
    assert np.abs(item["events"]).sum() > 0
    assert item["sequence_name"] == "seq_a"
    assert int(item["data_source_idx"]) == 4   # hqf
    # no flow key (reference drops its per-item zeros flow,
    # testh5.py:166-173): its absence routes the flow harness to RAFT
    # pseudo-GT at test time
    assert "flow" not in item


def test_testh5_warmup_windows(hqf_file):
    ds = TestH5Dataset(hqf_file, {"sequence_length": 6, "warm_up_length": 2,
                                  "num_bins": 5})
    begins = [s[0] for s in ds.samples]
    # windows step by L - warmup = 4, warm-up shifts begin back by 2
    assert begins[0] == 0 and begins[1] == 2
    assert ds.samples[1][1] == 2   # real start offset


def test_testh5_event_dataset(hqf_file):
    ds = TestH5EventDataset(hqf_file, {"sequence_length": 4, "num_bins": 5})
    item = ds[0]
    assert isinstance(item["events"], list) and len(item["events"]) == 4
    ev = item["events"][0]
    assert ev.shape[1] == 5 and ev.dtype == np.float64
    assert set(np.unique(ev[:, 3])) <= {-1.0, 1.0}


def test_testh5_flow_dataset(tmp_path):
    path = make_hqf_h5(str(tmp_path / "flow.h5"), with_flow=True)
    ds = TestH5FlowDataset(path, {"sequence_length": 5, "num_bins": 5,
                                  "dataset_name": "mvsec"})
    item = ds[0]
    assert item["flow"].shape == (5, 24, 32, 2)
    assert item["events"].shape == (5, 24, 32, 5)


def test_thread_loader_early_abandon_stops_workers(tmp_path):
    """Abandoning iteration early (the harness's max_batches break) must
    stop the worker threads instead of leaving them blocked in
    out_q.put() holding full batches."""
    import gc
    import threading
    import time

    class _Counting:
        def __init__(self):
            self.served = 0

        def __len__(self):
            return 64

        def __getitem__(self, i):
            self.served += 1
            return {"x": np.zeros(4, np.float32)}

    ds = _Counting()
    before = threading.active_count()
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=3,
                        prefetch=2)
    it = iter(loader)
    next(it)
    next(it)
    del it                       # abandon mid-iteration
    gc.collect()                 # generator close() -> finally -> stop
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() == before
    served_at_stop = ds.served
    time.sleep(0.3)
    assert ds.served == served_at_stop       # no background progress


def test_voxel_cache_script_and_dataset_roundtrip(tmp_path):
    """scripts/testh5_to_voxel_cache.py -> TestH5CacheDataset must
    reproduce TestH5Dataset's frames and voxels exactly (the cache is a
    pure pre-computation, reference data/testh5.py:383-446)."""
    import importlib.util
    import os
    import sys
    from v2v_tpu.data.h5 import TestH5CacheDataset

    src = make_hqf_h5(str(tmp_path / "seq_a.h5"))
    spec = importlib.util.spec_from_file_location(
        "testh5_to_voxel_cache",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "testh5_to_voxel_cache.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cache = str(tmp_path / "cache" / "seq_a.h5")
    os.makedirs(os.path.dirname(cache))
    mod.convert(src, cache, num_bins=5, interpolate=False)

    ref = TestH5Dataset(src, {"sequence_length": 5, "num_bins": 5,
                              "dataset_name": "hqf"})
    ds = TestH5CacheDataset(cache, {"sequence_length": 5, "num_bins": 5,
                                    "dataset_name": "hqf"})
    assert len(ds) == len(ref) == 3
    for i in range(len(ds)):
        a, b = ref[i], ds[i]
        np.testing.assert_array_equal(a["frame"], b["frame"])
        np.testing.assert_array_equal(a["events"], b["events"])
        assert b["sequence_name"] == "seq_a"
        assert int(b["data_source_idx"]) == int(a["data_source_idx"])
        np.testing.assert_array_equal(a["frame_idx"], b["frame_idx"])
    # bin-count mismatch must fail loudly (attrs assert)
    with pytest.raises(AssertionError):
        TestH5CacheDataset(cache, {"sequence_length": 5, "num_bins": 9})


def test_fps_h5_dataset(tmp_path):
    path = make_hqf_h5(str(tmp_path / "fps.h5"))
    ds = FPSH5Dataset(path, {"sequence_length": 4, "num_bins": 5,
                             "FPS": 20, "H": 24, "W": 32})
    item = ds[0]
    assert item["events"].shape[1:] == (24, 32, 5)


def test_concat_and_loader(tmp_path):
    # 11 frames -> exactly two full 5-step windows per file (no ragged tail)
    paths = [make_hqf_h5(str(tmp_path / f"s{i}.h5"), n_frames=11, seed=i)
             for i in range(3)]
    ds = ConcatDataset([TestH5Dataset(p, {"sequence_length": 5}) for p in paths])
    assert len(ds) == 6
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["frame"].shape == (2, 5, 24, 32, 1)
    assert isinstance(b["sequence_name"], list)
    # per-host sharding splits indices disjointly
    l0 = DataLoader(ds, batch_size=1, shuffle=False, process_index=0,
                    process_count=2, num_workers=1)
    l1 = DataLoader(ds, batch_size=1, shuffle=False, process_index=1,
                    process_count=2, num_workers=1)
    assert len(l0) + len(l1) == 6


def test_concat_multi_dataset_config(tmp_path):
    paths = [make_hqf_h5(str(tmp_path / f"c{i}.h5"), seed=i) for i in range(2)]
    list_file = tmp_path / "hqf_test.txt"
    list_file.write_text("\n".join(paths) + "\n")
    cfgs = [{"data_file": str(list_file),
             "class_name": "data.testh5.TestH5Dataset",
             "dataset_name": "hqf", "num_bins": 5, "sequence_length": 5}]
    ds = make_concat_multi_dataset(cfgs)
    assert len(ds) == 6


def _write_video(path, n=64, h=80, w=100, seed=0):
    rng = np.random.RandomState(seed)
    fourcc = cv2_fourcc()
    import cv2
    vw = cv2.VideoWriter(path, fourcc, 24, (w, h))
    base = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    for t in range(n):
        base = np.clip(base + rng.randn(h, w, 3) * 6, 0, 255)
        vw.write(base.astype(np.uint8))
    vw.release()
    return n


def cv2_fourcc():
    import cv2
    return cv2.VideoWriter_fourcc(*"mp4v")


@pytest.fixture
def webvid_root(tmp_path):
    import cv2  # noqa
    root = tmp_path / "webvid"
    root.mkdir()
    n = _write_video(str(root / "vid0.mp4"))
    list_file = tmp_path / "list.txt"
    list_file.write_text(f"vid0.mp4 {n}\n")
    return str(root), str(list_file)


def test_webvid_video_mode(webvid_root):
    root, list_file = webvid_root
    ds = WebvidDataset(root, {
        "video_list_file": list_file, "sequence_length": 2, "num_bins": 5,
        "crop_size": 32, "data_source_name": "webvid",
        "min_resize_scale": 1, "max_resize_scale": 1,
        "max_samples_per_shot": 3, "fixed_seed": 7})
    assert len(ds) == 3
    item = ds[0]
    assert item["video"].shape == (11, 32, 32)   # L*bins+1 frames
    assert item["video"].dtype == np.uint8
    assert int(item["data_source_idx"]) == 11
    # fixed seed => deterministic
    item2 = ds[0]
    np.testing.assert_array_equal(item["video"], item2["video"])


def test_webvid_voxel_mode(webvid_root):
    root, list_file = webvid_root
    ds = WebvidDataset(root, {
        "video_list_file": list_file, "sequence_length": 2, "num_bins": 5,
        "crop_size": 32, "data_source_name": "webvid", "output": "voxel",
        "min_resize_scale": 1, "max_resize_scale": 1,
        "base_noise_std_range": [0, 0.1], "hot_pixel_std_range": [0, 1]})
    item = ds[0]
    assert item["events"].shape == (2, 32, 32, 5)
    assert item["frame"].shape == (2, 32, 32, 1)
    assert 0 <= item["frame"].max() <= 1
    p = item["v2e_params"]
    assert 0.05 <= min(p["pos_thres"], p["neg_thres"])
    assert np.abs(item["events"]).sum() > 0


def test_webvid_degrade_modes(webvid_root):
    root, list_file = webvid_root
    for mode in ["subtitles", "dirtyshotcut", "hdr", "ldr"]:
        ds = WebvidDataset(root, {
            "video_list_file": list_file, "sequence_length": 2, "num_bins": 5,
            "crop_size": 32, "min_resize_scale": 1, "max_resize_scale": 1,
            "video_degrade": mode, "degrade_ratio": 1.0})
        item = ds[0]
        assert item["video"].shape == (11, 32, 32), mode


def test_process_loader_matches_thread_loader(tmp_path):
    """Forked-worker loader must yield identical batches in identical
    order to the threaded loader (fixed_seed pins augmentation)."""
    root = tmp_path / "webvid"
    root.mkdir()
    n = _write_video(str(root / "v0.mp4"), n=40)
    (tmp_path / "videos.txt").write_text("v0.mp4 40\n")
    (tmp_path / "root.txt").write_text(str(root) + "\n")
    cfg = {"video_list_file": str(tmp_path / "videos.txt"),
           "data_source_name": "webvid", "sequence_length": 2,
           "crop_size": 16, "num_bins": 5, "min_resize_scale": 1,
           "max_resize_scale": 1, "max_samples_per_shot": 8,
           "step_size": 3, "fixed_seed": 7, "output": "video"}
    ds = WebvidDataset(str(root), cfg)
    assert len(ds) >= 4
    lt = DataLoader(ds, 2, shuffle=False, drop_last=True, num_workers=2,
                    worker_type="thread")
    lp = DataLoader(ds, 2, shuffle=False, drop_last=True, num_workers=2,
                    worker_type="process")
    got_t = list(lt)
    got_p = list(lp)
    assert len(got_t) == len(got_p) > 0
    for bt, bp in zip(got_t, got_p):
        assert sorted(bt.keys()) == sorted(bp.keys())
        for k in bt:
            if isinstance(bt[k], np.ndarray):
                np.testing.assert_array_equal(bt[k], bp[k])
