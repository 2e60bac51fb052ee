"""Tests for the dataset-converter and figure/report scripts.

Each converter gets a synthetic input in its source format
(MVSEC davis h5, IJRR txt dirs, EVAID txt dirs, HS-ERGB npz chunks),
is run end-to-end, and the unified-h5 output is verified against the
contract the h5 test datasets read (reference format:
data/testh5.py images/events/flow keys + attrs).
"""
import os
import subprocess
import sys

import cv2
import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _run(script, *args):
    from subproc_env import cpu_env
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, cwd=REPO, env=cpu_env())


def _check_unified_h5(path, expect_flow=False):
    """The output contract every converter must satisfy
    (reference scripts/mvsec_to_h5.py:22-25, data/testh5.py:14-55)."""
    with h5py.File(path, "r") as f:
        ts = f["events/ts"][:]
        assert ts.dtype == np.float64
        assert np.all(np.diff(ts) >= 0), "event timestamps must be sorted"
        n_ev = len(ts)
        for k, dt in (("xs", np.uint16), ("ys", np.uint16),
                      ("ps", np.uint8)):
            d = f[f"events/{k}"][:]
            assert d.dtype == dt and len(d) == n_ev
        ps = f["events/ps"][:]
        assert set(np.unique(ps)) <= {0, 1}, "polarities must be 0/1"
        keys = sorted(f["images"].keys())
        assert keys == [f"image{i:09d}" for i in range(len(keys))]
        prev = -1
        for k in keys:
            item = f["images"][k]
            ei = int(item.attrs["event_idx"])
            assert 0 <= ei <= n_ev
            assert ei >= prev, "image event_idx must be monotone"
            prev = ei
            assert "timestamp" in item.attrs
            assert item[()].dtype == np.uint8
        h, w = f.attrs["sensor_resolution"]
        assert f["images"][keys[0]].shape[:2] == (h, w)
        assert int(f.attrs["num_imgs"]) == len(keys)
        assert int(f.attrs["num_events"]) == n_ev
        if expect_flow:
            fkeys = sorted(f["flow"].keys())
            assert fkeys and fkeys == [f"flow{i:09d}"
                                       for i in range(len(fkeys))]
            for k in fkeys:
                item = f["flow"][k]
                assert item.shape[0] == 2
                assert 0 <= int(item.attrs["event_idx"]) <= n_ev
                assert "image_idx" in item.attrs
        return len(keys), n_ev


# ---------------------------------------------------------------- MVSEC

def make_mvsec_pair(tmp_path, n_imgs=90, h=16, w=20, ev_per_gap=10):
    """Synthetic MVSEC davis h5 pair (data + GT flow), 1 image/s so the
    indoor_flying1 (10,70)s cut keeps 60 images."""
    rng = np.random.RandomState(0)
    base = 1000.0  # absolute stamps, like the real capture
    img_ts = base + np.arange(n_imgs, dtype=np.float64)
    n_ev = ev_per_gap * n_imgs
    ev_ts = base + np.sort(rng.uniform(0, n_imgs, n_ev))
    events = np.stack([
        rng.randint(0, w, n_ev).astype(np.float64),
        rng.randint(0, h, n_ev).astype(np.float64),
        ev_ts,
        rng.choice([-1.0, 1.0], n_ev)], axis=1)
    ev_inds = np.searchsorted(ev_ts, img_ts)
    data_path = str(tmp_path / "indoor_flying1_data.h5")
    with h5py.File(data_path, "w") as f:
        g = f.create_group("davis/left")
        g.create_dataset("image_raw", data=rng.randint(
            0, 255, (n_imgs, h, w), dtype=np.uint8))
        g.create_dataset("image_raw_ts", data=img_ts)
        g.create_dataset("image_raw_event_inds", data=ev_inds)
        g.create_dataset("events", data=events)
    flow_ts = base + np.arange(5, n_imgs - 5, 2.0)
    gt_path = str(tmp_path / "indoor_flying1_gt.h5")
    with h5py.File(gt_path, "w") as f:
        g = f.create_group("davis/left")
        g.create_dataset("flow_dist_ts", data=flow_ts)
        g.create_dataset("flow_dist", data=rng.randn(
            len(flow_ts), 2, h, w).astype(np.float32))
    return data_path, gt_path


def test_mvsec_to_h5(tmp_path):
    from mvsec_to_h5 import convert
    data_path, gt_path = make_mvsec_pair(tmp_path)
    out = str(tmp_path / "indoor_flying1.h5")
    convert(data_path, gt_path, out)
    n_imgs, n_ev = _check_unified_h5(out, expect_flow=True)
    assert n_imgs == 60  # the (10, 70)s evaluation cut
    with h5py.File(out, "r") as f:
        assert f.attrs["data_source"] == "mvsec"
        # the (10,70)s cut keeps only the events between those images
        assert abs(n_ev - 60 * 10) <= 20
        # flow stamps within the cut: (10..70) at 2 s apart from t=5
        fkeys = sorted(f["flow"].keys())
        assert 28 <= len(fkeys) <= 32

    # the converted file must be loadable by the flow test dataset
    from v2v_tpu.data.h5 import TestH5FlowDataset
    ds = TestH5FlowDataset(out, {"sequence_length": 4, "num_bins": 5,
                                 "use_native_voxel_builder": False})
    item = ds[0]
    assert item["events"].shape[-1] == 5      # (T,H,W,bins) channels-last
    assert item["flow"].shape[-1] == 2
    assert np.isfinite(item["events"]).all()


# ----------------------------------------------------------------- IJRR

def make_ijrr_dir(tmp_path, n_imgs=25, h=16, w=20, n_ev=800):
    rng = np.random.RandomState(1)
    seq = tmp_path / "dynamic_6dof"
    (seq / "images").mkdir(parents=True)
    img_ts = np.arange(n_imgs, dtype=np.float64)  # 1 fps: cut (5,20) keeps 15
    with open(seq / "images.txt", "w") as f:
        for i, t in enumerate(img_ts):
            rel = f"images/frame_{i:08d}.png"
            cv2.imwrite(str(seq / rel),
                        rng.randint(0, 255, (h, w), dtype=np.uint8))
            f.write(f"{t:.6f} {rel}\n")
    ev_ts = np.sort(rng.uniform(0, n_imgs, n_ev))
    with open(seq / "events.txt", "w") as f:
        for t in ev_ts:
            f.write(f"{t:.9f} {rng.randint(0, w)} {rng.randint(0, h)} "
                    f"{rng.randint(0, 2)}\n")
    return str(seq)


def test_ijrr_to_h5(tmp_path):
    from ijrr_to_h5 import convert
    seq_dir = make_ijrr_dir(tmp_path)
    out = str(tmp_path / "dynamic_6dof.h5")
    convert(seq_dir, out)
    n_imgs, n_ev = _check_unified_h5(out)
    assert n_imgs == 15  # the (5, 20)s cut
    with h5py.File(out, "r") as f:
        assert f.attrs["data_source"] == "ijrr"

    from v2v_tpu.data.h5 import TestH5Dataset
    ds = TestH5Dataset(out, {"sequence_length": 4, "num_bins": 5,
                             "use_native_voxel_builder": False})
    item = ds[0]
    assert item["events"].shape[-1] == 5
    assert np.isfinite(item["events"]).all()


# ---------------------------------------------------------------- EVAID

def make_evaid_dir(tmp_path, n_imgs=6, h=12, w=18, ev_per_gap=30):
    rng = np.random.RandomState(2)
    d = tmp_path / "evaid_seq"
    (d / "gt").mkdir(parents=True)
    (d / "event").mkdir()
    stamps_us = (np.arange(n_imgs) * 1_000_000).astype(np.int64)
    with open(d / "timestamps.txt", "w") as f:
        f.write("\n".join(str(int(t)) for t in stamps_us) + "\n")
    with open(d / "shape.txt", "w") as f:
        f.write(f"{w} {h}\n")
    for i in range(n_imgs):
        cv2.imwrite(str(d / "gt" / f"{i:06d}.png"),
                    rng.randint(0, 255, (h, w), dtype=np.uint8))
    # event/000001.txt = events between image 1 and image 2
    for i in range(1, n_imgs + 1):
        t0 = stamps_us[i - 1]
        lines = []
        for t in np.sort(rng.randint(t0, t0 + 1_000_000, ev_per_gap)):
            lines.append(f"{t} {rng.randint(0, w)} {rng.randint(0, h)} "
                         f"{rng.randint(0, 2)}")
        (d / "event" / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
    return str(d)


def test_evaid_to_h5(tmp_path):
    from evaid_to_h5 import convert
    d = make_evaid_dir(tmp_path)
    out = str(tmp_path / "evaid_seq.h5")
    convert(d, out)
    n_imgs, n_ev = _check_unified_h5(out)
    assert n_imgs == 6
    assert n_ev == 6 * 30
    with h5py.File(out, "r") as f:
        assert f.attrs["data_source"] == "evaid"
        assert tuple(f.attrs["sensor_resolution"]) == (12, 18)


# -------------------------------------------------------------- HS-ERGB

def make_hs_ergb_dir(tmp_path, n_chunks=3, ev_per_chunk=50, n_imgs=5,
                     h=14, w=16):
    rng = np.random.RandomState(3)
    d = tmp_path / "hs_seq"
    (d / "events").mkdir(parents=True)
    (d / "images").mkdir()
    t0 = 0
    for c in range(n_chunks):
        t = np.sort(rng.randint(t0, t0 + 400_000, ev_per_chunk))
        t0 += 400_000
        np.savez(d / "events" / f"{c:06d}.npz",
                 x=rng.randint(0, w, ev_per_chunk).astype(np.uint16),
                 y=rng.randint(0, h, ev_per_chunk).astype(np.uint16),
                 t=t.astype(np.int64),
                 p=rng.randint(0, 2, ev_per_chunk).astype(np.int8))
    img_ts = np.linspace(0, n_chunks * 400_000, n_imgs)
    with open(d / "images" / "timestamp.txt", "w") as f:
        f.write("\n".join(f"{t:.1f}" for t in img_ts) + "\n")
    for i in range(n_imgs):
        cv2.imwrite(str(d / "images" / f"{i:06d}.png"),
                    rng.randint(0, 255, (h, w), dtype=np.uint8))
    return str(d)


def test_hs_ergb_to_h5(tmp_path):
    from hs_ergb_to_h5 import convert
    d = make_hs_ergb_dir(tmp_path)
    out = str(tmp_path / "hs_seq.h5")
    convert(d, out)
    n_imgs, n_ev = _check_unified_h5(out)
    assert n_imgs == 5
    assert n_ev == 3 * 50
    with h5py.File(out, "r") as f:
        assert f.attrs["data_source"] == "hs-ergb"

    # events-only FPS dataset must be able to read it
    from v2v_tpu.data.h5 import FPSH5Dataset
    ds = FPSH5Dataset(out, {"FPS": 10, "sequence_length": 2,
                            "num_bins": 5, "H": 14, "W": 16,
                            "use_native_voxel_builder": False})
    item = ds[0]
    assert item["events"].shape[-1] == 5


# --------------------------------------------------------------- aedat4

class _FakeEventBatch:
    def __init__(self, arr):
        self._arr = arr

    def numpy(self):
        return self._arr


class _FakeMonoCameraRecording:
    """Mimics dv_processing.io.MonoCameraRecording enough for convert()."""
    W, H = 24, 18

    def __init__(self, path):
        rng = np.random.RandomState(5)
        dt = np.dtype([("timestamp", np.int64), ("x", np.int16),
                       ("y", np.int16), ("polarity", np.int8)])
        self._batches = []
        t0 = 1_700_000_000_000_000  # µs epoch stamps, like real captures
        for _ in range(3):
            arr = np.zeros(40, dtype=dt)
            arr["timestamp"] = t0 + np.sort(rng.randint(0, 50_000, 40))
            t0 += 50_000
            arr["x"] = rng.randint(0, self.W, 40)
            arr["y"] = rng.randint(0, self.H, 40)
            arr["polarity"] = rng.randint(0, 2, 40)
            self._batches.append(arr)
        self._i = 0

    def isRunning(self):
        return self._i < len(self._batches)

    def getNextEventBatch(self):
        arr = self._batches[self._i]
        self._i += 1
        return _FakeEventBatch(arr)

    def getEventResolution(self):
        return (self.W, self.H)  # dv API order: (width, height)


def test_aedat4_to_h5(tmp_path, monkeypatch):
    """Exercises the convert loop + events-only output contract with a
    faked dv_processing (the real pybind package isn't bundled)."""
    import types
    fake = types.ModuleType("dv_processing")
    fake.io = types.SimpleNamespace(MonoCameraRecording=_FakeMonoCameraRecording)
    monkeypatch.setitem(sys.modules, "dv_processing", fake)
    from aedat4_to_h5 import convert
    out = str(tmp_path / "evbird_seq.h5")
    convert("capture.aedat4", out)
    with h5py.File(out, "r") as f:
        ts = f["events/ts"][:]
        assert ts.dtype == np.float64
        assert np.all(np.diff(ts) >= 0)
        assert len(ts) == 3 * 40 == int(f.attrs["num_events"])
        assert f["events/xs"].dtype == np.uint16
        assert f["events/ps"].dtype == np.uint8
        assert set(np.unique(f["events/ps"][:])) <= {0, 1}
        assert tuple(f.attrs["sensor_resolution"]) == (18, 24)  # (H, W)
        assert f.attrs["data_source"] == "evbird"

    # the evbird test config reads these through FPS_H5Dataset
    from v2v_tpu.data.h5 import FPSH5Dataset
    ds = FPSH5Dataset(out, {"FPS": 20, "sequence_length": 2, "num_bins": 5,
                            "H": 18, "W": 24,
                            "use_native_voxel_builder": False})
    item = ds[0]
    assert item["events"].shape[-1] == 5
    assert np.isfinite(item["events"]).all()


def test_qwen_vl_annotate_filtering(tmp_path, monkeypatch):
    """The filtered-list logic with a faked Qwen2.5-VL (real weights
    need a network download): keep quality >= min and non-static,
    skip malformed replies."""
    import types

    replies = {
        "good.mp4": 'Sure. {"quality": 4, "static": false}',
        "blurry.mp4": '{"quality": 2, "static": false}',
        "static.mp4": '{"quality": 5, "static": true}',
        "garbled.mp4": "cannot assess",
    }

    class _FakeInputs(dict):
        def to(self, device):
            return self

    class _FakeProcessor:
        last_video = None

        def apply_chat_template(self, messages, **kw):
            _FakeProcessor.last_video = messages[0]["content"][0]["video"]
            return "prompt"

        def __call__(self, text, videos, return_tensors, padding=False):
            # the processor must actually receive the decoded video
            # (passing videos=None would make the model judge blind)
            assert videos == [f"frames:{_FakeProcessor.last_video}"]
            return _FakeInputs()

        def batch_decode(self, out, **kw):
            name = os.path.basename(_FakeProcessor.last_video)
            return [replies[name]]

    class _FakeModel:
        device = "cpu"

        def generate(self, **kw):
            return ["ids"]

    fake = types.ModuleType("transformers")
    fake.AutoProcessor = types.SimpleNamespace(
        from_pretrained=lambda name: _FakeProcessor())
    fake.Qwen2_5_VLForConditionalGeneration = types.SimpleNamespace(
        from_pretrained=lambda name, **kw: _FakeModel())
    monkeypatch.setitem(sys.modules, "transformers", fake)
    fake_vl = types.ModuleType("qwen_vl_utils")
    fake_vl.process_vision_info = lambda messages: (
        None, [f"frames:{messages[0]['content'][0]['video']}"])
    monkeypatch.setitem(sys.modules, "qwen_vl_utils", fake_vl)

    lst = tmp_path / "videos.txt"
    lst.write_text("good.mp4 100\nblurry.mp4 90\n"
                   "static.mp4 80\ngarbled.mp4 70\n")
    out = tmp_path / "filtered.txt"
    import qwen_vl_annotate
    qwen_vl_annotate.main(str(tmp_path), str(lst), str(out))
    assert out.read_text().strip() == "good.mp4 100"


# ------------------------------------------------------ config generator

def test_generate_configs_roundtrip(tmp_path):
    """The checked-in configs/ must be exactly what the generator emits
    (no silent hand edits), and every target string in them must resolve
    through TARGET_ALIASES (the reference-schema public API)."""
    import generate_configs as gc
    import yaml
    from v2v_tpu.config import resolve_target

    out = str(tmp_path / "configs")
    orig_out = gc.OUT
    gc.OUT = out
    try:
        gc.main()
    finally:
        gc.OUT = orig_out

    generated = sorted(os.listdir(out))
    assert generated == sorted(
        f for f in os.listdir(os.path.join(REPO, "configs"))
        if f.endswith(".yaml"))
    for name in generated:
        with open(os.path.join(out, name), "rb") as a, \
                open(os.path.join(REPO, "configs", name), "rb") as b:
            assert a.read() == b.read(), f"{name} out of sync — rerun " \
                "scripts/generate_configs.py"

    for name in generated:
        with open(os.path.join(out, name)) as f:
            cfg = yaml.safe_load(f)
        assert resolve_target(cfg["module"]["model"]["target"]) is not None
        blocks = []
        for st in cfg.get("train_stages", []):
            assert resolve_target(st["optimizer"]["target"]) is not None
            if "lr_scheduler" in st:
                assert resolve_target(st["lr_scheduler"]["target"]) is not None
            for key in ("train", "val"):
                blocks += st["dataset"].get(key) or []
        blocks += cfg.get("test_stage", {}).get("test", [])
        assert blocks, f"{name}: no dataset blocks found"
        for blk in blocks:
            assert resolve_target(blk["class_name"]) is not None


# -------------------------------------------------- small report scripts

def test_subsample_unfiltered_script(tmp_path):
    src = tmp_path / "webvid10000_unfiltered.txt"
    lines = [f"shard/{i:05d}.mp4 {100 + i}\n" for i in range(50)]
    src.write_text("".join(lines))
    r = _run("subsample_unfiltered.py", str(src))
    assert r.returncode == 0, r.stderr
    sub1000 = (tmp_path / "webvid1000_unfiltered.txt").read_text()
    sub100 = (tmp_path / "webvid100_unfiltered.txt").read_text()
    assert set(sub1000.splitlines()) <= {l.strip() for l in lines}
    assert set(sub100.splitlines()) <= set(sub1000.splitlines())
    assert len(sub1000.splitlines()) == 50  # min(1000, 50)
    assert len(sub100.splitlines()) == 50


def test_flow_result_to_col_script(tmp_path):
    from v2v_tpu.eval.flow_harness import FLOW_METRICS, FLOW_SEQUENCES
    cols, vals = ["checkpoint"], ["ckpt_a.msgpack"]
    v = 0.0
    for ds, seqs in FLOW_SEQUENCES.items():
        for seq in seqs:
            for m in FLOW_METRICS:
                cols.append(f"{ds}/{seq}/{m}")
                vals.append(f"{v:.4f}")
                v += 0.01
    csv = tmp_path / "flow_results.csv"
    csv.write_text(",".join(cols) + "\n" + ",".join(vals) + "\n")
    r = _run("flow_result_to_col.py", str(csv))
    assert r.returncode == 0, r.stderr
    assert "ckpt_a.msgpack" in r.stdout
    # every per-sequence value appears, grouped under its header
    assert "# MVSEC/dense_EPE" in r.stdout
    assert "0.0000" in r.stdout and f"{v - 0.01:.4f}" in r.stdout


def test_save_gt_images_script(tmp_path):
    from test_legacy_scripts import make_monash_h5
    h5_path = make_monash_h5(str(tmp_path / "seqx.h5"), n_frames=6)
    lst = tmp_path / "list.txt"
    lst.write_text(h5_path + "\n")
    out_dir = tmp_path / "gt_out"
    r = _run("save_gt_images.py", str(lst), "hqf", str(out_dir))
    assert r.returncode == 0, r.stderr
    pngs = sorted((out_dir / "HQF" / "seqx").glob("*.png"))
    # frame i pairs with events[i-1, i]: first image dropped
    assert len(pngs) == 5
    img = cv2.imread(str(pngs[0]), cv2.IMREAD_GRAYSCALE)
    assert img.shape == (20, 24)


def test_testset_evcnt_maps_script(tmp_path):
    from test_legacy_scripts import make_monash_h5
    h5_path = make_monash_h5(str(tmp_path / "seqy.h5"))
    lst = tmp_path / "list.txt"
    lst.write_text(h5_path + "\n")
    out_dir = tmp_path / "evcnt"
    r = _run("testset_evcnt_maps.py", str(lst), str(out_dir))
    assert r.returncode == 0, r.stderr
    img = cv2.imread(str(out_dir / "seqy_evcnt.png"), cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.shape == (20, 24)
    assert img.max() > 0


def test_make_ref_videos_script(tmp_path):
    rng = np.random.RandomState(4)
    dirs = []
    for method in ("m1", "m2"):
        d = tmp_path / method / "HQF" / "seq1"
        d.mkdir(parents=True)
        for i in range(4):
            cv2.imwrite(str(d / f"{i:06d}.png"),
                        rng.randint(0, 255, (16, 20, 3), dtype=np.uint8))
        dirs.append(str(tmp_path / method))
    out_dir = tmp_path / "videos"
    r = _run("make_ref_videos.py", str(out_dir), *dirs)
    assert r.returncode == 0, r.stderr
    vids = sorted(out_dir.glob("*.mp4"))
    assert len(vids) == 1 and vids[0].stat().st_size > 0
    cap = cv2.VideoCapture(str(vids[0]))
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (16, 20 * 2, 3)


def test_visualize_esim_sample_script(tmp_path):
    out_dir = tmp_path / "esim_vis"
    r = _run("visualize_esim_sample.py", "synthetic", str(out_dir))
    assert r.returncode == 0, r.stderr
    voxels = sorted(out_dir.glob("voxel_*.png"))
    frames = sorted(out_dir.glob("frame_*.png"))
    assert len(voxels) == 8 and len(frames) == 8  # (41-1)/5 steps
    assert "thresholds pos=" in r.stdout
