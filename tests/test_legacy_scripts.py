"""Tests for the legacy dataset family and the scripts suite."""
import os
import subprocess
import sys

import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_monash_h5(path, n_frames=8, h=20, w=24, events_per_frame=150,
                   with_flow=True, seed=0):
    rng = np.random.RandomState(seed)
    n_ev = events_per_frame * n_frames
    ts = np.sort(rng.rand(n_ev)).astype(np.float64)
    with h5py.File(path, "w") as f:
        f.create_dataset("events/ts", data=ts)
        f.create_dataset("events/xs", data=rng.randint(0, w, n_ev).astype(np.uint16))
        f.create_dataset("events/ys", data=rng.randint(0, h, n_ev).astype(np.uint16))
        f.create_dataset("events/ps", data=rng.randint(0, 2, n_ev).astype(np.uint8))
        for i in range(n_frames):
            name = f"images/image{i:09d}"
            f.create_dataset(name, data=rng.randint(0, 255, (h, w),
                                                    dtype=np.uint8))
            f[name].attrs["event_idx"] = i * events_per_frame
            f[name].attrs["timestamp"] = float(i) / n_frames
            if with_flow:
                fname = f"flow/flow{i:09d}"
                f.create_dataset(fname, data=rng.randn(2, h, w).astype(np.float32))
        f.attrs["sensor_resolution"] = (h, w)
        f.attrs["num_events"] = n_ev
        f.attrs["num_imgs"] = n_frames
        f.attrs["source"] = "esim"
    return path


def test_dynamic_h5_between_frames(tmp_path):
    from v2v_tpu.data.legacy import DynamicH5Dataset
    path = make_monash_h5(str(tmp_path / "m.h5"))
    ds = DynamicH5Dataset(path, temporal_bilinear=True)
    assert len(ds) == 7
    item = ds[1]
    assert item["frame"].shape == (20, 24, 1)
    assert item["events"].shape == (20, 24, 5)
    assert item["flow"].shape == (20, 24, 2)
    assert int(item["data_source_idx"]) == 0


def test_dynamic_h5_k_events_and_t_seconds(tmp_path):
    from v2v_tpu.data.legacy import DynamicH5Dataset
    path = make_monash_h5(str(tmp_path / "m2.h5"))
    ds = DynamicH5Dataset(path, voxel_method={
        "method": "k_events", "k": 200, "sliding_window_w": 0})
    assert len(ds) == 6      # 1200 events / 200
    item = ds[0]
    assert item["events"].shape == (20, 24, 5)
    ds_t = DynamicH5Dataset(path, voxel_method={
        "method": "t_seconds", "t": 0.25, "sliding_window_t": 0.0})
    assert len(ds_t) >= 3
    assert ds_t[0]["events"].shape == (20, 24, 5)


def test_dynamic_h5_split_polarity_and_transform(tmp_path):
    from v2v_tpu.data.legacy import DynamicH5Dataset
    path = make_monash_h5(str(tmp_path / "m3.h5"))
    ds = DynamicH5Dataset(path, combined_voxel_channels=False,
                          transforms={"RandomCrop": {"size": 16}})
    item = ds[0]
    assert item["events"].shape == (16, 16, 10)
    assert item["frame"].shape == (16, 16, 1)
    # positive-half voxel is non-negative
    assert item["events"][..., :5].min() >= 0


def test_sequence_dataset_pause_and_seed_sync(tmp_path):
    from v2v_tpu.data.legacy import SequenceDataset
    path = make_monash_h5(str(tmp_path / "m4.h5"))
    seq_ds = SequenceDataset(path, sequence_length=3,
                             dataset_type="DynamicH5Dataset",
                             proba_pause_when_running=1.0,
                             proba_pause_when_paused=1.0,
                             noise_kwargs={"noise_std": 0.1,
                                           "noise_fraction": 1.0},
                             hot_pixel_kwargs={"hot_pixel_std": 1.0})
    seq = seq_ds[0]
    assert len(seq) == 3
    # always paused: frames repeat (modulo noise applied only to events)
    np.testing.assert_array_equal(seq[1]["frame"], seq[0]["frame"])


def test_memmap_dataset(tmp_path):
    from v2v_tpu.data.legacy import MemMapDataset
    rng = np.random.RandomState(0)
    root = tmp_path / "memmap"
    root.mkdir()
    n_ev, n_img, h, w = 600, 5, 16, 16
    np.save(root / "t.npy", np.sort(rng.rand(n_ev)))
    np.save(root / "xy.npy", rng.randint(0, 16, (n_ev, 2)))
    np.save(root / "p.npy", rng.randint(0, 2, n_ev))
    np.save(root / "images.npy", rng.randint(0, 255, (n_img, h, w, 1),
                                             dtype=np.uint8))
    np.save(root / "timestamps.npy", np.linspace(0, 1, n_img))
    ds = MemMapDataset(str(root))
    assert len(ds) == n_img - 1
    item = ds[0]
    assert item["frame"].shape == (h, w, 1)
    assert item["events"].shape == (h, w, 5)


def _run(script, *args):
    from subproc_env import cpu_env
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True, text=True, cwd=REPO, env=cpu_env())


def test_generate_random_thresholds_script(tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text("a/v1.mp4 100\nb/v2.mp4 250\n")
    r = _run("generate_random_thresholds.py", str(lst))
    assert r.returncode == 0, r.stderr
    lines = lst.read_text().strip().split("\n")
    assert all(len(l.split()) == 4 for l in lines)
    pos = float(lines[0].split()[2])
    assert 0.05 <= pos <= 3.0


def test_esim_to_voxel_script(tmp_path):
    src = make_monash_h5(str(tmp_path / "in.h5"))
    out_dir = tmp_path / "vox"
    r = _run("esim_to_voxel.py", src, str(out_dir))
    assert r.returncode == 0, r.stderr
    with h5py.File(out_dir / "in.h5") as f:
        assert f["frames"].shape[0] == 7
        assert f["events"].shape[1] == 5


def test_select_best_checkpoint_script(tmp_path):
    exp_dir = tmp_path / "tensorboard_logs" / "expA"
    exp_dir.mkdir(parents=True)
    (exp_dir / "val_loss.txt").write_text(
        "2026-01-01 00:00:00 Epoch 0: 0.5\n"
        "2026-01-01 00:00:01 Epoch 1: 0.3\n"
        "2026-01-01 00:00:02 Epoch 2: 0.4\n")
    ckpt_dir = tmp_path / "ckpt_paths"
    ckpt_dir.mkdir()
    (ckpt_dir / "expA.txt").write_text(
        "checkpoints/expA/epoch_0000.msgpack\n"
        "checkpoints/expA/epoch_0001.msgpack\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "select_best_checkpoint.py"), "expA"],
        capture_output=True, text=True, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "best epoch: 1" in r.stdout
    assert "epoch_0001" in r.stdout


def test_result_to_col_script(tmp_path):
    csv = tmp_path / "res.csv"
    header = "Checkpoint_path,HQF/boxes/MSE,HQF/boxes/SSIM,HQF/boxes/LPIPS,"
    csv.write_text(header + "\n" + "ck.msgpack,0.01,0.9,0.1,\n")
    r = _run("result_to_col.py", str(csv))
    assert r.returncode == 0, r.stderr
    assert "0.01" in r.stdout


def test_extract_images_memmap_script(tmp_path):
    rng = np.random.RandomState(0)
    root = tmp_path / "memmap"
    root.mkdir()
    n_img, h, w = 4, 12, 10
    np.save(root / "images.npy", rng.randint(0, 255, (n_img, h, w),
                                             dtype=np.uint8))
    np.save(root / "timestamps.npy", np.linspace(0, 1, n_img))
    out = tmp_path / "frames"
    r = _run("extract_images_memmap.py", str(root), str(out))
    assert r.returncode == 0, r.stderr
    pngs = sorted(p for p in os.listdir(out) if p.endswith(".png"))
    assert pngs == [f"frame_{i:010d}.png" for i in range(n_img)]
    lines = (out / "timestamps.txt").read_text().strip().splitlines()
    assert len(lines) == n_img
    assert lines[0].startswith("frame_0000000000.png 0.0")


def test_clean_checkpoints_script(tmp_path):
    """Keeps only the checkpoint named by the LAST ckpt_paths line
    (reference scripts/clean_checkpoints.py semantics)."""
    import subprocess
    import sys
    (tmp_path / "checkpoints" / "expA").mkdir(parents=True)
    (tmp_path / "ckpt_paths").mkdir()
    for i in range(3):
        (tmp_path / "checkpoints" / "expA" / f"epoch_{i:04d}.msgpack"
         ).write_bytes(b"x")
    (tmp_path / "ckpt_paths" / "expA.txt").write_text(
        "checkpoints/expA/epoch_0000.msgpack\n"
        "checkpoints/expA/epoch_0002.msgpack\n")
    script = os.path.join(REPO, "scripts", "clean_checkpoints.py")
    r = subprocess.run([sys.executable, script, "expA"], cwd=str(tmp_path),
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    left = sorted(p.name for p in (tmp_path / "checkpoints" / "expA").iterdir())
    assert left == ["epoch_0002.msgpack"], left


def test_generate_test_lists_check_writes_nothing_on_failure(tmp_path):
    """--check must validate BEFORE writing: a failure leaves no list
    files behind (previously configs/ was left pointing at nonexistent
    h5 paths)."""
    r = _run("generate_test_lists.py", "--root", str(tmp_path / "nope"),
             "--out", str(tmp_path), "--check")
    assert r.returncode == 1
    assert not list(tmp_path.glob("*_test*.txt")), \
        list(tmp_path.glob("*.txt"))


def test_generate_test_lists_script(tmp_path):
    r = _run("generate_test_lists.py", "--root", "/data/bench",
             "--out", str(tmp_path))
    assert r.returncode == 0, r.stderr
    hqf = (tmp_path / "hqf_test.txt").read_text().strip().splitlines()
    assert len(hqf) == 14                      # the HQF benchmark rows
    assert hqf[0] == "/data/bench/HQF/bike_bay_hdr.h5"
    ijrr = (tmp_path / "ijrr_test.txt").read_text().strip().splitlines()
    assert len(ijrr) == 7
    flow = (tmp_path / "mvsec_test_flow.txt").read_text().strip().splitlines()
    assert flow[0] == "/data/bench/MVSEC_flow/indoor_flying1.h5"
    assert (tmp_path / "evaid_test.txt").exists()
    assert (tmp_path / "mvsec_test.txt").exists()
