"""Acceptance-kit dry run: v2v-validate-release on synthetic assets.

Builds an assets directory (registry-named HQF h5 sequences + a real
torch .pth for the e2vid++ family when the reference repo is mounted),
runs the kit as a subprocess (the shipped console command path), and
checks the full chain: list generation -> strict conversion -> e2vid
test driver -> within-1% comparison against the reference table."""
import os
import subprocess
import sys

import pytest

from test_data import make_hqf_h5

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_assets(tmp_path, with_ckpt):
    assets = tmp_path / "assets"
    hqf = assets / "h5" / "HQF"
    hqf.mkdir(parents=True)
    # registry sequence names so the table comparison has rows;
    # 81 frames = exactly one 80-frame benchmark window each
    make_hqf_h5(str(hqf / "boxes.h5"), n_frames=81, seed=0)
    make_hqf_h5(str(hqf / "desk.h5"), n_frames=81, seed=1)
    if with_ckpt:
        import importlib
        import torch
        sys.path.insert(0, REFERENCE)
        try:
            cls = getattr(importlib.import_module("model.model"), "FlowNet")
        finally:
            sys.path.remove(REFERENCE)
        # exact kwargs of configs/test_e2vid++_original.yaml
        kwargs = dict(num_bins=5, skip_type="sum",
                      recurrent_block_type="convlstm", num_encoders=3,
                      base_num_channels=32, num_residual_blocks=2,
                      use_upsample_conv=True, norm="none",
                      num_output_channels=3)
        tmodel = cls(dict(kwargs))
        ckpt_dir = assets / "checkpoints"
        ckpt_dir.mkdir()
        torch.save({"state_dict": tmodel.state_dict()},
                   str(ckpt_dir / "e2vid++.pth"))
    return assets


def _run_kit(tmp_path, assets, extra, families="e2vid++",
             datasets="hqf"):
    from subproc_env import cpu_env
    out = tmp_path / "out"
    cmd = [sys.executable, "-m", "v2v_tpu.eval.release",
           "--assets", str(assets), "--out", str(out),
           "--families", families, "--datasets", datasets,
           "--max-batches", "2", "--configs",
           os.path.join(REPO, "configs")] + extra
    env = cpu_env()
    env.pop("V2V_RANDOM_TEACHER", None)   # the kit must set it itself
    proc = subprocess.run(cmd, capture_output=True, timeout=1200,
                          env=env, cwd=REPO)
    return proc, out


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference repo not mounted")
def test_release_kit_with_converted_checkpoint(tmp_path):
    assets = _make_assets(tmp_path, with_ckpt=True)
    proc, out = _run_kit(tmp_path, assets, [])
    text = proc.stdout.decode() + proc.stderr.decode()
    # random weights cannot be within 1% of the published rows -> rc 2,
    # but the whole chain must have run
    assert proc.returncode == 2, text[-4000:]
    assert "converted" in text and "acceptance vs 'e2vid+'" in text, \
        text[-4000:]
    assert "HQF/boxes/MSE" in text and "FAIL" in text
    assert "release validation summary" in text
    assert (out / "checkpoints" / "release_e2vid++.msgpack").exists()
    assert (out / "tensorboard_logs" / "release_e2vid++"
            / "test_metrics.txt").exists()
    assert (out / "lists" / "hqf_test.txt").read_text().count(".h5") == 2


def test_release_kit_random_init_dry_run(tmp_path):
    """Without checkpoints the kit still runs the drivers at random init
    (--allow-random-init) and exits 0 with a metric summary — marked
    NOT GATED so rc 0 cannot be misread as acceptance (advisor r3)."""
    assets = _make_assets(tmp_path, with_ckpt=False)
    proc, out = _run_kit(tmp_path, assets, ["--allow-random-init"])
    text = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, text[-4000:]
    assert "RANDOM INIT dry run" in text
    assert "release validation summary" in text
    assert "NOT GATED (random init)" in text
    assert "exit code certifies ONLY the 0 gated" in text
    assert (out / "tensorboard_logs" / "release_e2vid++"
            / "test_metrics.txt").exists()


def test_release_kit_flow_family_dry_run_covers_teacher(tmp_path):
    """--allow-random-init must extend to EVERY missing weight, incl.
    the flow families' RAFT pseudo-GT teacher: evflow over a no-flow
    dataset (the pseudo-GT route) used to hard-fail the whole family on
    a missing raft_large.pth — found by the round-4 full-resolution
    rehearsal on TPU."""
    assets = _make_assets(tmp_path, with_ckpt=False)
    proc, out = _run_kit(tmp_path, assets, ["--allow-random-init"],
                         families="evflow")
    text = proc.stdout.decode() + proc.stderr.decode()
    assert proc.returncode == 0, text[-4000:]
    assert "RANDOM INIT dry run" in text
    assert "RANDOMLY INITIALIZED" in text     # raft.py's loud warning
    assert "release validation summary" in text


def test_fetch_weights_checksum_and_placement(tmp_path):
    """--fetch self-provisioning: the injectable downloader is called
    for every missing manifest file, fetched bytes are sha256-gated
    against the torchvision filename hash, bad checksums are DISCARDED,
    network failures degrade to the offline behavior, and present files
    are never re-downloaded."""
    import hashlib
    from v2v_tpu.eval.release import fetch_weights

    payload = b"fake-weights"
    digest = hashlib.sha256(payload).hexdigest()
    manifest = {
        "good.pth": ("https://example/good.pth", digest[:8]),
        "bad.pth": ("https://example/bad.pth", "00000000"),
        "down.pth": ("https://example/down.pth", digest[:8]),
        "have.pth": ("https://example/have.pth", "ffffffff"),
    }
    wdir = tmp_path / "weights"
    wdir.mkdir()
    (wdir / "have.pth").write_bytes(b"already here")

    calls = []

    def fake_downloader(url, dest):
        calls.append(url)
        if "down" in url:
            raise OSError("no route to host")
        with open(dest, "wb") as f:
            f.write(payload)

    st = fetch_weights(str(wdir), downloader=fake_downloader,
                       manifest=manifest)
    assert st == {"good.pth": "fetched", "bad.pth": "checksum-mismatch",
                  "down.pth": "failed", "have.pth": "present"}
    assert (wdir / "good.pth").read_bytes() == payload
    assert not (wdir / "bad.pth").exists()       # discarded, not trusted
    assert not (wdir / "down.pth").exists()
    assert (wdir / "have.pth").read_bytes() == b"already here"
    assert "https://example/have.pth" not in calls

    # idempotent second call: nothing re-fetched
    calls.clear()
    st2 = fetch_weights(str(wdir), downloader=fake_downloader,
                        manifest={"good.pth": manifest["good.pth"]})
    assert st2 == {"good.pth": "present"} and calls == []


def test_fetch_manifest_covers_every_aux_weight():
    """The manifest must provision exactly the files the loaders look
    up: LPIPS trunks (losses/lpips.py:_BACKBONE_FILES) + RAFT teachers
    (training/raft.py:_BACKBONES) — so a networked machine-day needs
    only checkpoints/ + h5/."""
    from v2v_tpu.eval.release import WEIGHT_MANIFEST
    from v2v_tpu.losses.lpips import _BACKBONE_FILES
    from v2v_tpu.training.raft import _BACKBONES
    need = set(_BACKBONE_FILES.values()) | set(_BACKBONES.values())
    assert need == set(WEIGHT_MANIFEST)
    for dest, (url, prefix) in WEIGHT_MANIFEST.items():
        assert url.startswith("https://download.pytorch.org/models/")
        assert len(prefix) == 8 and int(prefix, 16) >= 0
        # torchvision convention: the prefix travels in the filename
        assert prefix in url


def test_budget_mode(tmp_path):
    """--budget prints the machine-day projection (setup minutes from a
    rehearsal artifact + frames x serving ms/frame) and does NOT run
    any family (round-5 verdict #6)."""
    import json
    from subproc_env import cpu_env
    assets = _make_assets(tmp_path, with_ckpt=False)
    art = tmp_path / "rehearsal.json"
    art.write_text(json.dumps({
        "families": {"e2vid++": {"rc": 0, "minutes": 8.0},
                     "evflow": {"rc": 1, "minutes": 5.7}},
        "max_batches": 2}))
    cmd = [sys.executable, "-m", "v2v_tpu.eval.release",
           "--assets", str(assets), "--budget",
           "--rehearsal", str(art),
           "--families", "e2vid++,evflow,etnet"]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=300, env=cpu_env(), cwd=REPO)
    out = proc.stdout
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "hqf: 2 sequences, 162 frames @ 24x32" in out
    assert "8.0" in out                      # rehearsed setup minutes
    assert "5.7!" in out                     # rc!=0 flagged
    assert "TOTAL" in out
    # eval projection: 162 frames x 1.49 ms -> ~0.004 min, rounds to 0.0
    assert "running" not in out              # budget must not run tests


def test_budget_math():
    from v2v_tpu.eval.release import _ms_per_frame
    ms, est = _ms_per_frame("e2vid++", 180, 240)
    assert (ms, est) == (1.49, False)        # exact measured point
    ms720, est720 = _ms_per_frame("etnet", 720, 1280)
    assert (ms720, est720) == (221.0, False)
    # unmeasured resolution: pixel-scaled from the nearest measured
    # point in pixel count (360x480 -> the 260x346 row)
    ms2, est2 = _ms_per_frame("e2vid++", 360, 480)
    assert est2 and ms2 == pytest.approx(
        2.80 * (360 * 480) / (260 * 346))
    # unmeasured family proxies e2vid++
    ms3, est3 = _ms_per_frame("nernet", 180, 240)
    assert est3 and ms3 == pytest.approx(1.49)
