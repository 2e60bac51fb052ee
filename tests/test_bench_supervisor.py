"""Round-5 wedge-proofing of the driver's scoreboard capture.

BENCH_r04.json was rc=124/parsed-null: the bench child wedged at first
relay contact while the kernel itself was at its record (the verdict's
independent retry read 17,111.85 clips/s). bench.py now supervises its
own TPU child under the shared watchdog (v2v_tpu/utils/watchdog.py)
with milestone heartbeats, process-group kill + retry, and a pinned
numpy baseline so vs_baseline stops swinging with host load.
"""
import json
import os
import subprocess
import sys
import time

import pytest

from subproc_env import cpu_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from v2v_tpu.utils.watchdog import run_watched, tree_cpu_s  # noqa: E402


# ---------------------------------------------------------------- watchdog

def test_tree_cpu_counts_grandchildren(tmp_path):
    """A parent idling while its worker subprocess burns CPU must not
    read as wedged (advisor round-4: only the direct child was
    sampled)."""
    prog = (
        "import subprocess, sys, time\n"
        "w = subprocess.Popen([sys.executable, '-c', "
        "'import time\\nt0=time.time()\\n"
        "while time.time()-t0<3: sum(i*i for i in range(20000))'])\n"
        "w.wait()\n")
    log = str(tmp_path / "grand.log")
    rc, wall, wedges = run_watched(
        [sys.executable, "-c", prog], log, str(tmp_path),
        wedge_s=2.0, poll_s=0.4, progress_cpu_s=0.1)
    assert (rc, wedges) == (0, 0)


def test_killpg_reaps_grandchildren(tmp_path):
    """The wedge kill must take the whole process group: an orphaned
    grandchild would keep holding the single-claimant TPU across the
    retry (advisor round-4)."""
    marker = tmp_path / "grandchild_alive"
    prog = (
        "import subprocess, sys, time\n"
        f"w = subprocess.Popen([sys.executable, '-S', '-c', '''\n"
        "import time, os\n"
        "for _ in range(200):\n"
        f"    open({str(marker)!r}, 'w').write(str(time.time()))\n"
        "    time.sleep(0.1)\n"
        "'''])\n"
        "time.sleep(600)\n")  # parent sleeps: the wedge signature
    log = str(tmp_path / "pg.log")
    # -S skips sitecustomize so interpreter start burns ~no CPU and the
    # first_progress window times the sleep, not the jax import
    rc, wall, wedges = run_watched(
        [sys.executable, "-S", "-c", prog], log, str(tmp_path),
        wedge_s=600.0, first_progress_s=1.5, poll_s=0.4, retries=0,
        progress_cpu_s=50.0)  # huge threshold: writer CPU won't reset it
    assert wedges == 1 and rc != 0
    # grandchild must be dead: marker stops advancing
    if marker.exists():
        m1 = marker.stat().st_mtime
        time.sleep(1.0)
        assert marker.stat().st_mtime == m1, "grandchild survived killpg"


def test_status_file_progress_resets_window(tmp_path):
    """A client-CPU-idle child (remote relay compile) stays alive as
    long as it appends milestones."""
    status = tmp_path / "status.txt"
    prog = (
        "import time\n"
        "for i in range(6):\n"
        f"    open({str(status)!r}, 'a').write(f'ms {{i}}\\n')\n"
        "    time.sleep(0.5)\n")
    log = str(tmp_path / "status.log")
    rc, wall, wedges = run_watched(
        [sys.executable, "-c", prog], log, str(tmp_path),
        wedge_s=1.5, poll_s=0.3, progress_cpu_s=50.0,
        status_path=str(status))
    assert (rc, wedges) == (0, 0)


def test_first_progress_window_is_tighter(tmp_path):
    """Before any sign of life the (tighter) first_progress_s window
    applies — the claim-grant wedge strikes before any work starts."""
    log = str(tmp_path / "first.log")
    t0 = time.time()
    rc, wall, wedges = run_watched(
        [sys.executable, "-S", "-c", "import time; time.sleep(600)"],
        log, str(tmp_path), wedge_s=600.0, first_progress_s=1.0,
        poll_s=0.3, retries=0, progress_cpu_s=1.0)
    assert wedges == 1 and rc != 0
    assert time.time() - t0 < 30


def test_killed_child_never_reports_success(tmp_path):
    """A SIGKILLed child that somehow exits 0 must still fail (the
    advisor's max(rc) masking scenario at the rehearsal level)."""
    log = str(tmp_path / "k0.log")
    rc, wall, wedges = run_watched(
        [sys.executable, "-S", "-c", "import time; time.sleep(600)"],
        log, str(tmp_path), wedge_s=1.0, poll_s=0.3, retries=0)
    assert rc != 0


# ------------------------------------------------------------------ bench

def test_bench_end_to_end_cpu(tmp_path):
    """`python bench.py` (supervisor mode) on CPU with tiny iters:
    stdout carries EXACTLY one line and it parses to the driver schema;
    vs_baseline uses the PINNED baseline; heartbeats go to stderr."""
    env = cpu_env()
    env["V2V_BENCH_ITERS"] = "2"
    env["V2V_COMPILE_CACHE"] = ""      # opt out: keep the test hermetic
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=500, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE json line: {lines}"
    obj = json.loads(lines[0])
    assert obj["metric"] == "webvid_to_voxel_clips_per_sec_per_chip"
    assert obj["unit"] == "clips/s"
    assert obj["value"] > 0
    import bench
    assert obj["baseline_clips_per_sec_pinned"] == \
        bench.PINNED_BASELINE_CLIPS_PER_SEC
    # vs_baseline is rounded to 2 decimals in the JSON; tiny CPU-run
    # values need the absolute tolerance
    assert obj["vs_baseline"] == pytest.approx(
        obj["value"] / bench.PINNED_BASELINE_CLIPS_PER_SEC,
        rel=0.01, abs=0.006)
    # diagnosability: the wedge-vs-compile discriminating milestones
    assert "backend up" in proc.stderr
    assert "compiled + warm" in proc.stderr


def test_bench_child_env_contract():
    """Supervisor passes V2V_BENCH_CHILD + status path; child mode is
    selected purely by env so the driver's `python bench.py` works."""
    import bench
    assert callable(bench.run_benchmark) and callable(bench.supervise)
    assert bench.PINNED_BASELINE_CLIPS_PER_SEC > 0


# ------------------------------------------------- release env hygiene

def test_validate_release_restores_env(monkeypatch, tmp_path):
    """allow_random_init must not leak V2V_RANDOM_TEACHER (or the run's
    V2V_WEIGHTS_DIR) into the process after the call (advisor round-4)."""
    from v2v_tpu.eval import release as rel

    seen = {}

    def fake_inner(assets, out, families, datasets, configs_dir,
                   max_batches, tol, allow_random_init, strict_convert,
                   fetch, downloader):
        seen["teacher"] = os.environ.get("V2V_RANDOM_TEACHER")
        os.environ["V2V_WEIGHTS_DIR"] = "/nonexistent/for/test"
        return 0

    monkeypatch.setattr(rel, "_validate_release", fake_inner)
    monkeypatch.delenv("V2V_RANDOM_TEACHER", raising=False)
    monkeypatch.delenv("V2V_WEIGHTS_DIR", raising=False)

    rc = rel.validate_release(str(tmp_path), out=str(tmp_path / "o"),
                              allow_random_init=True)
    assert rc == 0
    assert seen["teacher"] == "1"          # set for the run...
    assert "V2V_RANDOM_TEACHER" not in os.environ   # ...restored after
    assert "V2V_WEIGHTS_DIR" not in os.environ

    # pre-existing values are put back, not clobbered
    os.environ["V2V_RANDOM_TEACHER"] = "0"
    rel.validate_release(str(tmp_path), out=str(tmp_path / "o"),
                         allow_random_init=True)
    assert os.environ["V2V_RANDOM_TEACHER"] == "0"
    del os.environ["V2V_RANDOM_TEACHER"]


def test_random_teacher_flag_is_falsy_aware(monkeypatch, tmp_path):
    """V2V_RANDOM_TEACHER=0 must DISABLE the random teacher (advisor:
    any non-empty value used to enable it, so it could never be turned
    off once set)."""
    from v2v_tpu.training import raft

    monkeypatch.setenv("V2V_WEIGHTS_DIR", str(tmp_path))  # empty: no .pth
    monkeypatch.setenv("V2V_RANDOM_TEACHER", "0")
    model = raft.RAFT(small=True, iters=2)
    with pytest.raises(FileNotFoundError):
        raft._load_params("raft_small", model)
