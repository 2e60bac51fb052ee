"""The release-rehearsal wedge watchdog (scripts/rehearse_release.py).

Round-4 field finding (verify skill): a TPU child whose relay claim is
lost sits for tens of minutes with ~zero CPU; waiting does not recover
it, a kill+fresh-process does. The rehearsal driver now detects that
signature (no CPU progress over a wall window) and kills+retries the
family child so an unattended machine-day survives relay wedges.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))
from rehearse_release import _proc_cpu_s, run_watched  # noqa: E402


def test_proc_cpu_s_self():
    # burn a little CPU so the counter is nonzero
    t0 = time.time()
    while time.time() - t0 < 0.05:
        sum(i * i for i in range(1000))
    cpu = _proc_cpu_s(os.getpid())
    assert cpu is not None and cpu >= 0.0
    assert _proc_cpu_s(2 ** 22 + 12345) is None  # no such pid


def test_healthy_child_untouched(tmp_path):
    log = str(tmp_path / "ok.log")
    rc, wall, wedges = run_watched(
        [sys.executable, "-c", "print('fine')"], log, str(tmp_path),
        wedge_s=60.0, poll_s=0.2)
    assert (rc, wedges) == (0, 0)
    assert "fine" in open(log).read()


def test_failing_child_rc_passthrough(tmp_path):
    log = str(tmp_path / "fail.log")
    rc, wall, wedges = run_watched(
        [sys.executable, "-c", "import sys; sys.exit(3)"], log,
        str(tmp_path), wedge_s=60.0, poll_s=0.2)
    assert (rc, wedges) == (3, 0)


def test_wedged_child_killed_and_retried(tmp_path, monkeypatch):
    # a sleeper accrues no CPU: the wedge signature. Tiny window so the
    # watchdog fires on both attempts; retry pause shortened via patch.
    orig_sleep = time.sleep
    monkeypatch.setattr(time, "sleep", lambda s: orig_sleep(min(s, 0.2)))
    log = str(tmp_path / "wedge.log")
    t0 = time.time()
    rc, wall, wedges = run_watched(
        [sys.executable, "-c", "import time; time.sleep(600)"], log,
        str(tmp_path), wedge_s=1.0, poll_s=0.3, retries=1)
    assert wedges == 2            # killed on the first try AND the retry
    assert rc != 0                # a kill is never a success
    assert time.time() - t0 < 60  # did not wait out the sleeps
    assert open(log).read().count("--- attempt") == 2


def test_cpu_progress_resets_window(tmp_path):
    # a child that keeps burning CPU is never wedged even when
    # wedge_s is far shorter than its runtime
    prog = ("import time\n"
            "t0 = time.time()\n"
            "while time.time() - t0 < 4:\n"
            "    sum(i * i for i in range(20000))\n")
    log = str(tmp_path / "busy.log")
    rc, wall, wedges = run_watched(
        [sys.executable, "-c", prog], log, str(tmp_path),
        wedge_s=3.0, poll_s=0.5, progress_cpu_s=0.1)
    assert (rc, wedges) == (0, 0)
