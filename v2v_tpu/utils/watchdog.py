"""Wedged-TPU-claimant watchdog for subprocess drivers.

Field-observed failure mode (verify skill, rounds 2-4): a process whose
axon relay claim is lost sits for tens of minutes with ~zero CPU and no
output; waiting does not recover it, while a FRESH process gets the
chip in ~100 s once the wedged one is killed. Round 4's driver bench
capture died exactly this way (BENCH_r04.json rc=124/parsed-null with a
verified-healthy kernel).

This module gives any subprocess driver the signature detector + the
kill-and-retry loop:

  * progress = child *process-tree* CPU time advancing, OR an optional
    milestone/status file being appended to (a remote relay compile is
    client-CPU-idle, so CPU alone would kill healthy long compiles —
    children that can, should write milestones).
  * children are started in their own session (process group) and
    killed via killpg, so worker grandchildren cannot orphan-hold the
    single-claimant TPU across a retry (advisor round-4 item).

Used by scripts/rehearse_release.py (per-family kit children) and
bench.py (the driver's scoreboard capture supervises its own TPU child).

Reference counterpart: none — the reference assumes a healthy local
CUDA device; claim-loss is an axon-relay environment failure mode.
"""
from __future__ import annotations

import os
import signal
import subprocess
import time
from typing import Callable, List, Optional, Sequence, Tuple

_CLK = os.sysconf("SC_CLK_TCK")


def proc_cpu_s(pid: int) -> Optional[float]:
    """Cumulative CPU seconds (utime+stime, all threads) of a live pid."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / _CLK
    except (OSError, IndexError, ValueError):
        return None


def tree_cpu_s(root_pid: int) -> Optional[float]:
    """CPU seconds summed over root_pid and all live descendants.

    A kit child that fans work out to subprocess workers is CPU-idle
    itself while the workers burn; sampling only the direct child would
    false-trigger the wedge detector on healthy runs.
    """
    root = proc_cpu_s(root_pid)
    if root is None:
        return None
    ppid_of = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            ppid_of[int(entry)] = int(parts[1])
        except (OSError, IndexError, ValueError):
            continue
    total = root
    # resolve descendants by walking each pid's ancestor chain
    for pid in ppid_of:
        if pid == root_pid:
            continue
        p, hops = pid, 0
        while p in ppid_of and hops < 64:
            p = ppid_of[p]
            hops += 1
            if p == root_pid:
                cpu = proc_cpu_s(pid)
                if cpu:
                    total += cpu
                break
    return total


def _kill_group(child: subprocess.Popen) -> None:
    """SIGKILL the child's whole process group (it was started with
    start_new_session=True); fall back to the direct pid."""
    try:
        os.killpg(child.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError, OSError):
        try:
            child.kill()
        except OSError:
            pass


def run_watched(cmd: Sequence[str], log_path: str, cwd: str,
                wedge_s: float = 900.0, poll_s: float = 20.0,
                retries: int = 1, progress_cpu_s: float = 2.0,
                status_path: Optional[str] = None,
                env: Optional[dict] = None,
                heartbeat: Optional[Callable[[str], None]] = None,
                heartbeat_s: float = 60.0,
                first_progress_s: Optional[float] = None,
                ) -> Tuple[int, float, int]:
    """subprocess.call with the wedged-claimant watchdog.

    If the child's process tree makes < `progress_cpu_s` of CPU progress
    AND `status_path` (when given) is not appended to over `wedge_s` of
    wall time, kill the child's process group (explicit pgid — never by
    pattern) and retry up to `retries` times. `first_progress_s`, when
    set, is a tighter window applied until the FIRST progress signal —
    the claim-grant wedge strikes before any real work starts, so a
    healthy child shows life quickly while a wedged one never does.

    Returns (rc, total_wall_s, n_wedge_kills). rc is the last child's
    exit code; a killed child reports negative rc (never 0).
    """
    t_start = time.time()
    wedges = 0
    rc = -1
    for attempt in range(retries + 1):
        wedged = False
        with open(log_path, "a") as lf:
            lf.write(f"\n--- attempt {attempt + 1} ---\n")
            lf.flush()
            child = subprocess.Popen(cmd, cwd=cwd, stdout=lf,
                                     stderr=subprocess.STDOUT, env=env,
                                     start_new_session=True)
            last_cpu = 0.0
            last_status_size = -1
            saw_progress = False
            last_progress_t = time.time()
            last_beat_t = time.time()
            while True:
                try:
                    rc = child.wait(timeout=poll_s)
                    break
                except subprocess.TimeoutExpired:
                    pass
                progressed = False
                cpu = tree_cpu_s(child.pid)
                if cpu is None:
                    continue  # exiting; wait() will catch it
                if cpu - last_cpu >= progress_cpu_s:
                    last_cpu = cpu
                    progressed = True
                if status_path is not None:
                    try:
                        size = os.stat(status_path).st_size
                    except OSError:
                        size = -1
                    if size != last_status_size:
                        last_status_size = size
                        progressed = True
                if progressed:
                    saw_progress = True
                    last_progress_t = time.time()
                idle = time.time() - last_progress_t
                window = (first_progress_s
                          if (first_progress_s is not None
                              and not saw_progress) else wedge_s)
                if heartbeat and time.time() - last_beat_t >= heartbeat_s:
                    last_beat_t = time.time()
                    heartbeat(f"attempt {attempt + 1}: pid {child.pid} "
                              f"cpu={cpu:.0f}s idle={idle:.0f}s/"
                              f"{window:.0f}s")
                if idle > window:
                    wedges += 1
                    wedged = True
                    msg = (f"pid {child.pid} wedged: {cpu:.0f}s CPU, no "
                           f"progress for {idle:.0f}s — killing group and "
                           f"{'retrying' if attempt < retries else 'giving up'}")
                    if heartbeat:
                        heartbeat("[watchdog] " + msg)
                    else:
                        print("[watchdog] " + msg, flush=True)
                    lf.write(f"[watchdog] {msg}\n")
                    _kill_group(child)
                    rc = child.wait()
                    if rc == 0:  # a kill is never a success
                        rc = -9
                    break
        if not wedged:
            return rc, time.time() - t_start, wedges
        if attempt < retries:
            time.sleep(30)  # let the relay recover the dead claim
    return rc, time.time() - t_start, wedges
