"""Full-resolution rehearsal of the release acceptance kit — puts a
measured wall-clock budget on the machine-day (round-3 verdict weak #7:
"the 'one command' promise has no wall-clock budget attached").

Builds synthetic assets at the REAL benchmark resolutions (the shapes
the machine-day will compile for — reference test_e2vid.py:113-194):

    HQF    180x240   (DAVIS240C)
    IJRR   180x240   (DAVIS240C)
    MVSEC  260x346   (DAVIS346, with GT flow for the flow harness)
    EVAID  720x1280  (HD — the ETNet flash-attention shape)

then times ONE kit invocation per family (`--allow-random-init
--max-batches N`): the compile cost is paid in full at the real shapes;
only the number of eval windows is capped, so

    machine-day ~= sum_f (rehearsed_f - eval_windows_capped_out)

Per-family minutes land in --json-out and should be copied into
docs/PERF.md's release-kit table.

Usage (TPU; generous bound — 720p ETNet compiles are the long pole):
    timeout 9000 python -u scripts/rehearse_release.py \
        --workdir /tmp/release_rehearsal
CPU smoke:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -u scripts/rehearse_release.py --smoke \
        --workdir /tmp/release_rehearsal_smoke
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# dataset -> (H, W, registry sequence names to synthesize)
FULL_RES = {
    "HQF": (180, 240, ["boxes", "desk"]),
    "IJRR": (180, 240, ["boxes_6dof"]),
    "MVSEC": (260, 346, ["outdoor_day1"]),
    "EVAID": (720, 1280, ["ball"]),
}
SMOKE_RES = {
    "HQF": (24, 32, ["boxes"]),
    "MVSEC": (24, 32, ["outdoor_day1"]),
}

# no-CPU-progress window multipliers: a remote relay compile is client-
# CPU-idle too, and these families' compiles run 10-60 min (verify
# skill) — a 15-min window would kill a healthy compile.
WEDGE_SCALE = {"etnet": 4.0, "hyper": 2.5, "eraft": 2.5}


def build_assets(root, smoke):
    from test_data import make_hqf_h5
    spec = SMOKE_RES if smoke else FULL_RES
    n_frames = 12 if smoke else 81       # 81 = one 80-frame window
    for ds, (h, w, seqs) in spec.items():
        d = os.path.join(root, "h5", ds)
        os.makedirs(d, exist_ok=True)
        for i, name in enumerate(seqs):
            path = os.path.join(d, f"{name}.h5")
            if os.path.exists(path):
                continue
            make_hqf_h5(path, n_frames=n_frames, h=h, w=w,
                        events_per_frame=50 * (h * w) // 768, seed=i,
                        with_flow=(ds == "MVSEC"))
            print(f"[assets] {path} ({h}x{w}, {n_frames} frames)",
                  flush=True)
    return root


def _proc_cpu_s(pid):
    """Cumulative CPU seconds (utime+stime, all threads) of a live pid."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None


def run_watched(cmd, log_path, cwd, wedge_s=900.0, poll_s=20.0,
                retries=1, progress_cpu_s=2.0):
    """subprocess.call with a wedged-claimant watchdog.

    The axon relay's claim-lost signature is a child that accrues
    (almost) no CPU for tens of minutes while a FRESH process would get
    the chip in ~100 s (observed: 53 min at 8 s CPU). If the child makes
    < `progress_cpu_s` of CPU progress over `wedge_s` of wall, kill it
    (explicit pid — never by pattern) and retry up to `retries` times.

    Returns (rc, total_wall_s, n_wedge_kills).
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
                                     stderr=subprocess.STDOUT)
            last_cpu = 0.0
            last_progress_t = time.time()
            while True:
                try:
                    rc = child.wait(timeout=poll_s)
                    break
                except subprocess.TimeoutExpired:
                    pass
                cpu = _proc_cpu_s(child.pid)
                if cpu is None:
                    continue  # exiting; wait() will catch it
                if cpu - last_cpu >= progress_cpu_s:
                    last_cpu = cpu
                    last_progress_t = time.time()
                elif time.time() - last_progress_t > wedge_s:
                    wedges += 1
                    wedged = True
                    print(f"[watchdog] pid {child.pid} wedged: "
                          f"{cpu:.0f}s CPU, no progress for "
                          f"{time.time() - last_progress_t:.0f}s — "
                          f"killing and "
                          f"{'retrying' if attempt < retries else 'giving up'}",
                          flush=True)
                    child.kill()
                    rc = child.wait()
                    break
        if not wedged:
            return rc, time.time() - t_start, wedges
        if attempt < retries:
            time.sleep(30)  # let the relay recover the dead claim
    return rc, time.time() - t_start, wedges


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--families",
                    default="e2vid++,etnet,hyper,nernet,eraft,evflow")
    ap.add_argument("--max-batches", type=int, default=2,
                    help="eval windows per sequence (compiles are paid "
                         "in full regardless)")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--wedge-min", type=float, default=15.0,
                    help="kill+retry a family child that makes no CPU "
                         "progress for this many minutes (the relay's "
                         "lost-claim signature; waiting does not "
                         "recover it — verify skill). A remote compile "
                         "is ALSO client-CPU-idle, so long-compile "
                         "families get a wider window (WEDGE_SCALE).")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    assets = build_assets(os.path.join(wd, "assets"), args.smoke)
    jout = args.json_out or os.path.join(wd, "rehearsal_budget.json")
    results = {}

    def dump():
        # incremental: a driver timeout must not lose measured families
        with open(jout, "w") as f:
            json.dump({"families": results,
                       "total_minutes": round(sum(
                           r["minutes"] for r in results.values()), 2),
                       "max_batches": args.max_batches,
                       "smoke": args.smoke}, f, indent=1)

    for family in args.families.split(","):
        family = family.strip()
        out = os.path.join(wd, f"out_{family}")
        log = os.path.join(wd, f"{family}.log")
        cmd = [sys.executable, "-u", "-m", "v2v_tpu.eval.release",
               "--assets", assets, "--out", out,
               "--families", family, "--allow-random-init",
               "--max-batches", str(args.max_batches)]
        print(f"\n=== {family} ===", flush=True)
        open(log, "w").close()
        scale = WEDGE_SCALE.get(family, 1.0)
        rc, dt, wedges = run_watched(cmd, log, REPO,
                                     wedge_s=args.wedge_min * 60 * scale)
        tail = open(log).read().splitlines()[-6:]
        print("\n".join("  " + ln for ln in tail), flush=True)
        print(f"[{family}] rc={rc} wall={dt / 60:.1f} min"
              + (f" ({wedges} wedge kill{'s' * (wedges != 1)})"
                 if wedges else ""), flush=True)
        results[family] = {"rc": rc, "minutes": round(dt / 60, 2),
                           "wedge_kills": wedges}
        dump()

    total = sum(r["minutes"] for r in results.values())
    print(f"\n=== release rehearsal budget ===", flush=True)
    for f, r in results.items():
        status = "ok" if r["rc"] == 0 else f"rc={r['rc']}"
        print(f"  {f:10s} {r['minutes']:6.1f} min  [{status}]", flush=True)
    print(f"  {'TOTAL':10s} {total:6.1f} min "
          f"(--max-batches {args.max_batches}; real eval adds windows "
          f"at the measured ms/frame, docs/PERF.md serving table)",
          flush=True)
    dump()
    print(f"wrote {jout}", flush=True)
    sys.exit(max(r["rc"] for r in results.values()) if results else 1)


if __name__ == "__main__":
    main()
