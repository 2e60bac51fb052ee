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
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    assets = build_assets(os.path.join(wd, "assets"), args.smoke)
    results = {}
    for family in args.families.split(","):
        family = family.strip()
        out = os.path.join(wd, f"out_{family}")
        log = os.path.join(wd, f"{family}.log")
        cmd = [sys.executable, "-u", "-m", "v2v_tpu.eval.release",
               "--assets", assets, "--out", out,
               "--families", family, "--allow-random-init",
               "--max-batches", str(args.max_batches)]
        print(f"\n=== {family} ===", flush=True)
        t0 = time.time()
        with open(log, "w") as lf:
            rc = subprocess.call(cmd, cwd=REPO, stdout=lf,
                                 stderr=subprocess.STDOUT)
        dt = time.time() - t0
        tail = open(log).read().splitlines()[-6:]
        print("\n".join("  " + ln for ln in tail), flush=True)
        print(f"[{family}] rc={rc} wall={dt / 60:.1f} min", flush=True)
        results[family] = {"rc": rc, "minutes": round(dt / 60, 2)}

    total = sum(r["minutes"] for r in results.values())
    print(f"\n=== release rehearsal budget ===", flush=True)
    for f, r in results.items():
        status = "ok" if r["rc"] == 0 else f"rc={r['rc']}"
        print(f"  {f:10s} {r['minutes']:6.1f} min  [{status}]", flush=True)
    print(f"  {'TOTAL':10s} {total:6.1f} min "
          f"(--max-batches {args.max_batches}; real eval adds windows "
          f"at the measured ms/frame, docs/PERF.md serving table)",
          flush=True)
    jout = args.json_out or os.path.join(wd, "rehearsal_budget.json")
    with open(jout, "w") as f:
        json.dump({"families": results, "total_minutes": total,
                   "max_batches": args.max_batches,
                   "smoke": args.smoke}, f, indent=1)
    print(f"wrote {jout}", flush=True)
    sys.exit(max(r["rc"] for r in results.values()) if results else 1)


if __name__ == "__main__":
    main()
