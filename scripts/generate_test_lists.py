"""Generate the benchmark h5 sidecar lists from the sequence registry.

The test configs reference `configs/{hqf,ijrr,mvsec,evaid}_test.txt` and
`configs/mvsec_test_flow.txt` (one unified-format h5 path per line, like
the reference's config/*.txt). The benchmark sequence names are fixed —
they are the rows of the regression table
(v2v_tpu/eval/metric_references.json, reference
utils/metric_references.py:125-206) — so the lists can be generated for
any dataset root instead of hand-written:

    python scripts/generate_test_lists.py --root /data/event_benchmarks

expects the layout `{root}/{HQF,IJRR,MVSEC,EVAID}/{sequence}.h5` plus
`{root}/MVSEC_flow/{sequence}.h5` (build the h5 files with
scripts/{mvsec,ijrr,evaid,...}_to_h5.py). Pass --check to fail on
missing files.
"""
import argparse
import json
import os
import sys

REFS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "v2v_tpu", "eval", "metric_references.json")

# MVSEC flow benchmark sequences (test_flow registry; the reference's
# config/mvsec_test_flow.txt)
MVSEC_FLOW = ["indoor_flying1", "indoor_flying2", "indoor_flying3",
              "outdoor_day1", "outdoor_day2"]


def sequences_by_dataset():
    with open(REFS) as f:
        table = json.load(f)
    out = {}
    for method in table.values():
        for key in method:
            ds, seq = key.split("/", 1)
            out.setdefault(ds, set()).add(seq)
    return {ds: sorted(seqs) for ds, seqs in out.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True,
                    help="dataset root: {root}/{DATASET}/{seq}.h5")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs"))
    ap.add_argument("--check", action="store_true",
                    help="fail if any listed h5 is missing")
    args = ap.parse_args()

    lists = {}
    for ds, seqs in sequences_by_dataset().items():
        lists[f"{ds.lower()}_test.txt"] = [
            os.path.join(args.root, ds, f"{s}.h5") for s in seqs]
    lists["mvsec_test_flow.txt"] = [
        os.path.join(args.root, "MVSEC_flow", f"{s}.h5")
        for s in MVSEC_FLOW]

    # validate BEFORE writing: with --check a failure must not leave
    # configs/ pointing at nonexistent h5 paths
    missing = [p for paths in lists.values() for p in paths
               if not os.path.exists(p)]
    if missing:
        print(f"{len(missing)} listed files do not exist under "
              f"{args.root} (first: {missing[0]})")
        if args.check:
            print("--check: no list files written")
            sys.exit(1)

    for fname, paths in lists.items():
        path = os.path.join(args.out, fname)
        with open(path, "w") as f:
            f.write("\n".join(paths) + "\n")
        print(f"wrote {path} ({len(paths)} sequences)")


if __name__ == "__main__":
    main()
