"""Merge per-invocation rehearsal budget jsons into one round artifact.

The full-resolution rehearsal runs family subsets across relay sessions
(scripts/rehearse_release.py --families ... --json-out ...); the judge
wants ONE artifact with every family's rc + minutes (round-5 verdict
#2, incl. fixing round 4's stale evflow rc=1 entry). Later files win on
family collisions, so re-runs supersede failures.

Usage:
    python scripts/merge_rehearsal_budgets.py out.json in1.json in2.json ...
"""
import json
import sys


def main():
    out_path, inputs = sys.argv[1], sys.argv[2:]
    families = {}
    max_batches = None
    for path in inputs:
        with open(path) as f:
            data = json.load(f)
        assert not data.get("smoke"), f"{path} is a smoke artifact"
        max_batches = data.get("max_batches", max_batches)
        for fam, rec in data.get("families", {}).items():
            families[fam] = dict(rec, source=path.rsplit("/", 1)[-1])
    total = round(sum(r["minutes"] for r in families.values()), 2)
    with open(out_path, "w") as f:
        json.dump({"families": families, "total_minutes": total,
                   "max_batches": max_batches, "smoke": False,
                   "merged_from": [p.rsplit("/", 1)[-1] for p in inputs]},
                  f, indent=1)
    ok = all(r["rc"] == 0 for r in families.values())
    print(f"wrote {out_path}: {len(families)} families, "
          f"total {total} min, all rc=0: {ok}")
    sys.exit(0 if ok and families else 1)


if __name__ == "__main__":
    main()
