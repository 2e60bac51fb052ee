"""Delete all but the last checkpoint of each experiment (reference
scripts/clean_checkpoints.py).

Usage: python scripts/clean_checkpoints.py [experiment ...]
(no args: all experiments under checkpoints/)
"""
import glob
import os
import sys

exps = sys.argv[1:] or [os.path.basename(p)
                        for p in sorted(glob.glob("checkpoints/*"))]
for exp in exps:
    path_file = f"ckpt_paths/{exp}.txt"
    try:
        with open(path_file) as f:
            lines = [l.strip() for l in f if l.strip()]
        keep = os.path.basename(lines[-1])
        for ckpt in sorted(glob.glob(f"checkpoints/{exp}/*")):
            if os.path.basename(ckpt) != keep:
                print("removing", ckpt)
                os.remove(ckpt)
    except Exception as e:
        print(exp, "skipped:", e)
