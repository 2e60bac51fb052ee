"""Derive webvid1000/webvid100 video lists by random subsampling
(reference scripts/subsample_unfiltered.py).

Usage: python scripts/subsample_unfiltered.py [configs/webvid10000_unfiltered.txt]
"""
import random
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "configs/webvid10000_unfiltered.txt"
with open(src) as f:
    lines = f.readlines()

sub1000 = random.sample(lines, min(1000, len(lines)))
with open(src.replace("10000", "1000"), "w") as f:
    f.write("".join(sub1000))

sub100 = random.sample(sub1000, min(100, len(sub1000)))
with open(src.replace("10000", "100"), "w") as f:
    f.write("".join(sub100))
print("wrote", src.replace("10000", "1000"), "and", src.replace("10000", "100"))
