"""Build the native C++ components (v2v_tpu/native/ -> shared libraries).

Usage: python scripts/build_native.py
Produces v2v_tpu/native/libvoxel_builder.so, loaded lazily by
v2v_tpu.data.native (ctypes) with a numpy fallback when absent. The
lazy loader also auto-builds on first use; this script just does it
eagerly (and with -march=native for the local machine).
"""
import os
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "v2v_tpu", "native")


def build() -> str:
    src = os.path.join(NATIVE, "voxel_builder.cpp")
    out = os.path.join(NATIVE, "libvoxel_builder.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", out]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print("built", out)
    return out


if __name__ == "__main__":
    build()
