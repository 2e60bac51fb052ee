"""Build the native C++ components (native/ -> shared libraries).

Usage: python scripts/build_native.py
Produces native/libvoxel_builder.so, loaded lazily by
v2v_tpu.data.native (ctypes) with a numpy fallback when absent.
"""
import os
import subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")


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
