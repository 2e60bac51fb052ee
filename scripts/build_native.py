"""Build the native C++ components (v2v_tpu/native/ -> shared libraries).

Usage: python scripts/build_native.py
Produces v2v_tpu/native/libvoxel_builder.so, loaded lazily by
v2v_tpu.data.native (ctypes) with a numpy fallback when absent. The
lazy loader also auto-builds on first use; this script just does it
eagerly, with -march=native for the local machine.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v2v_tpu.data import native


if __name__ == "__main__":
    out = os.path.join(native._NATIVE_DIR, "libvoxel_builder.so")
    print("built", native.build(out, extra_flags=("-march=native",),
                                quiet=False))
