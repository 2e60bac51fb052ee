"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize imports jax and registers the axon TPU
plugin before conftest runs, so plain env vars are too late — use
jax.config.update to pin the platform, and set XLA_FLAGS before the
first backend instantiation (it is read lazily at client creation).
"""
import os

if os.environ.get("V2V_TESTS_TPU") == "1":
    # real-TPU test mode (serialize with other TPU claimants!): used for
    # the Pallas PRNG statistical tests in test_voxel_pallas.py, which
    # have no CPU-interpret lowering. Everything else still passes.
    import jax  # noqa: F401
else:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")


def ref_import(modname: str):
    """Import a module from the mounted reference repo.

    Handles the sys.path dance and temporarily stubs the reference's
    optional imports that this environment lacks (torchvision, ffmpeg,
    event_voxel_builder — all unused by the code under test). Stubs are
    installed only when the real package is absent and are removed
    again after the import, so nothing leaks into later tests (and on a
    machine that HAS torchvision/ffmpeg the real packages are used).
    """
    import importlib
    import importlib.util
    import sys
    import types

    reference = "/root/reference"
    installed = []
    for name in ("torchvision", "torchvision.transforms", "ffmpeg",
                 "event_voxel_builder"):
        if name in sys.modules:
            continue
        try:
            if importlib.util.find_spec(name) is not None:
                continue
        except (ImportError, ModuleNotFoundError):
            pass
        stub = types.ModuleType(name)
        if name == "event_voxel_builder":
            stub.EventVoxelBuilder = object
        sys.modules[name] = stub
        installed.append(name)
        if "." in name:                 # attach child to parent stub
            parent, child = name.rsplit(".", 1)
            if parent in sys.modules:
                setattr(sys.modules[parent], child, stub)
    sys.path.insert(0, reference)
    try:
        return importlib.import_module(modname)
    finally:
        sys.path.remove(reference)
        for name in installed:
            sys.modules.pop(name, None)
