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
