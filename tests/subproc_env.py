"""Environment for CPU-only python subprocesses spawned by tests.

With PALLAS_AXON_POOL_IPS set, the container sitecustomize registers
the axon TPU plugin at interpreter start of EVERY python process; that
registration blocks while the relay recovers a previous claim (e.g.
after a killed TPU run), hanging an otherwise CPU-only subprocess.
Strip it so test subprocesses never touch the relay.
"""
import os


def cpu_env(*drop: str) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS" and k not in drop}
    env["JAX_PLATFORMS"] = "cpu"
    return env
