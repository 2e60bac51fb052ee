"""Real multi-host smoke: TWO jax.distributed processes on CPU, each
with 4 virtual devices, assembling a global batch from host-local rows
via shard_batch -> make_array_from_process_local_data and syncing a
gradient across the 8-device data mesh (reference DistributedSampler +
DDP semantics, train.py:41-58)."""
import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{{port}}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, {repo!r})
from v2v_tpu.parallel.mesh import make_mesh, shard_batch, replicate

assert jax.process_count() == 2
assert jax.device_count() == 8 and len(jax.local_devices()) == 4
mesh = make_mesh(8)
local = {{"x": np.full((4, 3), pid, np.float32)}}   # this host's shard
gb = shard_batch(local, mesh)
assert gb["x"].shape == (8, 3), gb["x"].shape
total = float(jax.jit(lambda b: b["x"].sum())(gb))
assert total == 12.0, total                         # 4*3*0 + 4*3*1

params = replicate({{"w": jnp.ones((3,))}}, mesh)

@jax.jit
def step(p, b):
    g = jax.grad(lambda w: ((b["x"] @ w) ** 2).mean())(p["w"])
    return {{"w": p["w"] - 0.1 * g}}

p2 = step(params, gb)
shards = [np.asarray(sh.data) for sh in p2["w"].addressable_shards]
np.testing.assert_array_equal(shards[0], shards[-1])
print("MULTIHOST_OK", pid, float(shards[0][0]))
"""


def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:       # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from subproc_env import cpu_env
    env = cpu_env("XLA_FLAGS", "JAX_PLATFORMS")
    del env["JAX_PLATFORMS"]   # the worker script pins cpu itself
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=str(tmp_path)) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"MULTIHOST_OK {pid}" in out, out[-2000:]
    # identical synced params on both hosts
    w0 = outs[0].split("MULTIHOST_OK 0")[1].split()[0]
    w1 = outs[1].split("MULTIHOST_OK 1")[1].split()[0]
    assert w0 == w1, (w0, w1)
