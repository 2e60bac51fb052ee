"""CLI train entry point: `python train.py config/train_xxx.yaml`.

Same public interface as the reference (README.md:9-13, train.py:254-262).
Installed wheels expose the same command as `v2v-train` (v2v_tpu/cli.py).

Multi-host launch (replaces torchrun+NCCL DDP, reference train.py:41-58):
run the same command on every host of the slice with the standard JAX
cluster env vars, e.g. for 2 hosts:

    # host 0                                # host 1
    JAX_COORDINATOR_ADDRESS=host0:1234 \\    JAX_COORDINATOR_ADDRESS=host0:1234 \\
    JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=0 \\  JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=1 \\
    python train.py config/train_v2v_e2vid_10k.yaml

(on Cloud TPU pods `jax.distributed.initialize()` autodetects all three).
Each host then loads its own 1/N shard of the sample indices
(data/interface.py:_indices) and contributes its local rows to the global
batch via `jax.make_array_from_process_local_data`
(parallel/mesh.py:shard_batch); gradient all-reduce over ICI/DCN is
inserted by XLA. Checkpoint/TensorBoard writes are process-0-gated.
"""
from v2v_tpu.cli import train

if __name__ == "__main__":
    train()
