"""CLI train entry point: `python train.py config/train_xxx.yaml`.

Same public interface as the reference (README.md:9-13, train.py:254-262).

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
import os
import sys

from v2v_tpu.config import load_yaml
from v2v_tpu.training.train import main

if __name__ == "__main__":
    # multi-host: single-controller JAX replaces torchrun/NCCL
    # (reference train.py:41-47); the standard cluster env vars
    # (JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID / JAX_NUM_PROCESSES or a
    # supported cluster autodetect) trigger collective initialization
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("JAX_NUM_PROCESSES"):
        import jax
        # jax.distributed.initialize() only auto-detects on Cloud TPU
        # pods / Slurm / OMPI; for the generic env-var launch above the
        # process count and id must be passed explicitly (JAX reads
        # JAX_COORDINATOR_ADDRESS itself but NOT these two).
        num = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(num) if num else None,
            process_id=int(pid) if pid else None)
    config_path = sys.argv[1] if len(sys.argv) > 1 else "configs/template.yaml"
    main(load_yaml(config_path))
