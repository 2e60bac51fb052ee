"""CLI train entry point: `python train.py config/train_xxx.yaml`.

Same public interface as the reference (README.md:9-13, train.py:254-262).
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
        jax.distributed.initialize()
    config_path = sys.argv[1] if len(sys.argv) > 1 else "configs/template.yaml"
    main(load_yaml(config_path))
