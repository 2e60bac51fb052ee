"""CLI train entry point: `python train.py config/train_xxx.yaml`.

Same public interface as the reference (README.md:9-13, train.py:254-262).
"""
import sys

from v2v_tpu.config import load_yaml
from v2v_tpu.training.train import main

if __name__ == "__main__":
    config_path = sys.argv[1] if len(sys.argv) > 1 else "configs/template.yaml"
    main(load_yaml(config_path))
