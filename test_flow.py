"""CLI flow test entry point: `python test_flow.py config/test_xxx.yaml
[test_all_checkpoints]`. Same interface as the reference test_flow.py.
"""
import sys

from v2v_tpu.config import load_yaml
from v2v_tpu.eval.flow_harness import main

if __name__ == "__main__":
    config_path = sys.argv[1] if len(sys.argv) > 1 else "configs/template.yaml"
    test_all = len(sys.argv) > 2
    main(load_yaml(config_path), test_all_pths=test_all)
