"""CLI flow test entry point: `python test_flow.py config/test_xxx.yaml
[test_all_checkpoints]`. Same interface as the reference test_flow.py.
Installed wheels expose the same command as `v2v-test-flow`.
"""
from v2v_tpu.cli import test_flow

if __name__ == "__main__":
    test_flow()
