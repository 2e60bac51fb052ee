"""CLI e2vid test entry point: `python test_e2vid.py config/test_xxx.yaml
[test_all_checkpoints]`. Same interface as the reference test_e2vid.py.
Installed wheels expose the same command as `v2v-test-e2vid`.
"""
from v2v_tpu.cli import test_e2vid

if __name__ == "__main__":
    test_e2vid()
