"""Console entry points (`v2v-train`, `v2v-test-e2vid`, `v2v-test-flow`)
so a pip-installed wheel has the same CLI surface as the repo checkout.

The argv contract is the reference's (README.md:9-13): argv[1] = config
YAML; for the test drivers an optional argv[2] means "test all
checkpoints" (reference test_e2vid.py:113-125). The repo-root shims
(train.py / test_e2vid.py / test_flow.py) call these same functions.
"""
import os
import sys


def _maybe_init_distributed() -> None:
    """Multi-host: single-controller JAX replaces torchrun/NCCL
    (reference train.py:41-47). The generic env-var launch needs the
    process count/id passed explicitly — JAX reads
    JAX_COORDINATOR_ADDRESS itself but NOT these two; Cloud TPU pods /
    Slurm / OMPI autodetect everything."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("JAX_NUM_PROCESSES"):
        import jax
        num = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(num) if num else None,
            process_id=int(pid) if pid else None)


def train(argv=None) -> None:
    from v2v_tpu.config import load_yaml
    from v2v_tpu.training.train import main
    from v2v_tpu.utils.compile_cache import maybe_enable
    argv = sys.argv if argv is None else argv
    maybe_enable()
    _maybe_init_distributed()
    config_path = argv[1] if len(argv) > 1 else "configs/template.yaml"
    main(load_yaml(config_path))


def test_e2vid(argv=None) -> None:
    from v2v_tpu.config import load_yaml
    from v2v_tpu.eval.harness import main
    from v2v_tpu.utils.compile_cache import maybe_enable
    argv = sys.argv if argv is None else argv
    maybe_enable()
    config_path = argv[1] if len(argv) > 1 else "configs/template.yaml"
    main(load_yaml(config_path), test_all_pths=len(argv) > 2)


def test_flow(argv=None) -> None:
    from v2v_tpu.config import load_yaml
    from v2v_tpu.eval.flow_harness import main
    from v2v_tpu.utils.compile_cache import maybe_enable
    argv = sys.argv if argv is None else argv
    maybe_enable()
    config_path = argv[1] if len(argv) > 1 else "configs/template.yaml"
    main(load_yaml(config_path), test_all_pths=len(argv) > 2)


def validate_release(argv=None) -> None:
    """Acceptance kit: `v2v-validate-release --assets DIR` converts the
    released .pth checkpoints, runs both test drivers over every
    available benchmark h5 set, and prints the within-1% deltas against
    the reference regression table (v2v_tpu/eval/release.py)."""
    from v2v_tpu.eval.release import main
    from v2v_tpu.utils.compile_cache import maybe_enable
    maybe_enable()
    main(None if argv is None else argv[1:])
