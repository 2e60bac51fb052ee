"""Console entry points (v2v_tpu/cli.py) — the wheel's CLI surface.

The argv contract is the reference's (README.md:9-13): argv[1] = config
YAML, optional argv[2] = "test all checkpoints" for the test drivers
(reference test_e2vid.py:113-125).
"""
import os
import subprocess
import sys

import yaml

from v2v_tpu import cli
from subproc_env import cpu_env
from test_end_to_end import make_config, workspace  # noqa: F401 (fixture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_cfg(tmp_path, payload):
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(payload))
    return str(p)


def test_train_dispatch(tmp_path, monkeypatch):
    cfg_path = _write_cfg(tmp_path, {"experiment_name": "cli_exp"})
    seen = {}
    monkeypatch.setattr("v2v_tpu.training.train.main",
                        lambda cfg: seen.update(cfg=cfg))
    cli.train(["train.py", cfg_path])
    assert seen["cfg"]["experiment_name"] == "cli_exp"


def test_train_no_distributed_init_without_env(tmp_path, monkeypatch):
    # the generic launch env vars are absent -> no jax.distributed call
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    import jax

    def boom(*a, **k):  # pragma: no cover - would fail the test
        raise AssertionError("distributed.initialize called")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    cfg_path = _write_cfg(tmp_path, {"experiment_name": "x"})
    monkeypatch.setattr("v2v_tpu.training.train.main", lambda cfg: None)
    cli.train(["train.py", cfg_path])


def test_train_distributed_env_passes_count_and_id(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    import jax
    seen = {}
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda num_processes=None, process_id=None: seen.update(
            n=num_processes, i=process_id))
    cfg_path = _write_cfg(tmp_path, {"experiment_name": "x"})
    monkeypatch.setattr("v2v_tpu.training.train.main", lambda cfg: None)
    cli.train(["train.py", cfg_path])
    assert seen == {"n": 2, "i": 1}


def test_test_drivers_argv2_means_test_all(tmp_path, monkeypatch):
    cfg_path = _write_cfg(tmp_path, {"experiment_name": "cli_exp"})
    calls = []
    monkeypatch.setattr(
        "v2v_tpu.eval.harness.main",
        lambda cfg, test_all_pths=False: calls.append(
            ("e2vid", cfg["experiment_name"], test_all_pths)))
    monkeypatch.setattr(
        "v2v_tpu.eval.flow_harness.main",
        lambda cfg, test_all_pths=False: calls.append(
            ("flow", cfg["experiment_name"], test_all_pths)))
    cli.test_e2vid(["test_e2vid.py", cfg_path])
    cli.test_e2vid(["test_e2vid.py", cfg_path, "anything"])
    cli.test_flow(["test_flow.py", cfg_path, "1"])
    assert calls == [("e2vid", "cli_exp", False),
                     ("e2vid", "cli_exp", True),
                     ("flow", "cli_exp", True)]


def test_cli_subprocess_train_then_eval(workspace):  # noqa: F811
    """The actual `python train.py cfg.yaml` / `python test_e2vid.py
    cfg.yaml` subprocess contract (reference README.md:9-13): train one
    tiny epoch, checkpoint lands via the ckpt_paths protocol, then the
    eval CLI scores it into the CSV. Everything resolves relative to
    the invoking cwd, like the reference."""
    tmp_path, webvid_root_file, video_list, h5_list = workspace
    cfg = make_config(tmp_path, webvid_root_file, video_list, h5_list)
    cfg["train_stages"][0]["max_epochs"] = 1
    cfg["train_stages"][0]["dataset"]["train"][0]["max_samples_per_shot"] = 2
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    (tmp_path / "ckpt_paths").mkdir(exist_ok=True)

    env = cpu_env()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"), str(cfg_path)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    ckpt_list = tmp_path / "ckpt_paths" / "smoke_e2e.txt"
    assert ckpt_list.exists(), r.stderr[-2000:]
    assert ckpt_list.read_text().strip().endswith("epoch_0000.msgpack")

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "test_e2vid.py"), str(cfg_path)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    csv = tmp_path / "tensorboard_logs" / "smoke_e2e" / \
        "all_test_results_new.csv"
    lines = csv.read_text().splitlines()
    assert lines[0].startswith("Checkpoint_path,")
    assert lines[1].startswith("epoch_0000.msgpack,")


def test_console_scripts_registered():
    # pyproject [project.scripts] must point at these callables
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "pyproject.toml")).read()
    for name, fn in [("v2v-train", "train"),
                     ("v2v-test-e2vid", "test_e2vid"),
                     ("v2v-test-flow", "test_flow")]:
        assert f'{name} = "v2v_tpu.cli:{fn}"' in text
        assert callable(getattr(cli, fn))
