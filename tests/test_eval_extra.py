"""Extra eval-harness coverage: mixed resolutions in one run, and the
checkpoint-conversion CLI roundtrip against a real torch model."""
import os
import subprocess
import sys

import numpy as np
import pytest

from test_data import make_hqf_h5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODULE_CFG = {
    "loss": {},
    "model": {"target": "model.model.E2VIDRecurrent",
              "params": {"unet_kwargs": {
                  "num_bins": 5, "skip_type": "sum",
                  "recurrent_block_type": "convlstm", "num_encoders": 3,
                  "base_num_channels": 4, "num_residual_blocks": 1,
                  "use_upsample_conv": True, "final_activation": "",
                  "norm": "none"}}},
}


def test_mixed_resolution_sequences(tmp_path):
    """Two sequences with different H,W in one test run: per-resolution
    recompile + state reset on sequence change."""
    from v2v_tpu.eval.harness import run_single_test
    h5a = make_hqf_h5(str(tmp_path / "seq_small.h5"), n_frames=5, h=24,
                      w=32)
    h5b = make_hqf_h5(str(tmp_path / "seq_big.h5"), n_frames=5, h=40,
                      w=48, seed=1)
    (tmp_path / "list.txt").write_text(h5a + "\n" + h5b + "\n")
    cfg = {
        "experiment_name": "mixres", "test_output_dir": None,
        "module": MODULE_CFG,
        "test_stage": {"test_num_workers": 1, "test": [{
            "data_file": str(tmp_path / "list.txt"),
            "class_name": "data.testh5.TestH5Dataset",
            "dataset_name": "hqf", "num_bins": 5, "sequence_length": 4}]},
    }
    result = run_single_test(None, cfg, root=str(tmp_path))
    assert any("seq_small" in k for k in result)
    assert any("seq_big" in k for k in result)
    assert all(np.isfinite(v) for v in result.values())


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_convert_cli_roundtrip(tmp_path):
    """Save a real torch E2VIDRecurrent checkpoint (reference format),
    convert via the CLI, load in the harness, and require numerical
    agreement with the torch forward."""
    import torch
    import yaml
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/reference")
    try:
        from model.model import E2VIDRecurrent as TorchE2VID
    finally:
        sys.path.remove("/root/reference")

    kwargs = dict(num_bins=5, skip_type="sum",
                  recurrent_block_type="convlstm", num_encoders=3,
                  base_num_channels=4, num_residual_blocks=1,
                  use_upsample_conv=True, final_activation="", norm=None)
    tmodel = TorchE2VID(dict(kwargs))
    tmodel.eval()
    pth = str(tmp_path / "ckpt.pth")
    torch.save({"state_dict": tmodel.state_dict(), "epoch": 7}, pth)

    cfg = {"experiment_name": "roundtrip",
           "module": {"loss": {},
                      "model": {"target": "model.model.E2VIDRecurrent",
                                "params": {"unet_kwargs": kwargs}}},
           "test_stage": {"test": []}}
    cfg_path = str(tmp_path / "cfg.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    out_path = str(tmp_path / "ckpt.msgpack")
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "convert_checkpoint_from_original.py"),
         "convert", cfg_path, pth, out_path],
        capture_output=True, text=True, cwd=REPO,
        env=__import__("subproc_env").cpu_env())
    assert r.returncode == 0, r.stderr

    from v2v_tpu.models.model import E2VIDRecurrent
    from v2v_tpu.training.checkpoint import load_params_only
    fmodel = E2VIDRecurrent(unet_kwargs=kwargs)
    h, w = 32, 32
    state = fmodel.init_state(1, h, w)
    x = np.random.RandomState(0).randn(1, 5, h, w).astype(np.float32) * 0.4
    params0 = fmodel.init(jax.random.PRNGKey(0),
                          jnp.asarray(x.transpose(0, 2, 3, 1)), state)
    params = load_params_only(out_path, params0)
    out, _ = fmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), state)

    with torch.no_grad():
        tmodel.reset_states()
        t_out = tmodel(torch.tensor(x))["image"].numpy()
    err = np.abs(t_out - np.asarray(out["image"]).transpose(0, 3, 1, 2)).max()
    assert err < 2e-4, err
