"""Checkpoint-conversion fidelity: build the REFERENCE torch models (from
/root/reference, when present), convert their state_dicts, and require
numerical agreement of the recurrent forward over multiple steps.

This is the inference-parity gate for the released checkpoints
(BASELINE.md acceptance: metrics within 1%)."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")

UNET_KWARGS = dict(
    num_bins=5, skip_type="sum", recurrent_block_type="convlstm",
    num_encoders=3, base_num_channels=8, num_residual_blocks=2,
    use_upsample_conv=True, norm=None)


def _torch_model(name, kwargs, module="model.model"):
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        mod = importlib.import_module(module)
        return getattr(mod, name)
    finally:
        sys.path.remove(REFERENCE)


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _run_parity(torch_cls_name, torch_kwargs, flax_model, steps=3,
                h=32, w=48, atol=2e-4, key="image", kwargs_style="unet",
                module="model.model"):
    import torch
    import jax
    import jax.numpy as jnp

    cls = _torch_model(torch_cls_name, torch_kwargs, module)
    if kwargs_style == "unet":
        tmodel = cls(dict(torch_kwargs))
    else:                       # FireNet-style flat kwargs
        tmodel = cls(**torch_kwargs)
    tmodel.eval()

    rng = np.random.RandomState(0)
    xs = rng.randn(steps, 1, 5, h, w).astype(np.float32) * 0.5

    with torch.no_grad():
        tmodel.reset_states()
        t_outs = [tmodel(torch.tensor(x))[key].numpy() for x in xs]

    from v2v_tpu.models.convert import (torch_state_dict_to_flax,
                                        validate_against)
    state = flax_model.init_state(1, h, w)
    params0 = flax_model.init(jax.random.PRNGKey(0),
                              jnp.asarray(_nhwc(xs[0])), state)
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    params = validate_against(params0, converted, strict=True)

    f_outs = []
    for x in xs:
        out, state = flax_model.apply(params, jnp.asarray(_nhwc(x)), state)
        f_outs.append(np.transpose(np.asarray(out[key]), (0, 3, 1, 2)))

    for i, (t_o, f_o) in enumerate(zip(t_outs, f_outs)):
        err = np.abs(t_o - f_o).max()
        assert err < atol, f"step {i}: max abs err {err}"


def test_e2vid_recurrent_parity():
    from v2v_tpu.models.model import E2VIDRecurrent
    kwargs = dict(UNET_KWARGS, final_activation="")
    _run_parity("E2VIDRecurrent", kwargs,
                E2VIDRecurrent(unet_kwargs=kwargs))


def test_flownet_parity():
    from v2v_tpu.models.model import FlowNet
    kwargs = dict(UNET_KWARGS, num_output_channels=3)
    _run_parity("FlowNet", kwargs, FlowNet(unet_kwargs=kwargs))
    _run_parity("FlowNet", kwargs, FlowNet(unet_kwargs=kwargs), key="flow")


def test_evflownet_parity():
    from v2v_tpu.models.model import EVFlowNet
    kwargs = dict(num_bins=5)
    _run_parity("EVFlowNet", kwargs, EVFlowNet(unet_kwargs=kwargs),
                h=32, w=32, key="flow")


def test_firenet_parity():
    from v2v_tpu.models.model import FireNet
    kwargs = dict(num_bins=5, base_num_channels=16, kernel_size=3)
    _run_parity("FireNet", {"num_bins": 5, "base_num_channels": 16,
                            "kernel_size": 3},
                FireNet(unet_kwargs=kwargs), kwargs_style="flat")


def test_wflownet_parity():
    """W-net: shared encoders, separate image/flow decoder stacks
    (model/unet.py:66-130)."""
    from v2v_tpu.models.model import WFlowNet
    kwargs = dict(UNET_KWARGS)
    _run_parity("WFlowNet", kwargs, WFlowNet(unet_kwargs=kwargs))
    _run_parity("WFlowNet", kwargs, WFlowNet(unet_kwargs=kwargs),
                key="flow")


def test_color_e2vid_parity():
    """UNetFlow(img_3c=True): 3-channel image head
    (model/model.py:164-192)."""
    from v2v_tpu.models.model import ColorE2VID
    kwargs = dict(UNET_KWARGS)
    _run_parity("ColorE2VID", kwargs, ColorE2VID(unet_kwargs=kwargs))


def test_flownet_norecur_parity():
    """Non-recurrent UNetFlow variant (model/model.py:142-162)."""
    from v2v_tpu.models.model import FlowNetNoRecur
    kwargs = dict(UNET_KWARGS)
    _run_parity("FlowNetNoRecur", kwargs,
                FlowNetNoRecur(unet_kwargs=kwargs))
    _run_parity("FlowNetNoRecur", kwargs,
                FlowNetNoRecur(unet_kwargs=kwargs), key="flow")


def test_firenet_legacy_parity():
    """FireNet_legacy + UNetFire with the BN-heavy legacy layout
    (model/legacy.py:225-256). BN runs in eval mode (running stats)."""
    from v2v_tpu.models.legacy import FireNetLegacy
    cfg = {"num_bins": 5, "base_num_channels": 12,
           "num_residual_blocks": 2, "kernel_size": 3, "skip_type": "sum",
           "norm": "BN", "recurrent_block_type": "convgru",
           "recurrent_blocks": {"resblock": [0]}}
    _run_parity("FireNet_legacy", {"config": cfg},
                FireNetLegacy(unet_kwargs=cfg), kwargs_style="flat",
                module="model.legacy")


def test_convgru_variant_parity():
    from v2v_tpu.models.model import E2VIDRecurrent
    kwargs = dict(UNET_KWARGS, recurrent_block_type="convgru",
                  final_activation="")
    _run_parity("E2VIDRecurrent", kwargs,
                E2VIDRecurrent(unet_kwargs=kwargs))


def test_instance_norm_variant_parity():
    """norm: IN — reference ConvLayer/UpsampleConvLayer use
    InstanceNorm2d(track_running_stats=True) (stored stats at eval),
    ResidualBlock uses plain InstanceNorm2d (live stats). Running stats
    randomized so the stored-stats path is actually exercised."""
    import torch
    from v2v_tpu.models.model import E2VIDRecurrent
    kwargs = dict(UNET_KWARGS, norm="IN", final_activation="")

    cls = _torch_model("E2VIDRecurrent", kwargs)
    tmodel = cls(dict(kwargs))
    for m in tmodel.modules():
        if isinstance(m, torch.nn.InstanceNorm2d) and m.track_running_stats:
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 2.0)
    tmodel.eval()

    import jax
    import jax.numpy as jnp
    from v2v_tpu.models.convert import (torch_state_dict_to_flax,
                                        validate_against)
    fmodel = E2VIDRecurrent(unet_kwargs=kwargs)
    h, w = 32, 48
    rng = np.random.RandomState(7)
    xs = rng.randn(3, 1, 5, h, w).astype(np.float32) * 0.5
    with torch.no_grad():
        tmodel.reset_states()
        t_outs = [tmodel(torch.tensor(x))["image"].numpy() for x in xs]
    state = fmodel.init_state(1, h, w)
    params0 = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(_nhwc(xs[0])),
                          state)
    params = validate_against(params0,
                              torch_state_dict_to_flax(tmodel.state_dict()),
                              strict=True)
    for i, x in enumerate(xs):
        out, state = fmodel.apply(params, jnp.asarray(_nhwc(x)), state)
        err = np.abs(t_outs[i]
                     - np.transpose(np.asarray(out["image"]),
                                    (0, 3, 1, 2))).max()
        assert err < 5e-4, f"step {i}: {err}"


def test_wrapper_prefix_stripping():
    """DDP 'module.' and compile '_orig_mod.' prefixes are stripped
    (reference convert_to_compiled, train.py:18-39)."""
    import numpy as np
    from v2v_tpu.models.convert import torch_state_dict_to_flax

    class T:
        def __init__(self, a):
            self.a = np.asarray(a, np.float32)

        def detach(self):
            return self

        def cpu(self):
            return self

        def numpy(self):
            return self.a

    sd = {"_orig_mod.module.head.conv2d.weight": T(np.ones((4, 3, 5, 5))),
          "_orig_mod.module.head.conv2d.bias": T(np.zeros(4))}
    out = torch_state_dict_to_flax(sd)
    assert out["params"]["head"]["conv2d"]["kernel"].shape == (5, 5, 3, 4)
    assert out["params"]["head"]["conv2d"]["bias"].shape == (4,)


def test_validate_checkpoint_script(tmp_path):
    """scripts/validate_checkpoint.py end-to-end on a real .pth file:
    reference torch model (random weights) saved with DDP prefixes ->
    script converts, runs both sides, prints PASS."""
    import subprocess
    import torch
    import yaml

    cls = _torch_model("E2VIDRecurrent", None)
    kwargs = dict(UNET_KWARGS, final_activation="")
    tmodel = cls(dict(kwargs))
    ckpt = str(tmp_path / "real.pth")
    torch.save({"state_dict": {f"module.{k}": v
                               for k, v in tmodel.state_dict().items()},
                "epoch": 7}, ckpt)
    cfg = str(tmp_path / "cfg.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump({"module": {"model": {
            "target": "model.model.E2VIDRecurrent",
            "params": {"unet_kwargs": dict(kwargs)}}}}, f)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts",
                                      "validate_checkpoint.py"),
         cfg, ckpt, "--steps", "2", "--height", "32", "--width", "40"],
        capture_output=True, timeout=600,
        env=__import__("subproc_env").cpu_env())
    assert out.returncode == 0, out.stdout + out.stderr
    assert b"PASS" in out.stdout, out.stdout
