"""Conversion parity for ETNet, HyperE2VID, and ERAFT against the
reference torch implementations (skipped when /root/reference absent)."""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


def _ref_import(module):
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        return importlib.import_module(module)
    finally:
        sys.path.remove(REFERENCE)


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _convert(tmodel, flax_params):
    # strict: every flax leaf must be produced by the conversion (extras
    # like ERAFT's duplicated norm3/downsample.1 keys are allowed)
    from v2v_tpu.models.convert import (torch_state_dict_to_flax,
                                        validate_against)
    converted = torch_state_dict_to_flax(tmodel.state_dict())
    return validate_against(flax_params, converted, strict=True)


def test_eitr_parity():
    import torch
    import jax
    import jax.numpy as jnp
    from v2v_tpu.models.eitr import EITR

    mod = _ref_import("model.eitr.eitr")
    tmodel = mod.EITR({"num_bins": 5, "norm": None})
    tmodel.eval()

    fmodel = EITR(eitr_kwargs={"num_bins": 5, "norm": None})
    h, w = 32, 40
    rng = np.random.RandomState(0)
    xs = rng.randn(2, 1, 5, h, w).astype(np.float32) * 0.3

    with torch.no_grad():
        tmodel.reset_states()
        t_outs = [tmodel(torch.tensor(x))["image"].numpy() for x in xs]

    state = fmodel.init_state(1, h, w)
    params0 = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(_nhwc(xs[0])),
                          state)
    params = _convert(tmodel, params0)
    f_outs = []
    for x in xs:
        out, state = fmodel.apply(params, jnp.asarray(_nhwc(x)), state)
        f_outs.append(np.transpose(np.asarray(out["image"]), (0, 3, 1, 2)))
    for i, (a, b) in enumerate(zip(t_outs, f_outs)):
        err = np.abs(a - b).max()
        assert err < 5e-4, f"step {i}: {err}"


def test_hyper_parity():
    import torch
    import jax
    import jax.numpy as jnp
    from v2v_tpu.models.hyper import HyperE2VID

    mod = _ref_import("model.hyper_model")
    kwargs = dict(num_bins=5, skip_type="sum", recurrent_block_type="convlstm",
                  num_encoders=3, base_num_channels=8, num_residual_blocks=1,
                  use_upsample_conv=True, norm=None, use_dynamic_decoder=True)
    tmodel = mod.HyperE2VID(dict(kwargs))
    tmodel.eval()

    fmodel = HyperE2VID(unet_kwargs=dict(kwargs))
    h, w = 32, 32
    rng = np.random.RandomState(1)
    xs = rng.randn(2, 1, 5, h, w).astype(np.float32) * 0.3

    with torch.no_grad():
        tmodel.reset_states()
        t_outs = [tmodel(torch.tensor(x))["image"].numpy() for x in xs]

    state = fmodel.init_state(1, h, w)
    params0 = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(_nhwc(xs[0])),
                          state)
    params = _convert(tmodel, params0)
    f_outs = []
    for x in xs:
        out, state = fmodel.apply(params, jnp.asarray(_nhwc(x)), state)
        f_outs.append(np.transpose(np.asarray(out["image"]), (0, 3, 1, 2)))
    for i, (a, b) in enumerate(zip(t_outs, f_outs)):
        err = np.abs(a - b).max()
        assert err < 5e-4, f"step {i}: {err}"


def test_nernet_parity():
    """NerNet released-checkpoint path (config/test_nernet_original.yaml):
    raw events -> learned voxelization -> NIAM-STcell-GCB UNet, multi-step
    with carried (h, c, m) state, against the reference torch model."""
    import torch
    import jax
    import jax.numpy as jnp
    from v2v_tpu.models.nernet import RepresentationRecurrent

    mod = _ref_import("model.nernet_model")
    # the shipped config's unet_kwargs (test_nernet_original.yaml),
    # shrunk spatially via the test resolution only
    kwargs = dict(num_bins=5, skip_type="sum",
                  recurrent_network="NIAM_STcell_GCB",
                  recurrent_block_type="", num_encoders=3,
                  base_num_channels=32, num_residual_blocks=2,
                  use_upsample_conv=True, norm="", crop_size=224,
                  mlp_layers=[1, 50, 50, 50, 1],
                  use_cnn_representation=True, normalize=False,
                  combine_voxel=False, RepCNN_kernel_size=3,
                  RepCNN_padding=1, RepCNN_channel=64, RepCNN_num_layers=1,
                  num_output_channels=1)
    tmodel = mod.RepresentationRecurrent(dict(kwargs))
    tmodel.eval()

    h, w = 52, 60          # not multiples of 8: exercises the pad+crop quirk
    tmodel.set_resolution(h, w)
    tmodel.reset_states()

    rng = np.random.RandomState(3)
    steps = []
    for _ in range(3):
        n = int(rng.randint(400, 900))
        xs = rng.randint(0, w, n).astype(np.float64)
        ys = rng.randint(0, h, n).astype(np.float64)
        ts = np.sort(rng.uniform(0.0, 0.05, n)).astype(np.float64)
        ps = (rng.randint(0, 2, n) * 2 - 1).astype(np.float64)
        steps.append(np.stack([xs, ys, ts, ps, np.zeros(n)], axis=1))

    t_outs = []
    with torch.no_grad():
        for evs in steps:
            out, _ = tmodel(torch.tensor(evs.copy()))
            t_outs.append(out["image"][:, :, :h, :w].numpy())

    fmodel = RepresentationRecurrent(unet_kwargs=dict(kwargs))
    state = fmodel.init_state(1, h, w)
    ev0 = jnp.asarray(steps[0], jnp.float32)
    variables = fmodel.init(jax.random.PRNGKey(0), ev0,
                            jnp.int32(len(steps[0])), state)
    params = _convert(tmodel, variables)
    f_outs = []
    for evs in steps:
        out, state = fmodel.apply(params, jnp.asarray(evs, jnp.float32),
                                  jnp.int32(evs.shape[0]), state)
        f_outs.append(np.transpose(np.asarray(out["image"]), (0, 3, 1, 2)))
    for i, (a, b) in enumerate(zip(t_outs, f_outs)):
        err = np.abs(a - b).max()
        assert err < 2e-2, f"step {i}: {err}"


def test_eraft_parity():
    import torch
    import jax
    import jax.numpy as jnp
    from v2v_tpu.models.eraft import ERAFT

    mod = _ref_import("model.eraft.eraft")
    tmodel = mod.ERAFT({"subtype": "warm_start"}, n_first_channels=5)
    tmodel.eval()

    fmodel = ERAFT(config={"subtype": "warm_start"}, n_first_channels=5,
                   iters=12)
    # torch's own pyramid lookup NaNs when a level degenerates to 1x1
    # (grid_sample normalization divides by W-1=0), so stay >= 128.
    h, w = 128, 128
    rng = np.random.RandomState(2)
    v1 = rng.randn(1, 5, h, w).astype(np.float32)
    v2 = rng.randn(1, 5, h, w).astype(np.float32)

    with torch.no_grad():
        tmodel.reset_states()
        t_flow1 = tmodel(torch.tensor(v1), torch.tensor(v2)).numpy()
        t_flow2 = tmodel(torch.tensor(v2), torch.tensor(v1)).numpy()

    state = fmodel.init_state(1, h, w)
    params0 = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(_nhwc(v1)),
                          jnp.asarray(_nhwc(v2)), state)
    params = _convert(tmodel, params0)
    out1, state = fmodel.apply(params, jnp.asarray(_nhwc(v1)),
                               jnp.asarray(_nhwc(v2)), state)
    f_flow1 = np.transpose(np.asarray(out1["flow"]), (0, 3, 1, 2))
    err1 = np.abs(t_flow1 - f_flow1).max()
    assert err1 < 2e-2, err1       # 12 iterations amplify fp differences
    out2, _ = fmodel.apply(params, jnp.asarray(_nhwc(v2)),
                           jnp.asarray(_nhwc(v1)), state)
    f_flow2 = np.transpose(np.asarray(out2["flow"]), (0, 3, 1, 2))
    err2 = np.abs(t_flow2 - f_flow2).max()
    assert err2 < 5e-2, err2       # warm-start path included
