"""Converter schema + numeric parity for the teacher networks whose real
weights don't exist offline (VERDICT round-1 items 4/5): torchvision
RAFT (raft_small / raft_large) and the LPIPS trunks (alexnet / vgg16).

Torch 'twin' modules are built here with torchvision's EXACT module
tree (child names, Sequential indices, bias/norm placement — torchvision
models/optical_flow/raft.py and models/{alexnet,vgg}.py), randomly
initialized. The tests then assert:
  1. schema: torch_state_dict_to_flax(twin.state_dict()) covers the flax
     init tree leaf-for-leaf (strict, bidirectional) — a future machine
     with real weights needs zero converter debugging;
  2. numerics: the flax forward reproduces the torch twin's forward, so
     conv padding/stride/pool/upsample conventions are pinned too.
The twins' correlation lookup and convex upsampling reuse the
reference's own RAFT-derived torch code (model/eraft/corr.py,
model/eraft/utils.py) rather than re-deriving them here.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

torch = pytest.importorskip("torch")
import torch.nn as nn                                    # noqa: E402
import torch.nn.functional as F                          # noqa: E402


def _ref_import(module):
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        return importlib.import_module(module)
    finally:
        sys.path.remove(REFERENCE)


def _tree_leaf_paths(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_leaf_paths(v, prefix + (k,)))
    else:
        out[prefix] = tuple(np.shape(tree))
    return out


def _assert_bidirectional(flax_vars, converted):
    """Strict two-way leaf/shape match (no missing, no extras)."""
    tpl = _tree_leaf_paths(flax_vars)
    cvt = _tree_leaf_paths(converted)
    missing = sorted(set(tpl) - set(cvt))
    extra = sorted(set(cvt) - set(tpl))
    assert not missing, f"flax leaves not produced by converter: {missing[:8]}"
    assert not extra, f"converter leaves with no flax home: {extra[:8]}"
    bad = [p for p in tpl if tpl[p] != cvt[p]]
    assert not bad, f"shape mismatches: {[(p, tpl[p], cvt[p]) for p in bad[:8]]}"


# ---------------------------------------------------------------------------
# torchvision twins: RAFT
# ---------------------------------------------------------------------------

def _cna(cin, cout, k, stride=1, norm=None, act=True):
    """torchvision Conv2dNormActivation: Sequential(0 conv, [1 norm],
    relu); conv bias only when norm_layer is None; InstanceNorm2d is
    affine=False/track_running_stats=False (no state-dict entries)."""
    mods = [nn.Conv2d(cin, cout, k, stride, (k - 1) // 2,
                      bias=norm is None)]
    if norm == "batch":
        mods.append(nn.BatchNorm2d(cout))
    elif norm == "instance":
        mods.append(nn.InstanceNorm2d(cout))
    if act:
        mods.append(nn.ReLU())
    return nn.Sequential(*mods)


class _TResidualBlock(nn.Module):
    def __init__(self, cin, cout, norm, stride):
        super().__init__()
        self.convnormrelu1 = _cna(cin, cout, 3, stride, norm)
        self.convnormrelu2 = _cna(cout, cout, 3, 1, norm)
        self.downsample = (nn.Identity() if stride == 1
                           else _cna(cin, cout, 1, stride, norm, act=False))
        self.relu = nn.ReLU()

    def forward(self, x):
        y = self.convnormrelu2(self.convnormrelu1(x))
        return self.relu(self.downsample(x) + y)


class _TBottleneckBlock(nn.Module):
    def __init__(self, cin, cout, norm, stride):
        super().__init__()
        q = cout // 4
        self.convnormrelu1 = _cna(cin, q, 1, 1, norm)
        self.convnormrelu2 = _cna(q, q, 3, stride, norm)
        self.convnormrelu3 = _cna(q, cout, 1, 1, norm)
        self.downsample = (nn.Identity() if stride == 1
                           else _cna(cin, cout, 1, stride, norm, act=False))
        self.relu = nn.ReLU()

    def forward(self, x):
        y = self.convnormrelu3(self.convnormrelu2(self.convnormrelu1(x)))
        return self.relu(self.downsample(x) + y)


class _TFeatureEncoder(nn.Module):
    def __init__(self, block, layers, norm):
        super().__init__()
        self.convnormrelu = _cna(3, layers[0], 7, 2, norm)
        self.layer1 = nn.Sequential(block(layers[0], layers[1], norm, 1),
                                    block(layers[1], layers[1], norm, 1))
        self.layer2 = nn.Sequential(block(layers[1], layers[2], norm, 2),
                                    block(layers[2], layers[2], norm, 1))
        self.layer3 = nn.Sequential(block(layers[2], layers[3], norm, 2),
                                    block(layers[3], layers[3], norm, 1))
        self.conv = nn.Conv2d(layers[3], layers[4], 1)

    def forward(self, x):
        x = self.convnormrelu(x)
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv(x)


class _TMotionEncoder(nn.Module):
    def __init__(self, corr_ch, corr_layers, flow_layers, out):
        super().__init__()
        self.convcorr1 = _cna(corr_ch, corr_layers[0], 1)
        self.convcorr2 = (_cna(corr_layers[0], corr_layers[1], 3)
                          if len(corr_layers) == 2 else nn.Identity())
        self.convflow1 = _cna(2, flow_layers[0], 7)
        self.convflow2 = _cna(flow_layers[0], flow_layers[1], 3)
        self.conv = _cna(corr_layers[-1] + flow_layers[-1], out - 2, 3)

    def forward(self, flow, corr):
        c = self.convcorr2(self.convcorr1(corr))
        f = self.convflow2(self.convflow1(flow))
        x = self.conv(torch.cat([c, f], dim=1))
        return torch.cat([x, flow], dim=1)


class _TConvGRU(nn.Module):
    def __init__(self, input_size, hidden, k, pad):
        super().__init__()
        self.convz = nn.Conv2d(hidden + input_size, hidden, k, padding=pad)
        self.convr = nn.Conv2d(hidden + input_size, hidden, k, padding=pad)
        self.convq = nn.Conv2d(hidden + input_size, hidden, k, padding=pad)

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


class _TRecurrentBlock(nn.Module):
    def __init__(self, input_size, hidden, kernels, pads):
        super().__init__()
        self.convgru1 = _TConvGRU(input_size, hidden, kernels[0], pads[0])
        self.convgru2 = (_TConvGRU(input_size, hidden, kernels[1], pads[1])
                         if len(kernels) == 2 else nn.Identity())

    def forward(self, h, x):
        h = self.convgru1(h, x)
        if not isinstance(self.convgru2, nn.Identity):
            h = self.convgru2(h, x)
        return h


class _TFlowHead(nn.Module):
    def __init__(self, cin, hidden):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, hidden, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden, 2, 3, padding=1)
        self.relu = nn.ReLU()

    def forward(self, x):
        return self.conv2(self.relu(self.conv1(x)))


class _TUpdateBlock(nn.Module):
    def __init__(self, small):
        super().__init__()
        if small:
            self.motion_encoder = _TMotionEncoder(4 * 7 * 7, (96,),
                                                  (64, 32), 82)
            self.recurrent_block = _TRecurrentBlock(64 + 82, 96,
                                                    ((3, 3),), ((1, 1),))
            self.flow_head = _TFlowHead(96, 128)
        else:
            self.motion_encoder = _TMotionEncoder(4 * 9 * 9, (256, 192),
                                                  (128, 64), 128)
            self.recurrent_block = _TRecurrentBlock(
                128 + 128, 128, ((1, 5), (5, 1)), ((0, 2), (2, 0)))
            self.flow_head = _TFlowHead(128, 256)

    def forward(self, net, ctx, flow, corr):
        m = self.motion_encoder(flow, corr)
        net = self.recurrent_block(net, torch.cat([ctx, m], dim=1))
        return net, self.flow_head(net)


class _TMaskPredictor(nn.Module):
    def __init__(self):
        super().__init__()
        self.convrelu = _cna(128, 256, 3)
        self.conv = nn.Conv2d(256, 64 * 9, 1)

    def forward(self, x):
        return 0.25 * self.conv(self.convrelu(x))


class _TRAFT(nn.Module):
    """torchvision raft_large/raft_small twin (module tree + forward)."""

    def __init__(self, small):
        super().__init__()
        self.small = small
        if small:
            self.feature_encoder = _TFeatureEncoder(
                _TBottleneckBlock, (32, 32, 64, 96, 128), "instance")
            self.context_encoder = _TFeatureEncoder(
                _TBottleneckBlock, (32, 32, 64, 96, 160), None)
            self.hdim, self.cdim, self.radius = 96, 64, 3
        else:
            self.feature_encoder = _TFeatureEncoder(
                _TResidualBlock, (64, 64, 96, 128, 256), "instance")
            self.context_encoder = _TFeatureEncoder(
                _TResidualBlock, (64, 64, 96, 128, 256), "batch")
            self.hdim, self.cdim, self.radius = 128, 128, 4
        self.update_block = _TUpdateBlock(small)
        if not small:
            self.mask_predictor = _TMaskPredictor()

    @staticmethod
    def _convex_upsample(flow, mask):
        # original-RAFT upsample_flow (reference model/eraft/eraft.py:66-77)
        n, _, h, w = flow.shape
        mask = mask.view(n, 1, 9, 8, 8, h, w)
        mask = torch.softmax(mask, dim=2)
        up = F.unfold(8 * flow, [3, 3], padding=1).view(n, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3)
        return up.reshape(n, 2, 8 * h, 8 * w)

    def forward(self, image1, image2, iters):
        corr_mod = _ref_import("model.eraft.corr")
        utils_mod = _ref_import("model.eraft.utils")
        fmap1 = self.feature_encoder(image1)
        fmap2 = self.feature_encoder(image2)
        corr_block = corr_mod.CorrBlock(fmap1, fmap2, num_levels=4,
                                        radius=self.radius)
        cnet = self.context_encoder(image1)
        net, ctx = torch.split(cnet, [self.hdim, self.cdim], dim=1)
        net, ctx = torch.tanh(net), torch.relu(ctx)
        n, _, h8, w8 = fmap1.shape
        coords0 = utils_mod.coords_grid(n, h8, w8).to(image1.device)
        coords1 = coords0.clone()
        for _ in range(iters):
            coords1 = coords1.detach()
            corr = corr_block(coords1)
            flow = coords1 - coords0
            net, delta = self.update_block(net, ctx, flow, corr)
            coords1 = coords1 + delta
        flow_low = coords1 - coords0
        if self.small:
            return 8 * F.interpolate(flow_low, scale_factor=8,
                                     mode="bilinear", align_corners=True)
        return self._convex_upsample(flow_low, self.mask_predictor(net))


def _flax_raft_and_params(small, iters, twin):
    import jax
    import jax.numpy as jnp
    from v2v_tpu.training.raft import RAFT
    from v2v_tpu.models.convert import (torch_state_dict_to_flax,
                                        validate_against)
    model = RAFT(small=small, iters=iters)
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), dummy, dummy)
    converted = torch_state_dict_to_flax(twin.state_dict())
    _assert_bidirectional(variables, converted)
    params = validate_against(variables, converted, strict=True)
    return model, params


@pytest.mark.parametrize("small", [True, False])
def test_raft_teacher_schema_and_parity(small):
    import jax.numpy as jnp
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted (twin reuses its corr code)")
    torch.manual_seed(0 if small else 1)
    twin = _TRAFT(small)
    twin.eval()
    # non-trivial BN running stats so stat conversion is actually tested
    for m in twin.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)

    iters = 3
    model, params = _flax_raft_and_params(small, iters, twin)

    # >=128px: torch's own pyramid lookup NaNs when a level degenerates
    # to 1x1 (grid_sample normalization divides by W-1=0)
    rng = np.random.RandomState(4)
    i1 = rng.randn(1, 3, 128, 136).astype(np.float32)
    i2 = rng.randn(1, 3, 128, 136).astype(np.float32)
    with torch.no_grad():
        t_flow = twin(torch.tensor(i1), torch.tensor(i2), iters).numpy()
    f_flow = np.transpose(
        np.asarray(model.apply(params, jnp.asarray(i1.transpose(0, 2, 3, 1)),
                               jnp.asarray(i2.transpose(0, 2, 3, 1)))),
        (0, 3, 1, 2))
    err = np.abs(t_flow - f_flow).max()
    assert err < 5e-3, err


# ---------------------------------------------------------------------------
# torchvision twins: LPIPS trunks (alexnet / vgg16 `features`)
# ---------------------------------------------------------------------------

def _t_alexnet_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(3, 2))


def _t_vgg16_features():
    chans = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
    mods, cin = [], 3
    for c in chans:
        if c == "M":
            mods.append(nn.MaxPool2d(2, 2))
        else:
            mods += [nn.Conv2d(cin, c, 3, 1, 1), nn.ReLU()]
            cin = c
    return nn.Sequential(*mods)


class _TFire(nn.Module):
    """torchvision.models.squeezenet.Fire — exact child names so the
    state_dict schema matches (squeeze/expand1x1/expand3x3)."""

    def __init__(self, inp, s, e1, e3):
        super().__init__()
        self.squeeze = nn.Conv2d(inp, s, kernel_size=1)
        self.squeeze_activation = nn.ReLU(inplace=True)
        self.expand1x1 = nn.Conv2d(s, e1, kernel_size=1)
        self.expand1x1_activation = nn.ReLU(inplace=True)
        self.expand3x3 = nn.Conv2d(s, e3, kernel_size=3, padding=1)
        self.expand3x3_activation = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat([
            self.expand1x1_activation(self.expand1x1(x)),
            self.expand3x3_activation(self.expand3x3(x))], 1)


def _t_squeezenet_features():
    # torchvision squeezenet1_1 `features` (models/squeezenet.py)
    return nn.Sequential(
        nn.Conv2d(3, 64, kernel_size=3, stride=2), nn.ReLU(),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(64, 16, 64, 64), _TFire(128, 16, 64, 64),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(128, 32, 128, 128), _TFire(256, 32, 128, 128),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        _TFire(256, 48, 192, 192), _TFire(384, 48, 192, 192),
        _TFire(384, 64, 256, 256), _TFire(512, 64, 256, 256))


# LPIPS tap positions in the torch Sequential (after these reluN
# indices), matching reference PerceptualSimilarity slices
_T_TAPS = {"alex": [1, 4, 7, 9, 11], "vgg": [3, 8, 15, 22, 29],
           "squeeze": [1, 4, 7, 9, 10, 11, 12]}


@pytest.mark.parametrize("ks", [3, 5, 7])
def test_shipped_fourier_bessel_bases_match_reference(ks):
    """HyperE2VID's multiscale Fourier-Bessel bases ship as data
    (models/weights/fourier_bessel_bases.npz); they must equal what the
    reference computes from its bessel.npy (model/hyper/
    fourier_bessel.py:bases_list)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    mod = _ref_import("model.hyper.fourier_bessel")
    import v2v_tpu.models as vm
    shipped = np.load(os.path.join(os.path.dirname(vm.__file__), "weights",
                                   "fourier_bessel_bases.npz"))
    want = mod.bases_list(ks, 6).numpy()
    np.testing.assert_allclose(shipped[f"ks{ks}"], want, atol=1e-6)


def test_shipped_metric_reference_table_matches_reference():
    """eval/metric_references.json (the beat_method regression table)
    must equal the reference's hardcoded table digit for digit
    (utils/metric_references.py:125-206) — a wrong entry silently skews
    every benchmark comparison."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    import json
    mod = _ref_import("utils.metric_references")
    import v2v_tpu.eval as ev
    with open(os.path.join(os.path.dirname(ev.__file__),
                           "metric_references.json")) as f:
        shipped = json.load(f)
    want = mod.metric_references
    assert set(shipped) == set(want)
    for method in want:
        assert set(shipped[method]) == set(want[method]), method
        for seq in want[method]:
            for metric, val in want[method][seq].items():
                assert shipped[method][seq][metric] == val, \
                    (method, seq, metric)


@pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
def test_shipped_lpips_lin_weights_match_reference_pth(net):
    """The packaged linear calibration heads (losses/weights/
    lpips_lin_*.npz) must equal the reference's in-tree v0.1 .pth
    weights exactly — these tiny heads ARE the LPIPS calibration
    (PerceptualSimilarity/models/weights/v0.1)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    import v2v_tpu.losses.lpips as lp
    pth = os.path.join(REFERENCE, "PerceptualSimilarity", "models",
                       "weights", "v0.1", f"{net}.pth")
    sd = torch.load(pth, map_location="cpu", weights_only=False)
    shipped = np.load(os.path.join(os.path.dirname(lp.__file__),
                                   "weights", f"lpips_lin_{net}.npz"))
    assert len(shipped.files) == len(sd)
    for i in range(len(sd)):
        want = sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
        got = shipped[f"lin{i}"]
        np.testing.assert_array_equal(got, want)
        assert got.min() >= 0.0     # heads are stored non-negative


@pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
def test_lpips_trunk_converter_schema_and_parity(net, tmp_path):
    import jax
    import jax.numpy as jnp
    from v2v_tpu.losses.lpips import (LPIPSModule, _torch_backbone_params,
                                      _TAP_CHANNELS)

    torch.manual_seed(2)
    feats = {"alex": _t_alexnet_features, "vgg": _t_vgg16_features,
             "squeeze": _t_squeezenet_features}[net]()
    feats.eval()
    # user saves the FULL torchvision model state_dict; add classifier
    # keys to verify they are ignored
    sd = {f"features.{k}": v for k, v in feats.state_dict().items()}
    sd["classifier.1.weight"] = torch.zeros(10, 10)
    sd["classifier.1.bias"] = torch.zeros(10)
    path = str(tmp_path / "backbone.pth")
    torch.save(sd, path)

    trunk_params = _torch_backbone_params(net, path)

    # schema: exact leaf/shape match with the flax trunk init
    module = LPIPSModule(net=net)
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = module.init(jax.random.PRNGKey(0), dummy, dummy)
    _assert_bidirectional(variables["params"]["features"],
                          {k: dict(v) for k, v in trunk_params.items()})

    # numeric parity of the tapped activations; 66px for squeeze so its
    # ceil_mode maxpools actually take the partial-window (pad) path
    rng = np.random.RandomState(5)
    hw = 66 if net == "squeeze" else 64
    x = rng.randn(1, 3, hw, hw).astype(np.float32)
    with torch.no_grad():
        t_taps, y = [], torch.tensor(x)
        for i, m in enumerate(feats):
            y = m(y)
            if i in _T_TAPS[net]:
                t_taps.append(y.numpy())

    params = jax.tree.map(np.asarray, variables)
    params["params"]["features"] = jax.tree.map(np.asarray, trunk_params)
    feats_fn = (module.bind(params).trunk)
    f_taps = feats_fn(jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(f_taps) == len(t_taps) == len(_TAP_CHANNELS[net])
    for i, (a, b) in enumerate(zip(t_taps, f_taps)):
        b = np.transpose(np.asarray(b), (0, 3, 1, 2))
        assert a.shape == b.shape, (i, a.shape, b.shape)
        err = np.abs(a - b).max()
        assert err < 1e-4, (i, err)
