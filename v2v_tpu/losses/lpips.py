"""LPIPS perceptual distance in Flax (NHWC).

Functional port of the vendored PerceptualSimilarity LPIPS v0.1
(reference PerceptualSimilarity/models/networks_basic.py:32-101): frozen
AlexNet/VGG16/SqueezeNet1.1 trunk -> per-layer channel-unit-normalized
activations ->
squared difference -> 1x1 linear calibration -> spatial mean -> sum over
layers.

The tiny linear calibration weights ship with this package
(losses/weights/lpips_lin_*.npz, converted from the reference's in-tree
v0.1 .pth files). The conv trunks are ImageNet-pretrained torchvision
checkpoints which cannot be redistributed here; provide them via

    LPIPS(net="alex").restore(torch_backbone_path="/path/alexnet-owt.pth")

or drop `alexnet-owt-7be5be79.pth` / `vgg16-397923af.pth` /
`squeezenet1_1-b8a52dc0.pth` into `$V2V_WEIGHTS_DIR`
(default ./pretrained). Without them the trunk falls
back to fixed random features (He init, fixed seed) — still a valid
training signal, but NOT comparable to published LPIPS numbers; a loud
warning is emitted once.
"""
from __future__ import annotations

import functools
import os
import warnings
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

_WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "weights")

# Input scaling constants of the LPIPS ScalingLayer
# (PerceptualSimilarity/models/networks_basic.py, public constants).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision backbone filenames users are expected to provide.
_BACKBONE_FILES = {
    "alex": "alexnet-owt-7be5be79.pth",
    "vgg": "vgg16-397923af.pth",
    "squeeze": "squeezenet1_1-b8a52dc0.pth",
}

# AlexNet features: (out_ch, kernel, stride, pad), 'M' = maxpool 3x3 s2.
_ALEX_ARCH = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M",
              (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1)]
# Tap activations after each relu (all 5 convs, relu1..relu5):
_ALEX_TAPS = [0, 1, 2, 3, 4]

# VGG16 features: conv3x3 channels with maxpool2 between stages.
_VGG_CHANNELS = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                 512, 512, 512, "M", 512, 512, 512]
_VGG_TAPS = [1, 3, 6, 9, 12]   # conv indices (relu1_2, 2_2, 3_3, 4_3, 5_3)


class _AlexFeatures(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats, conv_idx = [], 0
        for spec in _ALEX_ARCH:
            if spec == "M":
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
                continue
            ch, k, s, p = spec
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv{conv_idx}")(x)
            x = nn.relu(x)
            if conv_idx in _ALEX_TAPS:
                feats.append(x)
            conv_idx += 1
        return feats


class _VGGFeatures(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats, conv_idx = [], 0
        for spec in _VGG_CHANNELS:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
                continue
            x = nn.Conv(spec, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"conv{conv_idx}")(x)
            x = nn.relu(x)
            if conv_idx in _VGG_TAPS:
                feats.append(x)
            conv_idx += 1
        return feats


def _max_pool_ceil(x: Array, k: int, s: int) -> Array:
    """torch MaxPool2d(k, s, ceil_mode=True): pad bottom/right with -inf
    so the last (partial) window is kept. torch guarantees the last
    window starts inside the input, which pad<=s-1 preserves."""
    _, h, w, _ = x.shape
    out_h = -(-(h - k) // s) + 1
    out_w = -(-(w - k) // s) + 1
    pad_h = (out_h - 1) * s + k - h
    pad_w = (out_w - 1) * s + k - w
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s), padding="VALID")


class _Fire(nn.Module):
    """torchvision squeezenet Fire: 1x1 squeeze -> relu -> parallel
    1x1/3x3 expands -> relu -> channel concat (models/squeezenet.py)."""
    squeeze_ch: int
    expand_ch: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(nn.Conv(self.squeeze_ch, (1, 1), name="squeeze")(x))
        a = nn.relu(nn.Conv(self.expand_ch, (1, 1), name="expand1x1")(x))
        b = nn.relu(nn.Conv(self.expand_ch, (3, 3),
                            padding=((1, 1), (1, 1)), name="expand3x3")(x))
        return jnp.concatenate([a, b], axis=-1)


# SqueezeNet1_1 features: Fire specs keyed by the torchvision Sequential
# index (reference PerceptualSimilarity/models/pretrained_networks.py:6-54
# slices its `tv.squeezenet1_1().features` at these boundaries).
_SQUEEZE_FIRES = {3: (16, 64), 4: (16, 64), 6: (32, 128), 7: (32, 128),
                  9: (48, 192), 10: (48, 192), 11: (64, 256), 12: (64, 256)}
_SQUEEZE_POOLS = (2, 5, 8)           # MaxPool2d(3, 2, ceil_mode=True)
_SQUEEZE_TAPS = (1, 4, 7, 9, 10, 11, 12)   # relu1..relu7 slice outputs


class _SqueezeFeatures(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats = []
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                            name="conv0")(x))
        if 1 in _SQUEEZE_TAPS:
            feats.append(x)
        for i in range(2, 13):
            if i in _SQUEEZE_POOLS:
                x = _max_pool_ceil(x, 3, 2)
            else:
                s, e = _SQUEEZE_FIRES[i]
                x = _Fire(s, e, name=f"fire{i}")(x)
            if i in _SQUEEZE_TAPS:
                feats.append(x)
        return feats


def _unit_normalize(x: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


# tapped-layer channel counts (static, per net) for the lin params
# (reference networks_basic.py:44-52: self.chns per pnet_type)
_TAP_CHANNELS = {"alex": [64, 192, 384, 256, 256],
                 "vgg": [64, 128, 256, 512, 512],
                 "squeeze": [64, 128, 256, 384, 384, 512, 512]}


class LPIPSModule(nn.Module):
    """dist(in0, in1) per batch element. Inputs NHWC, 3 channels,
    range [-1, 1] (use normalize=True wrapper for [0, 1] inputs).

    `features` / `dist_from_features` split the computation so callers
    can precompute one side's (unit-normalized) features outside a
    gradient/remat region — the training loss does this for the GT
    branch, which has no parameters upstream and would otherwise be
    recomputed in every remat chunk's backward pass."""
    net: str = "alex"

    def setup(self):
        trunk_cls = {"alex": _AlexFeatures, "vgg": _VGGFeatures,
                     "squeeze": _SqueezeFeatures}[self.net]
        self.trunk = trunk_cls(name="features")
        self.lins = [
            self.param(f"lin{i}", nn.initializers.ones, (ch,))
            for i, ch in enumerate(_TAP_CHANNELS[self.net])]

    def features(self, x: Array) -> List[Array]:
        """Unit-normalized tap activations of the scaled trunk."""
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        return [_unit_normalize(f) for f in self.trunk((x - shift) / scale)]

    def dist_from_features(self, f0: List[Array], f1: List[Array]) -> Array:
        total = 0.0
        for lin, a, b in zip(self.lins, f0, f1):
            diff = (a - b) ** 2
            # 1x1 conv with non-negative weights == channel dot; the
            # reference applies abs at load (weights are stored >= 0).
            val = (diff * jax.nn.relu(lin)).sum(axis=-1)   # (B,H,W)
            total = total + val.mean(axis=(1, 2))          # spatial average
        return total                                        # (B,)

    def __call__(self, in0: Array, in1: Array) -> Array:
        return self.dist_from_features(self.features(in0),
                                       self.features(in1))


def _load_lin_weights(net: str) -> Dict[str, np.ndarray]:
    data = np.load(os.path.join(_WEIGHTS_DIR, f"lpips_lin_{net}.npz"))
    return {k: data[k] for k in data.files}


def _find_backbone(net: str) -> Optional[str]:
    wdir = os.environ.get("V2V_WEIGHTS_DIR", "pretrained")
    path = os.path.join(wdir, _BACKBONE_FILES[net])
    return path if os.path.exists(path) else None


def _torch_backbone_params(net: str, path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Convert a torchvision alexnet/vgg16/squeezenet1_1 state_dict to
    flax trunk params."""
    import torch
    sd = torch.load(path, map_location="cpu")

    def conv(key):
        w = sd[f"{key}.weight"].numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
        return {"kernel": w, "bias": sd[f"{key}.bias"].numpy()}

    if net == "squeeze":
        out: Dict[str, Dict[str, np.ndarray]] = {"conv0": conv("features.0")}
        for i in _SQUEEZE_FIRES:
            out[f"fire{i}"] = {
                name: conv(f"features.{i}.{name}")
                for name in ("squeeze", "expand1x1", "expand3x3")}
        return out
    # alexnet/vgg16 keys: features.{i}.weight/.bias with i the
    # nn.Sequential index; collect convs in order.
    idxs = sorted({int(k.split(".")[1]) for k in sd if k.startswith("features")
                   and k.endswith("weight")})
    return {f"conv{n}": conv(f"features.{i}") for n, i in enumerate(idxs)}


_warned = set()


class LPIPS:
    """Stateless callable LPIPS distance with frozen params.

    dist = LPIPS(net="alex")
    d = dist(pred, target, normalize=True)   # (B,) for NHWC inputs
    """

    def __init__(self, net: str = "alex",
                 torch_backbone_path: Optional[str] = None):
        self.net = net
        self.module = LPIPSModule(net=net)
        backbone = torch_backbone_path or _find_backbone(net)
        dummy = jnp.zeros((1, 64, 64, 3))
        params = self.module.init(jax.random.PRNGKey(7), dummy, dummy)
        params = jax.tree.map(np.asarray, params)
        if backbone is not None:
            params["params"]["features"] = jax.tree.map(
                np.asarray, _torch_backbone_params(net, backbone))
        elif net not in _warned:
            _warned.add(net)
            warnings.warn(
                f"LPIPS({net}): no pretrained backbone found (set "
                f"V2V_WEIGHTS_DIR or pass torch_backbone_path for "
                f"{_BACKBONE_FILES[net]}); using fixed random features — "
                f"NOT comparable to published LPIPS numbers.")
        for k, v in _load_lin_weights(net).items():
            params["params"][k] = v
        self.params = jax.tree.map(jnp.asarray, params)
        self._jitted = jax.jit(self._dist, static_argnums=(2, 3))

    def _prep(self, x: Array, normalize: bool, compute_dtype=None) -> Array:
        if normalize:   # [0,1] -> [-1,1] (reference PerceptualLoss norm)
            x = 2.0 * x - 1.0
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        # small-input guard: AlexNet's pools need >= ~64px (tiny inputs
        # produce empty feature maps -> nan); upsample, off the
        # reference's benchmark path (all test sets are >= 180p)
        b, h, w, c = x.shape
        if h < 64 or w < 64:
            x = jax.image.resize(x, (b, max(h, 64), max(w, 64), c),
                                 "bilinear")
        if compute_dtype is not None:
            x = x.astype(jnp.dtype(compute_dtype))
        return x

    def _params(self, compute_dtype=None):
        if compute_dtype is None:
            return self.params
        dt = jnp.dtype(compute_dtype)
        return jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, self.params)

    def _dist(self, in0: Array, in1: Array, normalize: bool,
              compute_dtype=None) -> Array:
        in0 = self._prep(in0, normalize, compute_dtype)
        in1 = self._prep(in1, normalize, compute_dtype)
        return self.module.apply(self._params(compute_dtype), in0,
                                 in1).astype(jnp.float32)

    def _features(self, x: Array, normalize: bool,
                  compute_dtype=None) -> List[Array]:
        """Unit-normalized tap features of prepared input (see
        LPIPSModule.features); pair with _dist_from_feats."""
        x = self._prep(x, normalize, compute_dtype)
        return self.module.apply(self._params(compute_dtype), x,
                                 method=LPIPSModule.features)

    def _dist_from_feats(self, f0: List[Array], f1: List[Array],
                         compute_dtype=None) -> Array:
        return self.module.apply(
            self._params(compute_dtype), f0, f1,
            method=LPIPSModule.dist_from_features).astype(jnp.float32)

    def __call__(self, in0: Array, in1: Array, normalize: bool = True) -> Array:
        return self._jitted(in0, in1, normalize)


@functools.lru_cache(maxsize=4)
def get_lpips(net: str = "alex") -> LPIPS:
    return LPIPS(net=net)
