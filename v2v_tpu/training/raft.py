"""RAFT teacher for pseudo ground-truth optical flow.

The reference uses torchvision's pretrained raft_small / raft_large to
supervise the temporal-consistency loss and flow training
(model/train_utils.py:21-79, used at :285-301). This module is a Flax
port of torchvision's RAFT with a state_dict converter; the pretrained
checkpoints (FlyingChairs/Things) must be provided by the user
(`$V2V_WEIGHTS_DIR/raft_{small,large}.pth`, saved via
`torch.save(raft_large(pretrained=True).state_dict(), ...)` on a
machine with network access).

The layer-name mapping follows torchvision 0.15+ module structure
(feature_encoder.convnormrelu.0 etc.). It is pinned offline by
tests/test_teacher_converters.py: a torch twin with torchvision's exact
module tree must convert with a strict bidirectional key/shape match AND
reproduce the flax forward numerically. scripts/validate_raft.py repeats
the check end-to-end with genuine pretrained weights when available.

The correlation/lookup/GRU machinery is shared with ERAFT
(v2v_tpu/models/eraft.py) — RAFT on TPU is one einsum correlation
volume plus scanned GRU refinements.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.eraft import (FrozenBatchNorm, convex_upsample,
                            correlation_pyramid, instance_norm,
                            lookup_pyramid)
from ..ops.pad import pad_to_multiple

Array = jax.Array


def _norm(kind: Optional[str], features: int, name: str):
    if kind == "batch":
        return FrozenBatchNorm(features, name=name)
    if kind == "instance":
        return lambda x: instance_norm(x)
    return lambda x: x


class ConvNormAct(nn.Module):
    """torchvision Conv2dNormActivation: children '0' conv, '1' norm.
    The conv has a bias only when there is no norm layer (torchvision
    Conv2dNormActivation: `bias = norm_layer is None`; InstanceNorm2d is
    affine=False there, so it contributes no state-dict entries but
    still suppresses the conv bias)."""
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    norm: Optional[str] = "instance"
    act: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel
        x = nn.Conv(self.features, self.kernel,
                    strides=(self.stride, self.stride),
                    padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                    use_bias=self.norm is None,
                    name="0")(x)
        n = _norm(self.norm, self.features, "1")
        x = n(x)
        return nn.relu(x) if self.act else x


class TVResidualBlock(nn.Module):
    """torchvision raft ResidualBlock. The torch `downsample` is a
    Conv2dNormActivation; its children are named downsample_0/_1 here so
    the converter's ModuleList rule (`downsample.0` -> `downsample_0`,
    shared with ERAFT's nn.Sequential downsample) lands on them."""
    features: int
    norm: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = ConvNormAct(self.features, (3, 3), self.stride, self.norm,
                        name="convnormrelu1")(x)
        y = ConvNormAct(self.features, (3, 3), 1, self.norm,
                        name="convnormrelu2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride),
                        use_bias=self.norm is None,
                        name="downsample_0")(x)
            x = _norm(self.norm, self.features, "downsample_1")(x)
        return nn.relu(x + y)


class TVBottleneckBlock(nn.Module):
    """torchvision raft BottleneckBlock (raft_small); downsample naming
    as in TVResidualBlock."""
    features: int
    norm: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        q = self.features // 4
        y = ConvNormAct(q, (1, 1), 1, self.norm, name="convnormrelu1")(x)
        y = ConvNormAct(q, (3, 3), self.stride, self.norm,
                        name="convnormrelu2")(y)
        y = ConvNormAct(self.features, (1, 1), 1, self.norm,
                        name="convnormrelu3")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride, self.stride),
                        use_bias=self.norm is None,
                        name="downsample_0")(x)
            x = _norm(self.norm, self.features, "downsample_1")(x)
        return nn.relu(x + y)


class TVFeatureEncoder(nn.Module):
    layers: Tuple[int, ...] = (64, 64, 96, 128, 256)
    norm: str = "instance"
    bottleneck: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        block = TVBottleneckBlock if self.bottleneck else TVResidualBlock
        x = ConvNormAct(self.layers[0], (7, 7), 2, self.norm,
                        name="convnormrelu")(x)
        for li, feat in enumerate(self.layers[1:4], start=1):
            stride = 1 if li == 1 else 2
            x = block(feat, self.norm, stride, name=f"layer{li}_0")(x)
            x = block(feat, self.norm, 1, name=f"layer{li}_1")(x)
        return nn.Conv(self.layers[4], (1, 1), name="conv")(x)


class TVMotionEncoder(nn.Module):
    corr_layers: Tuple[int, ...] = (256, 192)
    flow_layers: Tuple[int, int] = (128, 64)
    out_channels: int = 128

    @nn.compact
    def __call__(self, flow: Array, corr: Array) -> Array:
        c = ConvNormAct(self.corr_layers[0], (1, 1), norm=None,
                        name="convcorr1")(corr)
        if len(self.corr_layers) > 1:
            c = ConvNormAct(self.corr_layers[1], (3, 3), norm=None,
                            name="convcorr2")(c)
        f = ConvNormAct(self.flow_layers[0], (7, 7), norm=None,
                        name="convflow1")(flow)
        f = ConvNormAct(self.flow_layers[1], (3, 3), norm=None,
                        name="convflow2")(f)
        x = ConvNormAct(self.out_channels - 2, (3, 3), norm=None,
                        name="conv")(jnp.concatenate([c, f], axis=-1))
        return jnp.concatenate([x, flow], axis=-1)


class TVConvGRU(nn.Module):
    """torchvision raft ConvGRU (children convz/convr/convq)."""
    hidden: int
    kernel: Tuple[int, int]

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        kh, kw = self.kernel
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(nn.Conv(self.hidden, self.kernel, padding=pad,
                               name="convz")(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, self.kernel, padding=pad,
                               name="convr")(hx))
        q = jnp.tanh(nn.Conv(self.hidden, self.kernel, padding=pad,
                             name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class TVRecurrentBlock(nn.Module):
    hidden: int = 128
    kernels: Tuple[Tuple[int, int], ...] = ((1, 5), (5, 1))

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        for gi, k in enumerate(self.kernels, start=1):
            h = TVConvGRU(self.hidden, k, name=f"convgru{gi}")(h, x)
        return h


class TVFlowHead(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.relu(nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                            name="conv1")(x))
        return nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv2")(y)


class TVUpdateBlock(nn.Module):
    """torchvision raft UpdateBlock: motion_encoder + recurrent_block +
    flow_head as real child scopes (torch keys
    `update_block.motion_encoder.convcorr1.0.weight` etc.)."""
    small: bool = False

    @nn.compact
    def __call__(self, net: Array, inp: Array, flow: Array,
                 corr: Array) -> Tuple[Array, Array]:
        if self.small:
            motion = TVMotionEncoder((96,), (64, 32), 82,
                                     name="motion_encoder")
            recurrent = TVRecurrentBlock(96, ((3, 3),),
                                         name="recurrent_block")
            flow_head = TVFlowHead(128, name="flow_head")
        else:
            motion = TVMotionEncoder((256, 192), (128, 64), 128,
                                     name="motion_encoder")
            recurrent = TVRecurrentBlock(128, name="recurrent_block")
            flow_head = TVFlowHead(256, name="flow_head")
        m = motion(flow, corr)
        net = recurrent(net, jnp.concatenate([inp, m], axis=-1))
        return net, flow_head(net)


class TVMaskPredictor(nn.Module):
    """torchvision raft MaskPredictor (raft_large convex upsampling)."""

    @nn.compact
    def __call__(self, net: Array) -> Array:
        y = ConvNormAct(256, (3, 3), norm=None, name="convrelu")(net)
        # torchvision multiplies by 0.25 inside the predictor
        return 0.25 * nn.Conv(64 * 9, (1, 1), name="conv")(y)


def _upsample_align_corners(x: Array, factor: int) -> Array:
    """Bilinear upsample with torch align_corners=True semantics
    (output i samples input at i*(n_in-1)/(n_out-1)), as two tent-weight
    matmuls (separable; MXU-friendly, no gathers)."""
    b, h, w, c = x.shape
    hh, ww = factor * h, factor * w

    def mat(n_in, n_out):
        pos = (jnp.arange(n_out, dtype=jnp.float32)
               * (n_in - 1) / max(n_out - 1, 1))
        grid = jnp.arange(n_in, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, None] - grid[None, :]))

    return jnp.einsum("Hh,bhwc,Ww->bHWc", mat(h, hh), x, mat(w, ww))


def _pad8(x: Array) -> Array:
    """Bottom/right zero-pad to x8 (torchvision pads this way, unlike
    ERAFT's top/left ImagePadder)."""
    return pad_to_multiple(x, 8)[0]


class RAFT(nn.Module):
    """torchvision-compatible RAFT. 3-channel images in [-1, 1].

    setup-style so the feature encoder is independently callable
    (method=RAFT.encode): raft_flow supervises CONSECUTIVE frame pairs,
    so each interior frame is image1 of one pair and image2 of the next
    — encoding unique frames once (exact: instance norm is per-sample)
    saves ~half the feature-encoder work. Attribute names match the
    pinned torchvision converter tree (feature_encoder /
    context_encoder / update_block / mask_predictor)."""
    small: bool = False
    iters: int = 12

    def setup(self):
        feat_layers = ((32, 32, 64, 96, 128) if self.small
                       else (64, 64, 96, 128, 256))
        ctx_layers = ((32, 32, 64, 96, 160) if self.small
                      else (64, 64, 96, 128, 256))
        self.feature_encoder = TVFeatureEncoder(
            feat_layers, "instance", self.small)
        # torchvision: context norm is BatchNorm2d for raft_large, None
        # for raft_small (original RAFT SmallEncoder norm_fn='none')
        self.context_encoder = TVFeatureEncoder(
            ctx_layers, None if self.small else "batch", self.small)
        self.update_block = TVUpdateBlock(self.small)
        if not self.small:
            self.mask_predictor = TVMaskPredictor()

    def encode(self, images: Array) -> Array:
        """feature_encoder of [-1,1] images: (N,H,W,3) ->
        (N,Hp/8,Wp/8,D). Per-sample (instance norm / frozen BN), so
        batching frames across time is numerically identical to the
        per-pair encoding in __call__."""
        return self.feature_encoder(_pad8(images))

    def flow_from_fmaps(self, fmap1: Array, fmap2: Array,
                        image1: Array) -> Array:
        """The remainder of __call__ from precomputed feature maps:
        correlation pyramid, context of image1 (unpadded), iterative
        updates, upsample, crop back to image1's resolution."""
        hdim = 96 if self.small else 128
        radius = 3 if self.small else 4

        h, w = image1.shape[1:3]
        image1 = _pad8(image1)
        pyramid = correlation_pyramid(fmap1, fmap2)

        cnet = self.context_encoder(image1)
        net, inp = jnp.split(cnet, [hdim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        hb, h8, w8, _ = fmap1.shape
        xs = jnp.arange(w8, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(h8, dtype=jnp.float32)[None, :, None]
        coords0 = jnp.stack([jnp.broadcast_to(xs, (hb, h8, w8)),
                             jnp.broadcast_to(ys, (hb, h8, w8))], axis=-1)
        coords1 = coords0

        up_mask = None
        for _ in range(self.iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = lookup_pyramid(pyramid, coords1, radius=radius)
            # coords stay f32; the GRU input drops to the compute dtype
            # (same dtype hygiene as ERAFT.step_with_fmaps)
            flow = (coords1 - coords0).astype(net.dtype)
            net, delta = self.update_block(net, inp, flow, corr)
            coords1 = coords1 + delta
            if not self.small:
                up_mask = self.mask_predictor(net)

        flow_low = coords1 - coords0
        if self.small:
            # torchvision upsample_flow(mask=None): F.interpolate(...,
            # align_corners=True) — NOT the half-pixel convention of
            # jax.image.resize; exact via separable tent-weight matmuls.
            flow_up = 8.0 * _upsample_align_corners(flow_low, 8)
        else:
            flow_up = convex_upsample(flow_low, up_mask)
        return flow_up[:, :h, :w, :]

    def __call__(self, image1: Array, image2: Array) -> Array:
        fmaps = self.encode(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        return self.flow_from_fmaps(fmap1, fmap2, image1)


_BACKBONES = {"raft_small": "raft_small.pth", "raft_large": "raft_large.pth"}
_cache: Dict[Tuple[str, int], Tuple[RAFT, Any]] = {}


def seed_random_teacher(source: str, num_flow_updates: int = 12,
                        seed: int = 42) -> None:
    """Install a randomly initialized teacher in the raft_flow cache
    (benchmarks/smoke tests: identical compute and memory to pretrained
    weights, no .pth needed). Keyed exactly like raft_flow's lookup so a
    cache-key change cannot silently break the harnesses again."""
    model = RAFT(small=source == "raft_small", iters=num_flow_updates)
    dummy = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(seed), dummy, dummy)
    _cache[(source, num_flow_updates)] = (model, params)


def warm_teacher(source: str, num_flow_updates: int = 12) -> None:
    """Eagerly fill the raft_flow cache OUTSIDE any jit trace.

    raft_flow's lazy _load_params would otherwise run during the train
    step's first trace; flax `init`'s inner jit then yields TRACER
    params which get cached and leak into any LATER trace
    (UnexpectedTracerError on the first post-resume step — found by the
    round-3 on-chip soak's phase 2, where resume re-traces the step in
    a process whose cache was filled by that same trace's predecessor).
    make_train_step calls this before jitting; the CLAUDE.md invariant:
    heavy host objects are constructed eagerly, never inside a trace."""
    cache_key = (source, num_flow_updates)
    if cache_key in _cache:
        return
    model = RAFT(small=source == "raft_small", iters=num_flow_updates)
    _cache[cache_key] = (model, _load_params(source, model))


def _load_params(name: str, model: RAFT):
    import jax
    wdir = os.environ.get("V2V_WEIGHTS_DIR", "pretrained")
    path = os.path.join(wdir, _BACKBONES[name])
    dummy = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    if not os.path.exists(path):
        # "0"/"false" opt OUT (any-nonempty-is-true made the flag
        # impossible to disable once set — advisor round-4 finding)
        if os.environ.get("V2V_RANDOM_TEACHER", "").lower() not in (
                "", "0", "false", "no"):
            # loud dev-environment fallback (same pattern as the LPIPS
            # random-feature fallback, losses/lpips.py): identical
            # compute/memory to the pretrained teacher, but the flow
            # targets are meaningless — loss values are self-consistent
            # only. Soak/benchmark use; never for quality numbers.
            import warnings
            warnings.warn(
                f"V2V_RANDOM_TEACHER=1: no weights at {path}; using a "
                f"RANDOMLY INITIALIZED {name} teacher — training losses "
                f"are not comparable to published numbers")
            return params
        raise FileNotFoundError(
            f"RAFT teacher weights not found at {path}; save torchvision's "
            f"{name}(pretrained=True).state_dict() there, set "
            f"V2V_RANDOM_TEACHER=1 (dev), or use "
            f"optical_flow_source: zeros|gt")
    from ..models.convert import torch_state_dict_to_flax, validate_against
    import torch
    sd = torch.load(path, map_location="cpu")
    converted = torch_state_dict_to_flax(sd)
    return validate_against(params, converted, strict=False)


def raft_flow(source: str, frames: Array, l0: int = 1,
              num_flow_updates: int = 12,
              compute_dtype=jnp.bfloat16) -> Array:
    """Pseudo-GT flow for a frame sequence (inference_raft,
    model/train_utils.py:55-79): frames (B,T,H,W,C) in [0,1] ->
    flow (B,T,H,W,2) with zeros for t < l0.

    Runs the teacher in bf16 by default: it is inference-only pseudo-GT
    (no gradients flow through it, steps.py calls it outside loss_fn) and
    it dominates the train step otherwise. Pass compute_dtype=None for
    f32."""
    cache_key = (source, num_flow_updates)
    if cache_key not in _cache:
        model = RAFT(small=source == "raft_small", iters=num_flow_updates)
        _cache[cache_key] = (model, _load_params(source, model))
    model, params = _cache[cache_key]
    b, t, h, w, c = frames.shape
    if t <= l0:
        raise ValueError(
            f"raft_flow: sequence has {t} frames but temporal_consistency_"
            f"L0={l0}; need at least L0+1 frames to form a flow pair")
    # consecutive pairs share interior frames: encode each of the
    # t-l0+1 unique frames once (exact — see RAFT.encode), then pair up
    n = t - l0 + 1
    imgs = frames[:, l0 - 1:].reshape((-1, h, w, c)) * 2 - 1
    if c == 1:
        imgs = jnp.repeat(imgs, 3, axis=-1)
    if compute_dtype is not None:
        cast = lambda x: x.astype(compute_dtype) if jnp.issubdtype(
            x.dtype, jnp.floating) else x
        imgs = cast(imgs)
        params = jax.tree.map(cast, params)
    fmaps = model.apply(params, imgs, method="encode")
    fseq = fmaps.reshape((b, n) + fmaps.shape[1:])
    fmap1 = fseq[:, :-1].reshape((-1,) + fmaps.shape[1:])
    fmap2 = fseq[:, 1:].reshape((-1,) + fmaps.shape[1:])
    img1 = imgs.reshape((b, n, h, w, -1))[:, :-1].reshape(
        (-1, h, w, imgs.shape[-1]))

    # RAFT's all-pairs correlation is QUADRATIC in the 1/8-scale token
    # count: one 720p pair costs ~0.5 GB, so batching every pair at
    # once (the 128^2 training win: teacher 5.14 s -> 0.105 s) OOMs HBM
    # at benchmark resolutions (found by the round-5 EVAID release
    # rehearsal: bf16[80,14400,14400] = 33 GB). Chunk the pair batch so
    # the live correlation stays under a budget; lax.map runs chunks
    # sequentially, and small shapes keep the single fully-batched call.
    npairs = fmap1.shape[0]
    hw8 = (h // 8) * (w // 8)
    corr_bytes = hw8 * hw8 * (4 if compute_dtype is None else 2) * 1.34
    # 1.5 GB default: the corr pyramid is only part of the live set
    # (encoder/GRU activations and lookup intermediates scale with the
    # pair chunk too — the 9-pair 720p batch measured 20.2 G used);
    # ~2 pairs at 720p, while 128^2 training stays fully batched
    # (chunk ~9k pairs)
    budget = float(os.environ.get("V2V_RAFT_CORR_BUDGET_GB",
                                  "1.5")) * 2**30
    chunk = max(1, min(npairs, int(budget / corr_bytes)))
    if chunk >= npairs:
        flow = model.apply(params, fmap1, fmap2, img1,
                           method="flow_from_fmaps")
    else:
        n_chunks = -(-npairs // chunk)
        pad = n_chunks * chunk - npairs
        pad0 = lambda x: jnp.concatenate(
            [x, jnp.repeat(x[:1], pad, axis=0)]) if pad else x
        f1c, f2c, i1c = (pad0(x).reshape((n_chunks, chunk) + x.shape[1:])
                         for x in (fmap1, fmap2, img1))
        flow = jax.lax.map(
            lambda xs: model.apply(params, xs[0], xs[1], xs[2],
                                   method="flow_from_fmaps"),
            (f1c, f2c, i1c))
        flow = flow.reshape((n_chunks * chunk,) + flow.shape[2:])[:npairs]
    flow = jax.lax.stop_gradient(flow).astype(frames.dtype)
    flow = flow.reshape(b, t - l0, h, w, 2)
    zeros = jnp.zeros((b, l0, h, w, 2), flow.dtype)
    return jnp.concatenate([zeros, flow], axis=1)
