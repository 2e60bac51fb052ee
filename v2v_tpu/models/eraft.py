"""ERAFT: RAFT for events (reference model/eraft/*).

Two BasicEncoders (instance/batch norm), all-pairs 4-level correlation
volume with 9x9 bilinear pyramid lookup, SepConvGRU update block iterated
12 times, convex 8x upsampling, and the warm-start carry (previous
low-res flow forward-splatted to its advected positions,
model/eraft/image_utils.py:53-84).

TPU design notes:
  * The all-pairs correlation is one einsum -> MXU
    (replaces alt_cuda_corr, model/eraft/corr.py:5-9).
  * The 12 update iterations run under lax.scan (single compiled body).
  * The pyramid lookup runs as separable tent-weight matmuls on the MXU
    (no gathers; see lookup_pyramid — 49x faster than the gather form).
  * Left/top zero padding to x32 mirrors ImagePadder
    (image_utils.py:85-120).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """torch InstanceNorm2d(affine=False, track_running_stats=False)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


# Torch-exact BatchNorm (stored stats at eval; live batch statistics +
# running-stat updates when train=True and 'batch_stats' is mutable —
# the reference trains cnet BN live, train.py:72 / eraft.py:44).
# `FrozenBatchNorm` name kept for training/raft.py (always-eval teacher).
from .submodules import TorchBatchNorm as FrozenBatchNorm


def _norm(norm_fn: str, features: int, name: str, train: bool = False):
    if norm_fn == "batch":
        bn = FrozenBatchNorm(features, name=name)
        return lambda x: bn(x, use_running_average=not train)
    if norm_fn == "instance":
        return lambda x: instance_norm(x)
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(norm_fn)


class RaftResidualBlock(nn.Module):
    """(model/eraft/extractor.py:7-57)"""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), name="conv1")(x)
        n1 = _norm(self.norm_fn, self.planes, "norm1", train)
        y = nn.relu(n1(y))
        y = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(y)
        n2 = _norm(self.norm_fn, self.planes, "norm2", train)
        y = nn.relu(n2(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1),
                        strides=(self.stride, self.stride),
                        name="downsample_0")(x)
            n3 = _norm(self.norm_fn, self.planes, "norm3", train)
            x = n3(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """(model/eraft/extractor.py:119-189)"""
    output_dim: int = 256
    norm_fn: str = "instance"
    n_first_channels: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    name="conv1")(x)
        n1 = _norm(self.norm_fn, 64, "norm1", train)
        x = nn.relu(n1(x))
        for li, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)],
                                           start=1):
            x = RaftResidualBlock(dim, self.norm_fn, stride,
                                  name=f"layer{li}_0")(x, train=train)
            x = RaftResidualBlock(dim, self.norm_fn, 1,
                                  name=f"layer{li}_1")(x, train=train)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


def correlation_pyramid(fmap1: Array, fmap2: Array,
                        num_levels: int = 4) -> List[Array]:
    """All-pairs correlation + avg-pooled pyramid
    (model/eraft/corr.py:12-27). fmaps (B,H,W,C)."""
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2,
                      preferred_element_type=jnp.float32) / np.sqrt(c)
    # accumulate f32, STORE in the compute dtype: an f32 pyramid would
    # re-promote the lookup -> motion encoder -> GRU chain to f32 under
    # bf16 training (the dtype-census finding in docs/PERF.md)
    corr = corr.astype(fmap1.dtype).reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        bb, hh, ww, _ = corr.shape
        if hh >= 2 and ww >= 2:
            # torch avg_pool2d(2,2) floors odd dims: drop trailing row/col
            corr = corr[:, : hh // 2 * 2, : ww // 2 * 2]
            corr = corr.reshape(bb, hh // 2, 2, ww // 2, 2, 1).mean(axis=(2, 4))
        pyramid.append(corr)
    return pyramid


def _bilinear_gather(img: Array, gx: Array, gy: Array) -> Array:
    """img (N,H,W,1), gx/gy (N,K): bilinear sample with zero padding.

    Reference implementation (gather-based) kept as the semantics oracle
    for lookup_pyramid's matmul formulation — see
    tests/test_advanced_models.py::test_lookup_pyramid_matmul_matches_gather."""
    n, h, w, _ = img.shape
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = img.reshape(n, h * w)

    def gather(yi, xi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        return jnp.take_along_axis(flat, idx, axis=1) * inb

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    return ((v00 * (1 - tx) + v01 * tx) * (1 - ty)
            + (v10 * (1 - tx) + v11 * tx) * ty)


def lookup_pyramid(pyramid: List[Array], coords: Array,
                   radius: int = 4) -> Array:
    """9x9 bilinear lookup around coords at each level
    (model/eraft/corr.py:29-50). coords (B,H,W,2) pixel units at level 0.
    Returns (B,H,W,num_levels*(2r+1)^2).

    TPU formulation: gathers are serialization-bound on TPU, so the
    window lookup is recast as two tiny batched matmuls. Bilinear
    sampling is separable: with tent weights
    Wy[q,j,s] = max(0, 1 - |cy[q] + d[j] - s|) (and Wx likewise),

        out[q, j, i] = sum_{s,t} Wy[q,j,s] * plane[q,s,t] * Wx[q,i,t]

    reproduces grid_sample's zero padding exactly (out-of-range samples
    collect zero total weight; a sample at an integer grid point gets
    weight 1). Each level is then einsum('qst,qjs->qjt') followed by
    einsum('qjt,qit->qji') — MXU work instead of 4*(2r+1)^2 scalar
    gathers per query pixel (~45x faster at ERAFT production sizes).

    Parity quirk kept from the reference (model/eraft/corr.py:37-43):
    delta = stack(meshgrid(dy, dx)) is added to (x, y) coords, so the x
    offset walks the ROW index and the y offset the COLUMN index of the
    window (hence the final transpose). The channel order feeds convc1,
    so conversion fidelity requires reproducing it exactly."""
    b, h, w, _ = coords.shape
    r = radius
    k = 2 * r + 1                                   # window side
    q = b * h * w
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    flat = coords.reshape(q, 2)
    out = []
    for i, corr in enumerate(pyramid):
        plane = corr[..., 0]                        # (q, hi, wi)
        _, hi, wi = plane.shape
        cx = (flat[:, 0] / (2 ** i))[:, None, None] # (q,1,1)
        cy = (flat[:, 1] / (2 ** i))[:, None, None]
        sy = cy + d[None, :, None]                  # (q,k,1) sample rows
        sx = cx + d[None, :, None]
        gy = jnp.arange(hi, dtype=jnp.float32)[None, None, :]
        gx = jnp.arange(wi, dtype=jnp.float32)[None, None, :]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - gy))   # (q,k,hi)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - gx))   # (q,k,wi)
        dt = plane.dtype
        tmp = jnp.einsum("qst,qjs->qjt", plane, wy.astype(dt))
        v = jnp.einsum("qjt,qit->qji", tmp, wx.astype(dt))
        vals = v.transpose(0, 2, 1).reshape(q, k * k)   # [i*k+j] quirk
        out.append(vals.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)


class BasicMotionEncoder(nn.Module):
    """(model/eraft/update.py:63-81)"""
    corr_planes: int = 4 * 81

    @nn.compact
    def __call__(self, flow: Array, corr: Array) -> Array:
        cor = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        cor = nn.relu(nn.Conv(192, (3, 3), padding=((1, 1), (1, 1)),
                              name="convc2")(cor))
        flo = nn.relu(nn.Conv(128, (7, 7), padding=((3, 3), (3, 3)),
                              name="convf1")(flow))
        flo = nn.relu(nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)),
                              name="convf2")(flo))
        out = nn.relu(nn.Conv(126, (3, 3), padding=((1, 1), (1, 1)),
                              name="conv")(jnp.concatenate([cor, flo], -1)))
        return jnp.concatenate([out, flow], axis=-1)


class SepConvGRU(nn.Module):
    """(model/eraft/update.py:33-60)"""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h: Array, x: Array) -> Array:
        d = self.hidden_dim
        for suffix, k, pad in (("1", (1, 5), ((0, 0), (2, 2))),
                               ("2", (5, 1), ((2, 2), (0, 0)))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(d, k, padding=pad,
                                   name=f"convz{suffix}")(hx))
            r = nn.sigmoid(nn.Conv(d, k, padding=pad,
                                   name=f"convr{suffix}")(hx))
            q = jnp.tanh(nn.Conv(d, k, padding=pad, name=f"convq{suffix}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    """(model/eraft/update.py:6-14)"""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                            name="conv1")(x))
        return nn.Conv(2, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv2")(y)


class BasicUpdateBlock(nn.Module):
    """(model/eraft/update.py:84-106)"""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, net: Array, inp: Array, corr: Array, flow: Array):
        motion = BasicMotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="gru")(net, x)
        delta_flow = FlowHead(name="flow_head")(net)
        m = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                            name="mask_0")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), name="mask_2")(m)
        return net, mask, delta_flow


def convex_upsample(flow: Array, mask: Array) -> Array:
    """Convex combination 8x upsampling (model/eraft/eraft.py:66-77).
    flow (B,H,W,2), mask (B,H,W,64*9) -> (B,8H,8W,2)."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)           # torch view(N,1,9,8,8,H,W)
    mask = jax.nn.softmax(mask, axis=3)
    f8 = 8.0 * flow
    fp = jnp.pad(f8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood in torch-unfold order (row-major)
    neigh = jnp.stack([fp[:, i:i + h, j:j + w, :]
                       for i in range(3) for j in range(3)],
                      axis=3)                        # (B,H,W,9,2)
    up = jnp.einsum("bhwkij,bhwkc->bhwijc", mask, neigh)
    # (B,H,W,8,8,2) -> (B,8H,8W,2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


def forward_interpolate_scatter(flow: Array) -> Array:
    """Forward-splat the flow to its advected positions (warm start,
    model/eraft/image_utils.py:10-84). flow (B,H,W,2).

    Gather/scatter reference form, kept as the semantics oracle for the
    matmul formulation below (scatter-adds serialize on TPU)."""
    b, h, w, _ = flow.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x1 = (xs + flow[..., 0]).reshape(b, -1)
    y1 = (ys + flow[..., 1]).reshape(b, -1)
    vals = flow.reshape(b, -1, 2)

    def splat(x1b, y1b, vb):
        acc = jnp.zeros((h * w, 2))
        wacc = jnp.zeros((h * w,))
        for fx in (jnp.floor(x1b), jnp.ceil(x1b)):
            for fy in (jnp.floor(y1b), jnp.ceil(y1b)):
                inb = (fx >= 0) & (fx < w) & (fy >= 0) & (fy < h)
                weight = (1 - jnp.abs(x1b - fx)) * (1 - jnp.abs(y1b - fy))
                idx = (fx + w * fy).astype(jnp.int32)
                idx = jnp.where(inb, idx, h * w)     # drop OOB
                acc = acc.at[idx].add(vb * (weight * inb)[:, None],
                                      mode="drop")
                wacc = wacc.at[idx].add(weight * inb, mode="drop")
        return (acc / (wacc[:, None] + 1e-15)).reshape(h, w, 2)

    return jax.vmap(splat)(x1, y1, vals)


def forward_interpolate(flow: Array) -> Array:
    """Forward-splat via separable tent-weight contractions — no
    scatters (they serialize on TPU; this runs once per pair in the
    warm-start train scan and once per frame in streaming eval).

    Same identity as lookup_pyramid, transposed to scatter: each source
    pixel q at advected position (x1, y1) deposits value*weight onto the
    4 corner cells, so acc[s,t] = sum_q wy[q,s]*wx[q,t]*v[q] with tent
    weights wy[q,s] = max(0, 1-|y1[q]-s|) — two batched matmul
    contractions. Out-of-range sources collect zero weight (== the
    scatter's in-bounds mask). Integer-coordinate sources land on a
    floor==ceil corner, which the scatter form counts twice in both
    numerator and denominator; the ratio is identical."""
    b, h, w, _ = flow.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x1 = (xs + flow[..., 0]).reshape(b, -1)          # (b, q)
    y1 = (ys + flow[..., 1]).reshape(b, -1)
    vals = flow.reshape(b, -1, 2)
    gy = jnp.arange(h, dtype=jnp.float32)
    gx = jnp.arange(w, dtype=jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(y1[..., None] - gy))   # (b,q,h)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(x1[..., None] - gx))   # (b,q,w)
    # widen vals with a ones channel so [wacc | acc] is one contraction
    ones = jnp.ones_like(vals[..., :1])
    out = jnp.einsum("bqs,bqt,bqc->bstc", wy, wx,
                     jnp.concatenate([ones, vals], axis=-1))
    return out[..., 1:] / (out[..., :1] + 1e-15)


def _pad32(x: Array) -> Tuple[Array, Tuple[int, int]]:
    """Left/top zero pad to x32 (ImagePadder semantics)."""
    h, w = x.shape[1:3]
    ph = (32 - h % 32) % 32
    pw = (32 - w % 32) % 32
    return jnp.pad(x, ((0, 0), (ph, 0), (pw, 0), (0, 0))), (ph, pw)


class ERAFT(nn.Module):
    """Reference target `model.eraft.eraft.ERAFT`
    (config: {'subtype': 'standard'|'warm_start'}, n_first_channels).
    State = previous low-res flow splat (B, Hp/8, Wp/8, 2) at the padded
    resolution; `init_state` returns zeros (== flow_init None).

    setup-style so the fnet feature encoding is independently callable
    (method=ERAFT.encode): in the train scan each voxel is `curr` of one
    pair and `prev` of the next, so encoding once per voxel outside the
    rematted pair step halves the fnet cost (fnet carries most of the
    forward FLOPs). The param tree is identical to the fused __call__."""
    config: Dict[str, Any]
    n_first_channels: int = 5
    iters: int = 12

    def setup(self):
        hdim = cdim = 128
        self.fnet = BasicEncoder(256, "instance", self.n_first_channels,
                                 name="fnet")
        self.cnet = BasicEncoder(hdim + cdim, "batch",
                                 self.n_first_channels, name="cnet")
        self.update_block = BasicUpdateBlock(hdim, name="update_block")

    def encode(self, voxel: Array) -> Array:
        """fnet features of one (unpadded) voxel: (B,H,W,bins) ->
        (B,Hp/8,Wp/8,256). Pure per-sample (instance norm), so batching
        it over time steps is numerically identical to the per-pair
        encoding in __call__."""
        img, _ = _pad32(voxel)
        return self.fnet(img)

    def step_with_fmaps(self, fmap1: Array, fmap2: Array, voxel2: Array,
                        state: Array, train: bool = False):
        """One refinement step from precomputed fnet features (the
        remainder of __call__: correlation pyramid, cnet context of
        voxel2, iterative updates, convex upsample, warm-start splat)."""
        subtype = self.config["subtype"].lower()
        assert subtype in ("standard", "warm_start"), subtype  # eraft.py:102-105
        hdim = 128
        img2, (ph, pw) = _pad32(voxel2)
        pyramid = correlation_pyramid(fmap1, fmap2)

        # cnet BN stays per-pair: live batch statistics are computed per
        # sequential call, matching the reference's pair-by-pair training
        cnet = self.cnet(img2, train=train)
        net, inp = jnp.split(cnet, [hdim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        b, h8, w8, _ = fmap1.shape
        xs = jnp.arange(w8, dtype=jnp.float32)[None, None, :]
        ys = jnp.arange(h8, dtype=jnp.float32)[None, :, None]
        coords0 = jnp.stack([jnp.broadcast_to(xs, (b, h8, w8)),
                             jnp.broadcast_to(ys, (b, h8, w8))], axis=-1)
        # the reference adds flow_init unconditionally whenever set and
        # stores it after EVERY call regardless of subtype
        # (eraft.py:113-114,141-146) — the zero init_state == None
        coords1 = coords0 + state

        # refinement iterations (python loop: flax params shared across
        # calls; only the final iteration's mask/upsample is used,
        # reference keeps flow_list[-1], eraft.py:141-146)
        up_mask = None
        for _ in range(self.iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = lookup_pyramid(pyramid, coords1)
            # coords stay f32 (positional accuracy over 12 iterations);
            # the GRU input flow drops to the compute dtype so one f32
            # operand cannot promote the whole update block
            flow = (coords1 - coords0).astype(net.dtype)
            net, up_mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
        flow_low = coords1 - coords0
        flow_up = convex_upsample(flow_low, up_mask)
        # unpad (left/top)
        flow_up = flow_up[:, ph:, pw:, :]
        new_state = forward_interpolate(jax.lax.stop_gradient(flow_low))
        return {"flow": flow_up}, new_state

    def __call__(self, voxel1: Array, voxel2: Array, state: Array,
                 train: bool = False):
        img1, _ = _pad32(voxel1)
        img2, _ = _pad32(voxel2)
        both = jnp.concatenate([img1, img2], axis=0)   # batched trunk call
        fmaps = self.fnet(both)
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        return self.step_with_fmaps(fmap1, fmap2, voxel2, state,
                                    train=train)

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32) -> Array:
        ph = -(-height // 32) * 32
        pw = -(-width // 32) * 32
        return jnp.zeros((batch, ph // 8, pw // 8, 2), dtype)
