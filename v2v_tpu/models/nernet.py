"""NerNet / NER-Net+: learned voxelization + NIAM spatio-temporal LSTM
UNet with Global Context Blocks (reference model/nernet_model.py +
model/nernet/*). Test-only in V2V (README.md:39).

Pipeline: raw events (N,5)[x,y,t,p,b] -> per-event MLP temporal kernel
(ValueLayer) scattered into +/- polarity bins (QuantizationLayer_trail)
[-> optional CNN refiner] -> UNet whose encoders are NAM ST-cells
(h/c/m streams) with GCB attention and an m-stream upsampler.

Static-shape design: events arrive padded to a bucket length with an
explicit count; the scatter is a masked .at[].add (SURVEY.md §7 hard
part 6). Resolution changes re-enter through `init_state` (the
reference rebuilds Voxelization preserving weights,
model/nernet_model.py:50-72 — here params are resolution-free).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pad import CropParameters
from .submodules import ConvLayer, ResidualBlock, UpsampleConvLayer

Array = jax.Array


class ValueLayer(nn.Module):
    """Per-event MLP temporal kernel
    (nernet/representation_modules.py:12-54)."""
    mlp_layers: Tuple[int, ...] = (1, 30, 30, 1)

    @nn.compact
    def __call__(self, t: Array) -> Array:
        x = t[..., None]
        for i, out in enumerate(self.mlp_layers[1:]):
            x = nn.Dense(out, name=f"mlp_{i}")(x)
            if i < len(self.mlp_layers) - 2:
                x = nn.leaky_relu(x, negative_slope=0.1)
        return x[..., 0]


class QuantizationLayerTrail(nn.Module):
    """Learned voxelization into +/- polarity bins
    (nernet/representation_modules.py:175-261). Single sample (B=1, the
    NerNet test contract, train_utils.py:354).

    events: (E,5) float [x,y,t,p,b] with p in {-1,1}; n_events: valid
    count. Returns (1, H, W, 2*C) — positive bins then negative
    (the reference's cat([vox[:,1], vox[:,0]]) order)."""
    num_bins: int
    height: int
    width: int
    mlp_layers: Tuple[int, ...] = (1, 30, 30, 1)
    normalize: bool = False
    # True (default): the temporal kernel is pixel-independent, so each
    # event contributes ONE (C,)-row to its (polarity, y, x) pixel — a
    # single row-scatter with C x fewer serialized indices than the
    # reference's per-bin scalar scatters (TPU scatters serialize on
    # index count). False = the reference-shaped per-bin scatter
    # (semantics oracle, representation_modules.py:175-261).
    row_scatter: bool = True

    @nn.compact
    def __call__(self, events: Array, n_events: Array) -> Array:
        c, h, w = self.num_bins, self.height, self.width
        e = events.shape[0]
        valid = jnp.arange(e) < n_events
        x = events[:, 0]
        y = events[:, 1]
        t = events[:, 2].astype(jnp.float32)
        p = (events[:, 3] + 1) / 2          # {-1,1} -> {0,1}

        t0 = t[0]
        t_last = t[jnp.maximum(n_events - 1, 0)]
        dt = t_last - t0
        if self.normalize:
            t = jnp.where(dt > 0, (t - t0) / jnp.maximum(dt, 1e-30), 0.0)
        else:
            t = jnp.where(dt > 0, (t - t0) / jnp.maximum(dt, 1e-30) * (c - 1),
                          0.0)

        value_layer = ValueLayer(self.mlp_layers, name="value_layer")
        offsets = jnp.asarray(
            [i / (c - 1) if self.normalize else float(i) for i in range(c)],
            jnp.float32)
        if self.row_scatter:
            # one MLP call over (E, C) then one scatter of (C,) rows
            t_weights = value_layer(t[:, None] - offsets[None, :])
            values = jnp.where(valid[:, None], t[:, None] * t_weights, 0.0)
            pix = (x + w * y + w * h * p).astype(jnp.int32)
            pix = jnp.clip(pix, 0, 2 * h * w - 1)
            vox2d = jnp.zeros((2 * h * w, c), jnp.float32)
            vox2d = vox2d.at[pix].add(values, mode="drop")
            vox = jnp.transpose(vox2d.reshape(2, h, w, c), (0, 3, 1, 2))
        else:
            idx_base = (x + w * y + w * h * c * p).astype(jnp.int32)
            flat = jnp.zeros((2 * c * h * w,), jnp.float32)
            for i_bin in range(c):
                t_weights = value_layer(t - offsets[i_bin])
                values = jnp.where(valid, t * t_weights, 0.0)
                idx = idx_base + w * h * i_bin
                idx = jnp.clip(idx, 0, flat.shape[0] - 1)
                flat = flat.at[idx].add(values, mode="drop")
            vox = flat.reshape(2, c, h, w)
        vox = jnp.concatenate([vox[1], vox[0]], axis=0)   # (2C,H,W)
        return jnp.transpose(vox, (1, 2, 0))[None]        # (1,H,W,2C)


class RepresentationCNN(nn.Module):
    """Optional voxel refiner (representation_modules.py:264-284)."""
    channels: int
    features: int = 64
    kernel_size: int = 3
    num_layers: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from .submodules import TorchBatchNorm
        k = self.kernel_size
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        y = nn.relu(nn.Conv(self.features, (k, k), padding=pad,
                            use_bias=False, name="cnn_0")(x))
        for i in range(self.num_layers - 2):
            y = nn.Conv(self.features, (k, k), padding=pad, use_bias=False,
                        name=f"cnn_{3 * i + 2}")(y)
            y = TorchBatchNorm(self.features, name=f"cnn_{3 * i + 3}")(y)
            y = nn.relu(y)
        # torch appends the tail conv after 2 + 3*(num_layers-2) entries;
        # with the shipped RepCNN_num_layers=1 that index is simply 2.
        tail = 2 + 3 * max(self.num_layers - 2, 0)
        return nn.Conv(self.channels, (k, k), padding=pad, use_bias=False,
                       name=f"cnn_{tail}")(y)


class _PReLU(nn.Module):
    """torch nn.PReLU() (one shared slope); a module so the converter's
    generic weight->scale rule lands on `channel_add_conv_2/scale`."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param("scale", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


class ContextBlock2d(nn.Module):
    """Global Context Block (nernet/submodules.py:365-443),
    pool='att', fusion='channel_add'."""
    inplanes: int
    planes: int
    ratio: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        mask = nn.Conv(1, (1, 1), name="conv_mask")(x)        # (B,H,W,1)
        mask = jax.nn.softmax(mask.reshape(b, h * w), axis=1)
        context = jnp.einsum("bn,bnc->bc", mask, x.reshape(b, h * w, c))
        context = context[:, None, None, :]                    # (B,1,1,C)
        y = nn.Conv(self.planes // self.ratio, (1, 1),
                    name="channel_add_conv_0")(context)
        y = nn.LayerNorm(epsilon=1e-5, name="channel_add_conv_1")(y)
        y = _PReLU(name="channel_add_conv_2")(y)
        y = nn.Conv(self.inplanes, (1, 1), name="channel_add_conv_3")(y)
        return x + y


class NAMCell(nn.Module):
    """NAM_withoutGCB spatio-temporal LSTM cell with the Local
    Adaptation Gate (nernet/submodules.py:585-644).
    x/h/c/m all `hidden` channels at the same resolution."""
    hidden: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array, h: Array, c: Array, m: Array):
        k = (self.kernel_size, self.kernel_size)
        pad = ((self.kernel_size // 2,) * 2,) * 2
        nh = self.hidden
        x_cat = nn.Conv(7 * nh, k, padding=pad, use_bias=False,
                        name="conv_x_0")(x)
        h_cat = nn.Conv(4 * nh, k, padding=pad, use_bias=False,
                        name="conv_h_0")(h)
        m_cat = nn.Conv(3 * nh, k, padding=pad, use_bias=False,
                        name="conv_m_0")(m)
        i_x, f_x, g_x, i_xp, f_xp, g_xp, o_x = jnp.split(x_cat, 7, axis=-1)
        i_h, f_h, g_h, o_h = jnp.split(h_cat, 4, axis=-1)
        i_m, f_m, g_m = jnp.split(m_cat, 3, axis=-1)

        i_t = nn.sigmoid(i_x + i_h)
        f_t = nn.sigmoid(f_x + f_h + 1.0)
        # Local Adaptation Gate
        alpha = jnp.exp(nn.sigmoid(nn.Conv(
            nh, (1, 1), use_bias=False, name="LAG_conv")(x)))
        f_t = nn.sigmoid(f_t - alpha * i_t)
        g_t = jnp.tanh(g_x + g_h)
        c_new = f_t * c + i_t * g_t

        i_tp = nn.sigmoid(i_xp + i_m)
        f_tp = nn.sigmoid(f_xp + f_m + 1.0)
        g_tp = jnp.tanh(g_xp + g_m)
        m_new = f_tp * m + i_tp * g_tp

        mem = jnp.concatenate([c_new, m_new], axis=-1)
        o_t = nn.sigmoid(o_x + o_h + nn.Conv(
            nh, k, padding=pad, use_bias=False, name="conv_o_0")(mem))
        h_new = o_t * jnp.tanh(nn.Conv(nh, (1, 1), use_bias=False,
                                       name="conv_last")(mem))
        return h_new, c_new, m_new


class RecurrentConvLayerNAMGCB(nn.Module):
    """GCB + strided convs for x and the m stream + NAM cell
    (nernet/submodules.py:747-778)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 5
    stride: int = 2
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, h: Array, c: Array, m: Array,
                 train: bool = False):
        gcb = nn.Conv(self.in_channels, (1, 1), name="conv_1x1")(x)
        gcb = ContextBlock2d(self.in_channels, self.in_channels,
                             name="GCB")(gcb)
        x = x + gcb
        x = ConvLayer(self.out_channels, self.kernel_size, self.stride,
                      norm=self.norm, name="conv")(x, train=train)
        m = ConvLayer(self.out_channels, self.kernel_size, self.stride,
                      norm=self.norm, name="conv_mem")(m, train=train)
        return NAMCell(self.out_channels, 3, name="recurrent_block")(
            x, h, c, m)


class _UpStack(nn.Module):
    """Upsample-decoder stack with sum-skips; children are named
    decoders_{i} so the converter's _DECODER_STACKS rule maps the torch
    ModuleLists `decoders.{i}` / `m_t_UpsampleLayer.{i}` here."""
    features: Tuple[int, ...]
    kernel_size: int
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, skips, train: bool = False) -> Array:
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = UpsampleConvLayer(f, self.kernel_size, norm=self.norm,
                                  name=f"decoders_{i}")(
                x + skips[n - i - 1], train=train)
        return x


class UNetNIAMSTcellGCB(nn.Module):
    """(nernet/unet.py:139-240)"""
    num_bins: int
    base_num_channels: int = 32
    num_encoders: int = 3
    num_residual_blocks: int = 2
    kernel_size: int = 5
    learned_bins: bool = True     # head takes 2*num_bins when mlp voxelizer
    norm: Optional[str] = None
    final_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, state, train: bool = False):
        h_t, c_t, m_t = state
        enc_in = [self.base_num_channels * 2 ** i
                  for i in range(self.num_encoders)]
        enc_out = [self.base_num_channels * 2 ** (i + 1)
                   for i in range(self.num_encoders)]
        x = ConvLayer(self.base_num_channels, self.kernel_size, 1,
                      name="head")(x)
        head = x

        new_h, new_c = list(h_t), list(c_t)
        blocks_h, blocks_m = [], []
        nh, nc, m = RecurrentConvLayerNAMGCB(
            enc_in[0], enc_out[0], self.kernel_size, norm=self.norm,
            name="encoders_0")(x, h_t[0], c_t[0], m_t, train=train)
        new_h[0], new_c[0] = nh, nc
        blocks_h.append(nh)
        blocks_m.append(m)
        for i in range(1, self.num_encoders):
            nh, nc, m = RecurrentConvLayerNAMGCB(
                enc_in[i], enc_out[i], self.kernel_size, norm=self.norm,
                name=f"encoders_{i}")(new_h[i - 1], h_t[i], c_t[i], m,
                                      train=train)
            new_h[i], new_c[i] = nh, nc
            blocks_h.append(nh)
            blocks_m.append(m)

        # m-stream upsampler back to full resolution
        up_feats = tuple(reversed(enc_in))
        new_m = _UpStack(up_feats, self.kernel_size, norm=self.norm,
                         name="m_t_UpsampleLayer")(
            blocks_m[-1], blocks_m, train=train)

        xx = blocks_h[-1]
        for i in range(self.num_residual_blocks):
            xx = ResidualBlock(enc_out[-1], self.norm,
                               name=f"resblocks_{i}")(xx, train=train)
        xx = _UpStack(up_feats, self.kernel_size, norm=self.norm,
                      name="decoders")(xx, blocks_h, train=train)
        # pred carries the UNet norm (build_prediction_layer passes
        # self.norm, nernet/unet.py:176); final_activation applied like
        # getattr(torch, name) (nernet/unet.py:148-150,236-238)
        img = ConvLayer(1, 1, activation=None, norm=self.norm,
                        name="pred")(xx + head, train=train)
        from .submodules import activation_fn
        act = activation_fn(self.final_activation)
        if act is not None:
            img = act(img)
        return {"image": img}, (tuple(new_h), tuple(new_c), new_m)


class RepresentationRecurrent(nn.Module):
    """Reference target `model.nernet_model.RepresentationRecurrent`.

    __call__(events, n_events, state) with events (E,5) [x,y,t,p,b]
    (p in {-1,1}), voxelizes at the resolution the state was built for,
    center-pads to 2^num_encoders, and runs the NIAM UNet. Returns
    ({'image', 'voxel'}, new_state); image is cropped back.
    """
    unet_kwargs: Dict[str, Any]

    @nn.nowrap
    def _dims(self, height: int, width: int):
        ne = self.unet_kwargs.get("num_encoders", 3)
        cp = CropParameters(width, height, ne)
        return ne, cp

    @nn.compact
    def __call__(self, events: Array, n_events: Array, state, train=False):
        kw = self.unet_kwargs
        num_bins = kw["num_bins"]
        height, width = state[-1]  # resolution carried in state
        quant = QuantizationLayerTrail(
            num_bins, height, width,
            tuple(kw.get("mlp_layers", [1, 30, 30, 1])),
            kw.get("normalize", False), name="representation.quantization_layer")
        vox = quant(events, n_events)
        if kw.get("use_cnn_representation", False):
            vox = RepresentationCNN(
                2 * num_bins, kw.get("RepCNN_channel", 64),
                kw.get("RepCNN_kernel_size", 3),
                kw.get("RepCNN_num_layers", 3),
                name="representation.ConvLayer")(vox)
        ne, cp = self._dims(height, width)
        padded = cp.pad(vox)
        unet_state = state[0]
        network = kw.get("recurrent_network", "NIAM_STcell_GCB")
        if network == "NIAM_STcell_GCB":
            norm = kw.get("norm") or None        # '' / 'none' -> None
            if norm in ("none", "None"):
                norm = None
            out, new_unet_state = UNetNIAMSTcellGCB(
                num_bins, kw.get("base_num_channels", 32), ne,
                kw.get("num_residual_blocks", 2), kw.get("kernel_size", 5),
                norm=norm,
                final_activation=kw.get("final_activation", "none"),
                name="unetrecurrent")(padded, unet_state, train=train)
        else:
            # plain recurrent UNet backbone (nernet/unet.py:80-137);
            # flax infers the 2*num_bins head input lazily
            from .unet import UNetConfig, UNetRecurrent
            cfg = UNetConfig.from_kwargs(dict(kw))
            cfg.num_output_channels = 1
            out, new_unet_state = UNetRecurrent(cfg, name="unetrecurrent")(
                padded, list(unet_state), train=train)
            new_unet_state = tuple(new_unet_state)
        # Reference quirk kept for benchmark parity: the harness takes a
        # TOP-LEFT [:H,:W] crop of the (symmetrically padded!) output
        # (train_utils.py:364), not CropParameters.crop.
        img = out["image"][..., :height, :width, :]
        return {"image": img, "voxel": vox}, (new_unet_state, state[-1])

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        assert batch == 1, "NerNet supports batch size 1 (train_utils.py:354)"
        ne = self.unet_kwargs.get("num_encoders", 3)
        base = self.unet_kwargs.get("base_num_channels", 32)
        cp = CropParameters(width, height, ne)
        ph, pw = cp.height_crop_size, cp.width_crop_size
        network = self.unet_kwargs.get("recurrent_network",
                                       "NIAM_STcell_GCB")
        if network != "NIAM_STcell_GCB":
            from .unet import UNetConfig, _encoder_states
            cfg = UNetConfig.from_kwargs(dict(self.unet_kwargs))
            return (tuple(_encoder_states(cfg, batch, ph, pw, dtype)),
                    (height, width))
        h_t, c_t = [], []
        for i in range(ne):
            shape = (batch, ph // 2 ** (i + 1), pw // 2 ** (i + 1),
                     base * 2 ** (i + 1))
            h_t.append(jnp.zeros(shape, dtype))
            c_t.append(jnp.zeros(shape, dtype))
        m_t = jnp.zeros((batch, ph, pw, base), dtype)
        return ((tuple(h_t), tuple(c_t), m_t), (height, width))
