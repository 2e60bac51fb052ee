"""Recurrent UNet family (Flax, NHWC, explicit state pytrees).

TPU-native re-design of the reference UNets (model/unet.py): same
topologies and parameter shapes (for checkpoint conversion), but
recurrence is externalized — every module takes and returns its state so
the time loop can be a `jax.lax.scan` in the task interface instead of a
python loop mutating `self.states` (reference model/unet.py:293-296).

Architectures:
  UNetRecurrent  — E2VID:  head conv -> N strided ConvLSTM encoders ->
                   resblocks -> upsample decoders with skips -> 1x1 pred
                   (model/unet.py:252-310)
  UNetFlow       — E2VID++: same, 3-channel head split image+flow
                   (model/unet.py:133-194)
  WNet           — dual decoder (image + flow) (model/unet.py:66-130)
  UNetFlowNoRecur— non-recurrent variant (model/unet.py:197-249)
  UNet           — plain UNet, no head (EVFlowNet) (model/unet.py:313-352)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .submodules import (ConvLayer, ConvGRU, ConvLSTM, RecurrentConvLayer,
                         ResidualBlock, TransposedConvLayer,
                         UpsampleConvLayer, activation_fn, skip_concat,
                         skip_sum)

Array = jax.Array


def _none_norm(norm):
    return None if norm in (None, "none", "None", "") else norm


@dataclasses.dataclass
class UNetConfig:
    """The `unet_kwargs` config block (model/unet.py:14-43 defaults)."""
    num_bins: int = 5
    base_num_channels: int = 32
    num_encoders: int = 3
    num_residual_blocks: int = 2
    num_output_channels: int = 1
    skip_type: str = "sum"
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    kernel_size: int = 5
    channel_multiplier: float = 2
    recurrent_block_type: str = "convlstm"
    final_activation: Optional[str] = None

    # unet_kwargs keys consumed by wrapper models / other reference
    # BaseUNet variants rather than the core UNet (nernet BaseUNet and
    # HyperE2VID accept these; model/nernet/unet.py:14-17,
    # hyper_model.py) — never a typo signal
    _PASS_THROUGH = frozenset({
        "crop_size", "mlp_layers", "use_cnn_representation", "normalize",
        "combine_voxel", "RepCNN_num_layers", "RepCNN_kernel_size",
        "RepCNN_padding", "RepCNN_channel", "recurrent_network",
        "use_dynamic_decoder", "unet_kwargs", "num_bins_events",
    })

    @classmethod
    def from_kwargs(cls, kwargs: Dict[str, Any]) -> "UNetConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = sorted(set(kwargs) - known - cls._PASS_THROUGH)
        if unknown:
            # the reference's BaseUNet(**unet_kwargs) raises TypeError
            # on unexpected keys (model/unet.py:14-43) — a typo like
            # 'kernal_size' must not silently train with defaults
            import warnings
            warnings.warn(f"unet_kwargs keys not recognized (typo?): "
                          f"{unknown} — the reference would reject these")
        clean = {k: v for k, v in kwargs.items() if k in known}
        cfg = cls(**clean)
        cfg.norm = _none_norm(cfg.norm)
        if cfg.final_activation in ("", "none", "None"):
            cfg.final_activation = None
        return cfg

    @property
    def encoder_input_sizes(self) -> List[int]:
        return [int(self.base_num_channels * self.channel_multiplier ** i)
                for i in range(self.num_encoders)]

    @property
    def encoder_output_sizes(self) -> List[int]:
        return [int(self.base_num_channels * self.channel_multiplier ** (i + 1))
                for i in range(self.num_encoders)]

    @property
    def max_num_channels(self) -> int:
        return self.encoder_output_sizes[-1]

    @property
    def skip_fn(self):
        return skip_sum if self.skip_type == "sum" else skip_concat

    @property
    def upsample_layer(self):
        return UpsampleConvLayer if self.use_upsample_conv else TransposedConvLayer


class _Decoders(nn.Module):
    """The decoder stack shared by all UNet variants."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: Array, blocks: Sequence[Array],
                 train: bool = False) -> Array:
        cfg = self.cfg
        out_sizes = list(reversed(cfg.encoder_input_sizes))
        for i, features in enumerate(out_sizes):
            x = cfg.skip_fn(x, blocks[cfg.num_encoders - i - 1])
            x = cfg.upsample_layer(
                features, kernel_size=cfg.kernel_size, norm=cfg.norm,
                name=f"decoders_{i}")(x, train=train)
        return x


class _RecurrentUNetBase(nn.Module):
    """Shared structure of the recurrent UNets, split into three entry
    points so the task interface can restructure the time loop
    (training/interface.py forward-split path):

        pre(x)                -> (head, pre0)   no temporal dependence:
                                 head conv + encoder-0's input conv —
                                 runs T-batched outside the scan
        spine_step(pre0, st)  -> (blocks, st')  the recurrent spine:
                                 encoder-0 cell, encoders 1.. (conv+cell)
                                 — the only part that must scan over time
        tail(head, blocks)    -> out dict       resblocks + decoders +
                                 pred: consumes only per-step encoder
                                 outputs, runs T-batched after the scan

    __call__ composes the three, so the single-step semantics (and the
    torch parity tests) are unchanged; the param tree is identical to
    the reference layout (head / encoders_i / resblocks_i / decoders /
    pred...) via flax list auto-naming."""
    cfg: UNetConfig

    def setup(self):
        cfg = self.cfg
        self.head = ConvLayer(cfg.base_num_channels, cfg.kernel_size, 1)
        self.encoders = [
            RecurrentConvLayer(features, cfg.kernel_size, 2,
                               cfg.recurrent_block_type, norm=cfg.norm)
            for features in cfg.encoder_output_sizes]
        self.resblocks = [ResidualBlock(cfg.max_num_channels, cfg.norm)
                          for _ in range(cfg.num_residual_blocks)]
        self._setup_decoders()

    def _setup_decoders(self):
        raise NotImplementedError

    def pre(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
        h = self.head(x, train=train)
        return h, self.encoders[0].apply_conv(h, train=train)

    def spine_step(self, pre0: Array, states: List[Any],
                   train: bool = False
                   ) -> Tuple[List[Array], List[Any]]:
        blocks, new_states = [], []
        x, s = self.encoders[0].apply_cell(pre0, states[0])
        blocks.append(x)
        new_states.append(s)
        for enc, st in zip(self.encoders[1:], states[1:]):
            x, s = enc(x, st, train=train)
            blocks.append(x)
            new_states.append(s)
        return blocks, new_states

    def _bottleneck(self, blocks: Sequence[Array], train: bool) -> Array:
        x = blocks[-1]
        for rb in self.resblocks:
            x = rb(x, train=train)
        return x

    def tail(self, head: Array, blocks: Sequence[Array],
             train: bool = False) -> Dict[str, Array]:
        raise NotImplementedError

    def __call__(self, x: Array, states: List[Any], train: bool = False
                 ) -> Tuple[Dict[str, Array], List[Any]]:
        head, pre0 = self.pre(x, train=train)
        blocks, new_states = self.spine_step(pre0, states, train=train)
        return self.tail(head, blocks, train=train), new_states

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32) -> List[Any]:
        return _encoder_states(self.cfg, batch, height, width, dtype)


class UNetRecurrent(_RecurrentUNetBase):
    """E2VID backbone. Reference: model/unet.py:252-310."""

    def _setup_decoders(self):
        cfg = self.cfg
        self.decoders = _Decoders(cfg)
        self.pred = ConvLayer(cfg.num_output_channels, 1, activation=None,
                              norm=cfg.norm)

    def tail(self, head: Array, blocks: Sequence[Array],
             train: bool = False) -> Dict[str, Array]:
        cfg = self.cfg
        x = self._bottleneck(blocks, train)
        x = self.decoders(x, blocks, train=train)
        img = self.pred(cfg.skip_fn(x, head), train=train)
        act = activation_fn(cfg.final_activation)
        if act is not None:
            img = act(img)
        return {"image": img}


def _encoder_states(cfg: UNetConfig, batch: int, height: int, width: int,
                    dtype=jnp.float32) -> List[Any]:
    states = []
    h, w = height, width
    for features in cfg.encoder_output_sizes:
        h, w = h // 2, w // 2
        if cfg.recurrent_block_type == "convlstm":
            states.append(ConvLSTM.zero_state(batch, h, w, features, dtype))
        else:
            states.append(ConvGRU.zero_state(batch, h, w, features, dtype))
    return states


class UNetFlow(_RecurrentUNetBase):
    """E2VID++ backbone: one decoder, 3-channel output split into
    image (1) + flow (2), or 3-channel image when img_3c.
    Reference: model/unet.py:133-194."""
    img_3c: bool = False

    def _setup_decoders(self):
        self.decoders = _Decoders(self.cfg)
        self.pred = ConvLayer(3, 1, activation=None)

    def tail(self, head: Array, blocks: Sequence[Array],
             train: bool = False) -> Dict[str, Array]:
        cfg = self.cfg
        x = self._bottleneck(blocks, train)
        x = self.decoders(x, blocks, train=train)
        img_flow = self.pred(cfg.skip_fn(x, head), train=train)
        if self.img_3c:
            return {"image": img_flow}
        return {"image": img_flow[..., 0:1], "flow": img_flow[..., 1:3]}


class WNet(_RecurrentUNetBase):
    """Dual-decoder recurrent UNet: separate image and flow decoder
    stacks. Reference: model/unet.py:66-130."""

    def _setup_decoders(self):
        self.flow_decoders = _Decoders(self.cfg)
        self.image_decoders = _Decoders(self.cfg)
        self.flow_pred = ConvLayer(2, 1, activation=None)
        self.image_pred = ConvLayer(1, 1, activation=None)

    def tail(self, head: Array, blocks: Sequence[Array],
             train: bool = False) -> Dict[str, Array]:
        cfg = self.cfg
        x = self._bottleneck(blocks, train)
        flow_x = self.flow_decoders(x, blocks, train=train)
        img_x = self.image_decoders(x, blocks, train=train)
        flow = self.flow_pred(cfg.skip_fn(flow_x, head), train=train)
        img = self.image_pred(cfg.skip_fn(img_x, head), train=train)
        return {"image": img, "flow": flow}


class UNetFlowNoRecur(nn.Module):
    """Non-recurrent UNetFlow. Reference: model/unet.py:197-249."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Dict[str, Array]:
        cfg = self.cfg
        x = ConvLayer(cfg.base_num_channels, cfg.kernel_size, 1,
                      name="head")(x, train=train)
        head = x
        blocks = []
        for i, features in enumerate(cfg.encoder_output_sizes):
            x = ConvLayer(features, cfg.kernel_size, 2, norm=cfg.norm,
                          name=f"encoders_{i}")(x, train=train)
            blocks.append(x)
        for i in range(cfg.num_residual_blocks):
            x = ResidualBlock(cfg.max_num_channels, cfg.norm,
                              name=f"resblocks_{i}")(x, train=train)
        x = _Decoders(cfg, name="decoders")(x, blocks, train=train)
        img_flow = ConvLayer(3, 1, activation=None, name="pred")(
            cfg.skip_fn(x, head), train=train)
        return {"image": img_flow[..., 0:1], "flow": img_flow[..., 1:3]}


class UNet(nn.Module):
    """Plain UNet without head conv (EVFlowNet backbone).
    Reference: model/unet.py:313-352."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cfg = self.cfg
        blocks = []
        for i, features in enumerate(cfg.encoder_output_sizes):
            x = ConvLayer(features, cfg.kernel_size, 2, norm=cfg.norm,
                          name=f"encoders_{i}")(x, train=train)
            blocks.append(x)
        for i in range(cfg.num_residual_blocks):
            x = ResidualBlock(cfg.max_num_channels, cfg.norm,
                              name=f"resblocks_{i}")(x, train=train)
        x = _Decoders(cfg, name="decoders")(x, blocks, train=train)
        return ConvLayer(cfg.num_output_channels, 1, activation=None,
                         name="pred")(x, train=train)
