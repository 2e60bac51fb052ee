"""Model zoo wrappers (reference: model/model.py).

Every model follows one stateful-step contract, the functional analog of
the reference's `forward(event_tensor)->dict` + `reset_states()`:

    model = E2VIDRecurrent(unet_kwargs={...})
    state = model.init_state(batch, H, W)               # == reset_states()
    (out_dict, state) = model.apply(params, voxel_nhwc, state)

`out_dict` has 'image' (B,H,W,1|3) and/or 'flow' (B,H,W,2). Non-recurrent
models accept and return `state=()` so the task interface can scan over
time uniformly.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .submodules import ConvGRU, ConvLayer, ResidualBlock
from .unet import (UNet, UNetConfig, UNetFlow, UNetFlowNoRecur,
                   UNetRecurrent, WNet, _encoder_states)

Array = jax.Array


class _SplitForward:
    """Mixin forwarding the recurrent UNets' forward-split entry points
    (pre / spine_step / tail — see models/unet.py _RecurrentUNetBase)
    through the zoo wrapper, so the task interface can hoist the
    temporally-independent convs out of the time scan. `_net` names the
    wrapped backbone attribute."""
    # deliberately unannotated: the flax dataclass transform must not
    # pick _net up as a module field
    _net = ""

    def pre(self, x, train: bool = False):
        return getattr(self, self._net).pre(x, train=train)

    def spine_step(self, pre0, states, train: bool = False):
        return getattr(self, self._net).spine_step(pre0, states,
                                                   train=train)

    def tail(self, head, blocks, train: bool = False):
        return getattr(self, self._net).tail(head, blocks, train=train)


class E2VIDRecurrent(_SplitForward, nn.Module):
    """E2VID: recurrent UNet reconstruction.
    Reference: model/model.py:194-223."""
    unet_kwargs: Dict[str, Any]
    _net = "unetrecurrent"

    def setup(self):
        cfg = UNetConfig.from_kwargs(dict(self.unet_kwargs))
        cfg.num_output_channels = 1
        self.cfg = cfg
        self.unetrecurrent = UNetRecurrent(cfg)

    def __call__(self, x: Array, state: List[Any], train: bool = False):
        return self.unetrecurrent(x, state, train=train)

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        return _encoder_states(UNetConfig.from_kwargs(dict(self.unet_kwargs)),
                               batch, height, width, dtype)

    @property
    def num_encoders(self) -> int:
        return self.unet_kwargs.get("num_encoders", 3)


class FlowNet(_SplitForward, nn.Module):
    """E2VID++: recurrent UNet with shared image+flow prediction.
    Reference: model/model.py:111-139."""
    unet_kwargs: Dict[str, Any]
    _net = "unetflow"

    def setup(self):
        cfg = UNetConfig.from_kwargs(dict(self.unet_kwargs))
        cfg.num_output_channels = 3
        self.unetflow = UNetFlow(cfg)

    def __call__(self, x: Array, state: List[Any], train: bool = False):
        return self.unetflow(x, state, train=train)

    @nn.nowrap
    def init_state(self, batch, height, width, dtype=jnp.float32):
        return _encoder_states(UNetConfig.from_kwargs(dict(self.unet_kwargs)),
                               batch, height, width, dtype)

    @property
    def num_encoders(self) -> int:
        return self.unet_kwargs.get("num_encoders", 3)


class ColorE2VID(_SplitForward, nn.Module):
    """E2VID++ variant emitting a 3-channel (BGR) image.
    Reference: model/model.py:164-192."""
    unet_kwargs: Dict[str, Any]
    _net = "unetflow"

    def setup(self):
        cfg = UNetConfig.from_kwargs(dict(self.unet_kwargs))
        cfg.num_output_channels = 3
        self.unetflow = UNetFlow(cfg, img_3c=True)

    def __call__(self, x: Array, state: List[Any], train: bool = False):
        return self.unetflow(x, state, train=train)

    @nn.nowrap
    def init_state(self, batch, height, width, dtype=jnp.float32):
        return _encoder_states(UNetConfig.from_kwargs(dict(self.unet_kwargs)),
                               batch, height, width, dtype)


class WFlowNet(_SplitForward, nn.Module):
    """W-Net: dual decoders for image + flow.
    Reference: model/model.py:80-108."""
    unet_kwargs: Dict[str, Any]
    _net = "wnet"

    def setup(self):
        cfg = UNetConfig.from_kwargs(dict(self.unet_kwargs))
        cfg.num_output_channels = 3
        self.wnet = WNet(cfg)

    def __call__(self, x: Array, state: List[Any], train: bool = False):
        return self.wnet(x, state, train=train)

    @nn.nowrap
    def init_state(self, batch, height, width, dtype=jnp.float32):
        return _encoder_states(UNetConfig.from_kwargs(dict(self.unet_kwargs)),
                               batch, height, width, dtype)


class FlowNetNoRecur(nn.Module):
    """Non-recurrent image+flow UNet. Reference: model/model.py:142-162."""
    unet_kwargs: Dict[str, Any]

    def setup(self):
        cfg = UNetConfig.from_kwargs(dict(self.unet_kwargs))
        cfg.num_output_channels = 3
        self.unetflow = UNetFlowNoRecur(cfg)

    def __call__(self, x: Array, state: Tuple = (), train: bool = False):
        return self.unetflow(x, train=train), state

    @nn.nowrap
    def init_state(self, batch, height, width, dtype=jnp.float32):
        return ()


# Hardcoded EVFlowNet hyperparameters, reference model/model.py:233-245.
_EVFLOWNET_KWARGS = dict(
    base_num_channels=32, num_encoders=4, num_residual_blocks=2,
    num_output_channels=2, skip_type="concat", norm=None,
    use_upsample_conv=True, kernel_size=3, channel_multiplier=2)


class EVFlowNet(nn.Module):
    """EV-FlowNet (Zhu et al. 2018): non-recurrent flow UNet.
    Reference: model/model.py:226-261."""
    unet_kwargs: Dict[str, Any]

    def setup(self):
        kwargs = dict(self.unet_kwargs)
        kwargs.update(_EVFLOWNET_KWARGS)
        self.unet = UNet(UNetConfig.from_kwargs(kwargs))

    def __call__(self, x: Array, state: Tuple = (), train: bool = False):
        flow = self.unet(x, train=train)
        # dummy zero image for interface compatibility
        # (reference model/model.py:261)
        return {"flow": flow, "image": 0.0 * flow[..., 0:1]}, state

    @nn.nowrap
    def init_state(self, batch, height, width, dtype=jnp.float32):
        return ()


class FireNet(nn.Module):
    """FireNet (Scheerlinck et al. 2019): tiny 2-ConvGRU reconstruction
    net. Reference: model/model.py:264-311."""
    num_bins: int = 5
    base_num_channels: int = 16
    kernel_size: int = 3
    unet_kwargs: Dict[str, Any] | None = None

    @nn.nowrap
    def _resolved(self):
        kw = self.unet_kwargs or {}
        return (kw.get("num_bins", self.num_bins),
                kw.get("base_num_channels", self.base_num_channels),
                kw.get("kernel_size", self.kernel_size))

    @nn.compact
    def __call__(self, x: Array, state: List[Array], train: bool = False):
        _, c, k = self._resolved()
        x = ConvLayer(c, k, name="head")(x)
        x, s0 = ConvGRU(c, k, name="G1")(x, state[0])
        x = ResidualBlock(c, name="R1")(x)
        x, s1 = ConvGRU(c, k, name="G2")(x, state[1])
        x = ResidualBlock(c, name="R2")(x)
        img = ConvLayer(1, 1, activation=None, name="pred")(x)
        return {"image": img}, [s0, s1]

    @nn.nowrap
    def init_state(self, batch, height, width, dtype=jnp.float32):
        _, c, _ = self._resolved()
        z = jnp.zeros((batch, height, width, c), dtype)
        return [z, z]
