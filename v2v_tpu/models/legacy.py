"""Legacy FireNet (reference model/legacy.py): the original FireNet
formulation with a recurrent head conv and configurable recurrent
residual blocks (`recurrent_blocks={'resblock': [indices]}`)."""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .submodules import ConvGRU, ConvLSTM, RecurrentConvLayer, ResidualBlock

Array = jax.Array


class RecurrentResidualLayer(nn.Module):
    """ResidualBlock followed by a recurrent cell
    (model/submodules.py:281-304)."""
    features: int
    recurrent_block_type: str = "convgru"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, state, train: bool = False):
        x = ResidualBlock(self.features, self.norm, name="conv")(
            x, train=train)
        if self.recurrent_block_type == "convlstm":
            cell = ConvLSTM(self.features, 3, name="recurrent_block")
        else:
            cell = ConvGRU(self.features, 3, name="recurrent_block")
        return cell(x, state)


class _PredConv(nn.Module):
    """1x1 prediction conv in its own scope (torch child `pred.conv2d`)."""
    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.features, (1, 1),
                       bias_init=nn.initializers.constant(0.5),
                       name="conv2d")(x)


class UNetFire(nn.Module):
    """(model/legacy.py:103-181)"""
    num_input_channels: int
    num_output_channels: int = 1
    skip_type: str = "sum"
    recurrent_block_type: str = "convgru"
    base_num_channels: int = 32
    num_residual_blocks: int = 2
    norm: Optional[str] = None
    kernel_size: int = 3
    recurrent_resblocks: Tuple[int, ...] = (0,)

    @nn.compact
    def __call__(self, x: Array, states: List[Any], train: bool = False):
        new_states = []
        state_idx = 0
        x, s = RecurrentConvLayer(
            self.base_num_channels, self.kernel_size, 1,
            self.recurrent_block_type, norm=self.norm, name="head")(
            x, states[state_idx], train=train)
        new_states.append(s)
        state_idx += 1
        head = x
        for i in range(self.num_residual_blocks):
            if i in self.recurrent_resblocks or -1 in self.recurrent_resblocks:
                x, s = RecurrentResidualLayer(
                    self.base_num_channels, self.recurrent_block_type,
                    self.norm, name=f"resblocks_{i}")(
                    x, states[state_idx], train=train)
                new_states.append(s)
                state_idx += 1
            else:
                x = ResidualBlock(self.base_num_channels, self.norm,
                                  name=f"resblocks_{i}")(x, train=train)
        if self.skip_type == "concat":
            x = jnp.concatenate([x, head], axis=-1)
        elif self.skip_type == "sum":
            x = x + head
        # pred bias initialized to 0.5 (model/legacy.py:146); nested
        # pred/conv2d scope so the converter's path for the torch
        # `pred.conv2d.weight` key lands here
        img = _PredConv(self.num_output_channels, name="pred")(x)
        return img, new_states


class FireNetLegacy(nn.Module):
    """Reference target `model.legacy.FireNet_legacy`."""
    unet_kwargs: Dict[str, Any]

    @nn.nowrap
    def _cfg(self):
        c = self.unet_kwargs
        return dict(
            num_bins=int(c.get("num_bins", 5)),
            skip_type=c.get("skip_type", "sum"),
            base=int(c.get("base_num_channels", 32)),
            n_res=int(c.get("num_residual_blocks", 2)),
            norm=c.get("norm"),
            k=int(c.get("kernel_size", 3)),
            rec_type=c.get("recurrent_block_type", "convgru"),
            rec_blocks=tuple(c.get("recurrent_blocks",
                                   {"resblock": [0]}).get("resblock", [0])),
        )

    @nn.compact
    def __call__(self, x: Array, state: List[Any], train: bool = False):
        c = self._cfg()
        img, new_states = UNetFire(
            c["num_bins"], 1, c["skip_type"], c["rec_type"], c["base"],
            c["n_res"], c["norm"], c["k"], c["rec_blocks"],
            name="net")(x, state, train=train)
        return {"image": img}, new_states

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        c = self._cfg()
        n_rec = 1 + sum(1 for i in range(c["n_res"])
                        if i in c["rec_blocks"] or -1 in c["rec_blocks"])
        states = []
        for _ in range(n_rec):
            if c["rec_type"] == "convlstm":
                states.append(ConvLSTM.zero_state(batch, height, width,
                                                  c["base"], dtype))
            else:
                states.append(ConvGRU.zero_state(batch, height, width,
                                                 c["base"], dtype))
        return states
