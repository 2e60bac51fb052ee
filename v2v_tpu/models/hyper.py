"""HyperE2VID: E2VID UNet whose first decoder is a hypernetwork dynamic
convolution (reference model/hyper_model.py + model/hyper/hyper_dynamic.py).

Context fusion of (voxel, previous reconstruction) -> per-pixel dynamic
atoms over multiscale Fourier-Bessel bases -> per-pixel dynamic conv.
The bases ship as precomputed data (weights/fourier_bessel_bases.npz,
derived from the DCFNet bessel-zero table the reference vendors as
bessel.npy).

TPU design notes:
  * torch's unfold+einsum dynamic conv maps to 25 shifted slices + one
    einsum — XLA fuses the slices; the einsum and the 1x1 composition
    conv hit the MXU.
  * `prev_recs` feedback is part of the explicit model state
    (encoder states, prev_recs) instead of a mutated attribute; the GT
    mixing curriculum beta (train_utils.py:307) enters as an argument.
  * BatchNorms in the atom generator use stored statistics at eval
    (checkpoint-exact) and live batch statistics when train=True, with
    running stats updated through the mutable 'batch_stats' collection
    (reference trains them live, train.py:72).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .submodules import ConvLayer, RecurrentConvLayer, ResidualBlock
from .unet import UNetConfig, _encoder_states

Array = jax.Array

_BASES_PATH = os.path.join(os.path.dirname(__file__), "weights",
                           "fourier_bessel_bases.npz")


def fourier_bessel_bases(kernel_size: int) -> np.ndarray:
    """(num_multiscale_bases, ks*ks) basis matrix."""
    data = np.load(_BASES_PATH)
    return data[f"ks{kernel_size}"]


class ConvolutionalContextFusion(nn.Module):
    """concat(events, prev_recs) -> bilinear /4 -> conv3x3
    (hyper_dynamic.py:7-23)."""
    out_channels: int = 32
    downsample_factor: int = 4

    @nn.compact
    def __call__(self, ev: Array, prev_recs: Array) -> Array:
        ctx = jnp.concatenate([ev, prev_recs], axis=-1)
        b, h, w, c = ctx.shape
        # torch F.interpolate downsampling does NOT antialias
        ctx = jax.image.resize(
            ctx, (b, h // self.downsample_factor, w // self.downsample_factor,
                  c), method="bilinear", antialias=False)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       name="conv")(ctx)


# Torch-exact BatchNorm: stored stats at eval, live batch statistics +
# running-stat updates when train=True and 'batch_stats' is mutable
# (the reference trains these BNs live via model.train(), train.py:72).
from .submodules import TorchBatchNorm as _BN


class DynamicAtomGeneration(nn.Module):
    """context -> per-pixel atoms over Fourier-Bessel bases
    (hyper_dynamic.py:26-57)."""
    kernel_size: int = 5
    num_atoms: int = 6
    num_bases: int = 6
    hid_channels: int = 64

    @nn.compact
    def __call__(self, context: Array, train: bool = False) -> Array:
        bases = jnp.asarray(fourier_bessel_bases(self.kernel_size))
        num_ms = bases.shape[0]
        x = nn.Conv(self.hid_channels, (3, 3), padding="SAME",
                    name="bases_net_0")(context)
        x = jnp.tanh(_BN(self.hid_channels, name="bases_net_1")(
            x, use_running_average=not train))
        x = nn.Conv(self.num_atoms * num_ms, (3, 3), padding="SAME",
                    name="bases_net_3")(x)
        x = jnp.tanh(_BN(self.num_atoms * num_ms, name="bases_net_4")(
            x, use_running_average=not train))
        b, h, w, _ = x.shape
        coeff = x.reshape(b, h, w, self.num_atoms, num_ms)
        # (B,H,W,m,K) x (K,L) -> (B,H,W,m,L)
        return jnp.einsum("bhwmk,kl->bhwml", coeff, bases,
                          preferred_element_type=jnp.float32)


class DynamicConv(nn.Module):
    """Per-pixel dynamic convolution (hyper_dynamic.py:60-92).

    The reference (and the round-1..3 port) materializes unfold patches
    (B,H,W,C,k^2) and contracts them with the atoms BEFORE the 1x1
    composition conv. Round 4 reorders the contractions using the fact
    that the 1x1's channel contraction commutes with spatial shifts:

        out_o = sum_{m,l} atoms_{m,l} * shift_l( x . K[:, m, o] )

    i.e. FIRST one big MXU matmul x(C) -> z(M*C_out) with the SAME
    `compositional_coefficients` parameter (reshaped view), THEN the
    atom-weighted k^2 shift-sum on the (smaller) z. Algebraically
    identical (floating-point reassociation only), same param tree, and
    it never materializes the k^2 patch tensor — at the flagship hyper
    shape that tensor was 157 MB per scan step (x40 steps, x backward
    remat) of pure HBM traffic, and the ragged (6x25)x(25x256) per-pixel
    einsum it fed could not fill the MXU. Measured on-chip: see
    docs/PERF.md round 4."""
    in_channels: int
    out_channels: int
    kernel_size: int = 5
    num_atoms: int = 6

    @nn.compact
    def __call__(self, x: Array, atoms: Array) -> Array:
        k = self.kernel_size
        p = k // 2
        b, h, w, c = x.shape
        m, co = self.num_atoms, self.out_channels
        kernel = self.param(
            "compositional_coefficients",
            nn.initializers.kaiming_normal(),
            (1, 1, self.in_channels * self.num_atoms, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        # (1,1,C*M,O) is c-major over (c,m) — the unfold/einsum layout the
        # converter ships — so the reshape view is (C, M*O) exactly
        k2 = kernel.reshape(c, m * co)
        z = jnp.dot(x.reshape(b * h * w, c), k2,
                    preferred_element_type=jnp.float32)
        z = z.reshape(b, h, w, m, co).astype(x.dtype)
        # atoms l-index is torch-unfold row-major over the kxk window;
        # shift_l(z)[y] = zp[y + l_offset] reproduces the patch indexing
        from ..ops import dynconv
        # opt-in until the fused kernel has an on-chip A/B + parity run
        # (round-4 relay outage blocked both; semantics are pinned in
        # interpret mode by tests/test_dynconv.py)
        if os.environ.get("V2V_DYNCONV_PALLAS", "0") == "1" and \
                dynconv.pallas_ok(b, h, w, m, co, k, z.dtype.itemsize) and \
                jax.devices()[0].platform in ("tpu", "axon"):
            # fused VMEM shift-sum: one HBM read of z/atoms instead of
            # k^2 re-reads fwd and 2x that in the backward
            out = dynconv.dynamic_shift_sum(z, atoms.astype(jnp.float32), k)
            return out.astype(x.dtype) + bias
        zp = jnp.pad(z, ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))
        out = jnp.zeros((b, h, w, co), jnp.float32)
        for i in range(k):
            for j in range(k):
                a = atoms[..., i * k + j]              # (B,H,W,M)
                out = out + jnp.einsum(
                    "bhwm,bhwmo->bhwo", a, zp[:, i:i + h, j:j + w],
                    preferred_element_type=jnp.float32)
        return out.astype(x.dtype) + bias


class DynamicUpsampleLayer(nn.Module):
    """bilinear x2 + context-conditioned dynamic conv
    (hyper_model.py:33-60)."""
    in_channels: int
    out_channels: int
    kernel_size: int = 5
    in_fuse_channels: int = 6
    out_fuse_channels: int = 32
    num_atoms: int = 6

    @nn.compact
    def __call__(self, x: Array, ev_tensor: Array, prev_recs: Array,
                 train: bool = False) -> Array:
        b, h, w, c = x.shape
        x_up = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
        ctx = ConvolutionalContextFusion(
            self.out_fuse_channels, name="context_fusion")(ev_tensor,
                                                           prev_recs)
        atoms = DynamicAtomGeneration(
            self.kernel_size, self.num_atoms,
            name="dynamic_atom_generation")(ctx, train=train)
        out = DynamicConv(self.in_channels, self.out_channels,
                          self.kernel_size, self.num_atoms,
                          name="dynamic_conv")(x_up, atoms)
        return nn.relu(out)


class _HyperDecoders(nn.Module):
    """Decoder stack with the dynamic first decoder
    (hyper_model.py:107-124,182-187)."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: Array, blocks, ev_tensor: Array, prev_recs: Array,
                 train: bool = False) -> Array:
        cfg = self.cfg
        out_sizes = list(reversed(cfg.encoder_input_sizes))
        in_sizes = list(reversed(cfg.encoder_output_sizes))
        for i, features in enumerate(out_sizes):
            skip = cfg.skip_fn(x, blocks[cfg.num_encoders - i - 1])
            if i == 0:
                x = DynamicUpsampleLayer(
                    in_sizes[0] * (2 if cfg.skip_type == "concat" else 1),
                    features, cfg.kernel_size,
                    in_fuse_channels=1 + cfg.num_bins,
                    name="decoders_0")(skip, ev_tensor, prev_recs,
                                       train=train)
            else:
                x = cfg.upsample_layer(
                    features, kernel_size=cfg.kernel_size, norm=cfg.norm,
                    name=f"decoders_{i}")(skip, train=train)
        return x


class HyperUNetRecurrent(nn.Module):
    """UNetRecurrent with a dynamic first decoder
    (hyper_model.py:138-196)."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, x: Array, states: List[Any], prev_recs: Array,
                 train: bool = False) -> Tuple[Dict[str, Array], List[Any]]:
        cfg = self.cfg
        ev_tensor = x
        x = ConvLayer(cfg.base_num_channels, cfg.kernel_size, 1,
                      name="head")(x, train=train)
        head = x
        blocks, new_states = [], []
        for i, features in enumerate(cfg.encoder_output_sizes):
            x, s = RecurrentConvLayer(
                features, cfg.kernel_size, 2, cfg.recurrent_block_type,
                norm=cfg.norm, name=f"encoders_{i}")(x, states[i], train=train)
            blocks.append(x)
            new_states.append(s)
        for i in range(cfg.num_residual_blocks):
            x = ResidualBlock(cfg.max_num_channels, cfg.norm,
                              name=f"resblocks_{i}")(x, train=train)

        x = _HyperDecoders(cfg, name="decoders")(x, blocks, ev_tensor,
                                                 prev_recs, train=train)
        img = ConvLayer(cfg.num_output_channels, 1, activation=None,
                        norm=cfg.norm, name="pred")(cfg.skip_fn(x, head),
                                                    train=train)
        from .submodules import activation_fn
        act = activation_fn(cfg.final_activation)
        if act is not None:
            img = act(img)
        if cfg.num_output_channels == 3:
            # image(1) + flow(2) head split (hyper_model.py:193-195)
            return ({"image": img[..., 0:1], "flow": img[..., 1:3]},
                    new_states)
        return {"image": img}, new_states


class HyperE2VID(nn.Module):
    """Reference target `model.hyper_model.HyperE2VID`.

    State = (encoder_states, prev_recs). The GT-mixing curriculum
    (train: prev = prev*(1-beta) + gt*beta, hyper_model.py:231-234)
    activates when `gt_image` and `beta` are passed."""
    unet_kwargs: Dict[str, Any]

    def setup(self):
        cfg = UNetConfig.from_kwargs(dict(self.unet_kwargs))
        if "num_output_channels" not in self.unet_kwargs:
            cfg.num_output_channels = 1
        self.cfg = cfg
        self.unetrecurrent = HyperUNetRecurrent(cfg)

    def __call__(self, x: Array, state: Tuple[List[Any], Array],
                 train: bool = False, gt_image: Optional[Array] = None,
                 beta: Optional[Array] = None):
        enc_states, prev_recs = state
        if gt_image is not None and beta is not None:
            prev_recs = prev_recs * (1 - beta) + gt_image * beta
        out, new_enc = self.unetrecurrent(x, enc_states, prev_recs,
                                          train=train)
        new_prev = jax.lax.stop_gradient(out["image"])
        return out, (new_enc, new_prev)

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32):
        cfg = UNetConfig.from_kwargs(dict(self.unet_kwargs))
        enc = _encoder_states(cfg, batch, height, width, dtype)
        prev = jnp.zeros((batch, height, width, 1), dtype)
        return (enc, prev)
