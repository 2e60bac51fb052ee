"""Shared NN building blocks for the model zoo (Flax, NHWC).

Functional equivalents of the reference's torch submodules
(model/submodules.py): ConvLayer, TransposedConvLayer, UpsampleConvLayer,
RecurrentConvLayer, ResidualBlock, ConvLSTM, ConvGRU.

Parity notes (for checkpoint conversion, v2v_tpu/models/convert.py):
  * All convs use explicit symmetric padding k//2 per side — torch's
    `padding=k//2` semantics, NOT XLA 'SAME' (which pads asymmetrically
    for even sizes at stride 2 and would shift activations).
  * Layout is NHWC / HWIO (TPU-native); torch OIHW kernels transpose with
    (2, 3, 1, 0).
  * Gate packing orders match torch chunk order exactly:
    ConvLSTM Gates -> [input, forget, output, cell]
    (model/submodules.py:221).
  * Recurrent cells take and return explicit state pytrees; zero state ==
    the reference's `prev_state=None` init (model/submodules.py:201-212).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Array = jax.Array


def activation_fn(name: Optional[str]) -> Optional[Callable[[Array], Array]]:
    """Map the reference's `getattr(torch, name)` activation strings."""
    if name is None or name in ("", "none", "None"):
        return None
    return {
        "relu": nn.relu,
        "sigmoid": nn.sigmoid,
        "tanh": nn.tanh,
        "softmax": nn.softmax,
        "elu": nn.elu,
        "gelu": nn.gelu,
        "leaky_relu": nn.leaky_relu,
    }[name]


def _pad2d(k: int) -> Sequence[Tuple[int, int]]:
    p = k // 2
    return ((p, p), (p, p))


def _instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """torch nn.InstanceNorm2d(C) defaults: affine=False,
    track_running_stats=False — live per-instance spatial stats."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact semantics (nn.BatchNorm2d defaults).

    Differences vs flax nn.BatchNorm that matter for parity with the
    reference (which trains BN live — train.py:72 calls model.train()
    and never freeze_bn):
      * running_var is updated with the UNBIASED batch variance
        (n/(n-1)), while normalization uses the biased one;
      * momentum 0.1 in torch convention:
        running = (1-0.1)*running + 0.1*batch;
      * statistics are computed and stored in float32 even when the
        activations are bf16 (torch autocast behavior).

    Stats live in the 'batch_stats' collection as {mean, var}; updates
    happen only when `use_running_average=False` AND the collection is
    mutable in this apply (so eval/frozen paths never need mutable)."""
    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if use_running_average:
            mean = ra_mean.value.astype(jnp.float32)
            var = ra_var.value.astype(jnp.float32)
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axis=axes)
            var = ((xf - mean) ** 2).mean(axis=axes)
            if not self.is_initializing() and \
                    self.is_mutable_collection("batch_stats"):
                n = 1
                for a in axes:
                    n *= x.shape[a]
                # torch raises 'Expected more than 1 value per channel
                # when training'; surface degenerate shapes loudly
                # instead of silently storing a biased running var
                if n <= 1:
                    raise ValueError(
                        f"TorchBatchNorm: {n} value(s) per channel "
                        f"(input shape {x.shape}) — torch BatchNorm2d "
                        f"rejects this in training mode")
                unbiased = var * (n / (n - 1))
                m = self.momentum
                ra_mean.value = ((1 - m) * ra_mean.value.astype(jnp.float32)
                                 + m * mean)
                ra_var.value = ((1 - m) * ra_var.value.astype(jnp.float32)
                                + m * unbiased)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class TorchInstanceNorm(nn.Module):
    """nn.InstanceNorm2d(C, track_running_stats=True) — the reference
    ConvLayer's 'IN' option (model/submodules.py:24): affine=False; at
    EVAL every sample is normalized with the stored per-channel running
    stats (BatchNorm-style), NOT live per-instance stats; at train it
    normalizes per instance over (H, W) and updates the running stats
    with the batch mean of per-instance statistics (momentum 0.1,
    unbiased var)."""
    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = True) -> Array:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if use_running_average:
            inv = jax.lax.rsqrt(ra_var.value.astype(jnp.float32)
                                + self.epsilon)
            y = (x.astype(jnp.float32)
                 - ra_mean.value.astype(jnp.float32)) * inv
            return y.astype(x.dtype)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(1, 2), keepdims=True)        # per instance
        var = ((xf - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if not self.is_initializing() and \
                self.is_mutable_collection("batch_stats"):
            n = x.shape[1] * x.shape[2]
            # torch raises 'Expected more than 1 spatial element when
            # training'; fail loudly instead of storing a biased var
            if n <= 1:
                raise ValueError(
                    f"TorchInstanceNorm: {n} spatial element(s) per "
                    f"instance (input shape {x.shape}) — torch "
                    f"InstanceNorm2d rejects this in training mode")
            unbiased = var * (n / (n - 1))
            m = self.momentum
            ra_mean.value = ((1 - m) * ra_mean.value.astype(jnp.float32)
                             + m * mean.mean(axis=(0, 1, 2)))
            ra_var.value = ((1 - m) * ra_var.value.astype(jnp.float32)
                            + m * unbiased.mean(axis=(0, 1, 2)))
        return y.astype(x.dtype)


class ConvLayer(nn.Module):
    """Conv2d [+ norm] [+ activation]. Reference: model/submodules.py:7-34."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        use_bias = self.norm != "BN"
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=_pad2d(self.kernel_size), use_bias=use_bias,
                    name="conv2d")(x)
        x = checkpoint_name(x, "conv_out")
        if self.norm == "BN":
            x = TorchBatchNorm(self.features, name="norm_layer")(
                x, use_running_average=not train)
        elif self.norm == "IN":
            x = TorchInstanceNorm(self.features, name="norm_layer")(
                x, use_running_average=not train)
        act = activation_fn(self.activation)
        return act(x) if act is not None else x


class UpsampleConvLayer(nn.Module):
    """Bilinear x2 upsample then conv (no checkerboard artefacts).
    Reference: model/submodules.py:68-96; `f.interpolate(..., bilinear,
    align_corners=False)` == jax.image.resize half-pixel convention."""
    features: int
    kernel_size: int = 3
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
        use_bias = self.norm != "BN"
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    padding=_pad2d(self.kernel_size), use_bias=use_bias,
                    name="conv2d")(x)
        x = checkpoint_name(x, "conv_out")
        if self.norm == "BN":
            x = TorchBatchNorm(self.features, name="norm_layer")(
                x, use_running_average=not train)
        elif self.norm == "IN":
            x = TorchInstanceNorm(self.features, name="norm_layer")(
                x, use_running_average=not train)
        act = activation_fn(self.activation)
        return act(x) if act is not None else x


class TransposedConvLayer(nn.Module):
    """Stride-2 transposed conv (fast upsample, checkerboard artefacts).
    Matches torch ConvTranspose2d(stride=2, padding=k//2,
    output_padding=1): out = 2*in. Reference: model/submodules.py:37-65."""
    features: int
    kernel_size: int = 3
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k, p = self.kernel_size, self.kernel_size // 2
        # torch convtranspose == lhs-dilated conv with flipped kernel;
        # effective padding per side: k-1-p (+ output_padding at hi end).
        use_bias = self.norm != "BN"
        x = nn.ConvTranspose(
            self.features, (k, k), strides=(2, 2),
            padding=((k - 1 - p, k - 1 - p + 1), (k - 1 - p, k - 1 - p + 1)),
            transpose_kernel=True, use_bias=use_bias, name="transposed_conv2d")(x)
        x = checkpoint_name(x, "conv_out")
        if self.norm == "BN":
            x = TorchBatchNorm(self.features, name="norm_layer")(
                x, use_running_average=not train)
        elif self.norm == "IN":
            x = TorchInstanceNorm(self.features, name="norm_layer")(
                x, use_running_average=not train)
        act = activation_fn(self.activation)
        return act(x) if act is not None else x


class ResidualBlock(nn.Module):
    """conv-norm-relu-conv-norm + skip, relu. Reference:
    model/submodules.py:143-176 (stride fixed to 1, no downsample in any
    shipped config)."""
    features: int
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        residual = x
        use_bias = self.norm != "BN"
        out = nn.Conv(self.features, (3, 3), padding=_pad2d(3),
                      use_bias=use_bias, name="conv1")(x)
        out = checkpoint_name(out, "conv_out")
        if self.norm == "BN":
            out = TorchBatchNorm(self.features, name="bn1")(
                out, use_running_average=not train)
        elif self.norm == "IN":
            # reference ResidualBlock uses PLAIN InstanceNorm2d (no
            # running stats, no affine, eps 1e-5) — always live stats
            out = _instance_norm(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=_pad2d(3),
                      use_bias=use_bias, name="conv2")(out)
        out = checkpoint_name(out, "conv_out")
        if self.norm == "BN":
            out = TorchBatchNorm(self.features, name="bn2")(
                out, use_running_average=not train)
        elif self.norm == "IN":
            out = _instance_norm(out)
        return nn.relu(out + residual)


LSTMState = Tuple[Array, Array]  # (hidden, cell), each (B, H, W, C)


class ConvLSTM(nn.Module):
    """Convolutional LSTM cell. Reference: model/submodules.py:179-235.
    Single gates conv over concat(input, hidden) producing 4C channels in
    torch chunk order [in, forget, out, cell]."""
    hidden_size: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array, state: LSTMState) -> Tuple[Array, LSTMState]:
        prev_hidden, prev_cell = state
        stacked = jnp.concatenate([x, prev_hidden], axis=-1)
        gates = nn.Conv(4 * self.hidden_size,
                        (self.kernel_size, self.kernel_size),
                        padding=_pad2d(self.kernel_size), name="Gates")(stacked)
        # the gate conv is ~45% of an E2VID forward's FLOPs; naming it
        # lets BPTT remat policies keep it instead of recomputing
        # (training/interface.py remat_policy="gates")
        gates = checkpoint_name(gates, "convlstm_gates")
        in_gate, remember_gate, out_gate, cell_gate = jnp.split(gates, 4, axis=-1)
        in_gate = nn.sigmoid(in_gate)
        remember_gate = nn.sigmoid(remember_gate)
        out_gate = nn.sigmoid(out_gate)
        cell_gate = jnp.tanh(cell_gate)
        cell = remember_gate * prev_cell + in_gate * cell_gate
        hidden = out_gate * jnp.tanh(cell)
        return hidden, (hidden, cell)

    @staticmethod
    def zero_state(batch: int, height: int, width: int, hidden: int,
                   dtype=jnp.float32) -> LSTMState:
        z = jnp.zeros((batch, height, width, hidden), dtype)
        return (z, z)


class ConvGRU(nn.Module):
    """Convolutional GRU cell. Reference: model/submodules.py:238-278.
    Three separate convs (reset/update/out), orthogonal init, zero bias."""
    hidden_size: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array, state: Array) -> Tuple[Array, Array]:
        pad = _pad2d(self.kernel_size)
        k = (self.kernel_size, self.kernel_size)
        ortho = nn.initializers.orthogonal()
        stacked = jnp.concatenate([x, state], axis=-1)
        update = nn.sigmoid(nn.Conv(self.hidden_size, k, padding=pad,
                                    kernel_init=ortho, name="update_gate")(stacked))
        reset = nn.sigmoid(nn.Conv(self.hidden_size, k, padding=pad,
                                   kernel_init=ortho, name="reset_gate")(stacked))
        out = jnp.tanh(nn.Conv(self.hidden_size, k, padding=pad,
                               kernel_init=ortho, name="out_gate")(
            jnp.concatenate([x, state * reset], axis=-1)))
        new_state = state * (1 - update) + out * update
        return new_state, new_state

    @staticmethod
    def zero_state(batch: int, height: int, width: int, hidden: int,
                   dtype=jnp.float32) -> Array:
        return jnp.zeros((batch, height, width, hidden), dtype)


class RecurrentConvLayer(nn.Module):
    """Strided conv followed by a recurrent cell.
    Reference: model/submodules.py:99-118.

    `apply_conv` / `apply_cell` expose the two halves so the UNet
    forward-split path (models/unet.py) can run the input conv
    T-batched outside the time scan and keep only the cell inside it
    (setup-based so both entry points share the same submodules; the
    param tree is unchanged: 'conv' + 'recurrent_block')."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    recurrent_block_type: str = "convlstm"
    activation: Optional[str] = "relu"
    norm: Optional[str] = None

    def setup(self):
        self.conv = ConvLayer(self.features, self.kernel_size, self.stride,
                              self.activation, self.norm)
        if self.recurrent_block_type == "convlstm":
            self.recurrent_block = ConvLSTM(self.features, 3)
        else:
            self.recurrent_block = ConvGRU(self.features, 3)

    def __call__(self, x: Array, state: Any, train: bool = False
                 ) -> Tuple[Array, Any]:
        return self.recurrent_block(self.conv(x, train=train), state)

    def apply_conv(self, x: Array, train: bool = False) -> Array:
        return self.conv(x, train=train)

    def apply_cell(self, x: Array, state: Any) -> Tuple[Array, Any]:
        return self.recurrent_block(x, state)

    def zero_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32) -> Any:
        h, w = height // self.stride, width // self.stride
        if self.recurrent_block_type == "convlstm":
            return ConvLSTM.zero_state(batch, h, w, self.features, dtype)
        return ConvGRU.zero_state(batch, h, w, self.features, dtype)


def skip_sum(x1: Array, x2: Array) -> Array:
    return x1 + x2


def skip_concat(x1: Array, x2: Array) -> Array:
    return jnp.concatenate([x1, x2], axis=-1)
