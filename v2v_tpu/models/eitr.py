"""ETNet / EITR: recurrent conv encoders + 3-scale transformer pyramid.

Flax re-design of the reference EITR (model/eitr/*): head conv -> 3
strided ConvLSTM encoders (32->64->128->256) -> per-scale tokenization to
d=256 -> 3x pre-norm transformer encoders (3 layers) + decoders (2
layers, cross-attending coarser scales) -> token-mean fusion -> upsample
conv decoders with sum skips -> 1x1 pred -> sigmoid.
Pads H,W to x8 internally (model/eitr/eitr.py:20-34).

Attention fuses into MXU matmuls; tokens are (H/8 * W/8, 256) — small
enough that full attention is the right TPU shape (no ring needed,
SURVEY.md §5 long-context note).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.pad import CropParameters
from .submodules import ConvLayer, RecurrentConvLayer, UpsampleConvLayer
from .unet import _encoder_states, UNetConfig

Array = jax.Array


def sinusoid_pos_table(n_position: int, d_hid: int) -> np.ndarray:
    """1-D sine/cosine table over token index
    (model/eitr/position_encoding.py:12-19)."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def _flash_attention_padded(aq: Array, ak: Array, av: Array,
                            dh: int) -> Array:
    """Pallas TPU flash attention on (B,h,N,dh) with padding to the
    block size; segment ids mask the padded key/value rows exactly, so
    real queries see only real keys (padded query rows are sliced off).
    Avoids materializing the N^2 logits tensor in HBM — the chunked-XLA
    eval path is bandwidth-bound on exactly that tensor."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    b, h, nq, _ = aq.shape
    nk = ak.shape[2]
    blk = 1024
    npq = nq + (-nq) % blk
    npk = nk + (-nk) % blk
    qp = jnp.pad(aq, ((0, 0), (0, 0), (0, npq - nq), (0, 0)))
    kp = jnp.pad(ak, ((0, 0), (0, 0), (0, npk - nk), (0, 0)))
    vp = jnp.pad(av, ((0, 0), (0, 0), (0, npk - nk), (0, 0)))
    qseg = jnp.broadcast_to(
        (jnp.arange(npq) < nq).astype(jnp.int32)[None], (b, npq))
    kseg = jnp.broadcast_to(
        (jnp.arange(npk) < nk).astype(jnp.int32)[None], (b, npk))
    bq = min(blk, npq)
    bk = min(blk, npk)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_q_dkv=bq, block_k_dkv=bk,
                    block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk)
    out = flash_attention(qp, kp, vp, segment_ids=SegmentIds(q=qseg, kv=kseg),
                          sm_scale=1.0 / float(np.sqrt(dh)), block_sizes=bs)
    return out[:, :, :nq]


class MultiheadAttention(nn.Module):
    """torch-compatible MHA: packed qkv projection + out projection.
    Parameter names match the converter (in_proj / out_proj)."""
    d_model: int
    nhead: int
    dropout: float = 0.1
    chunk_threshold: int = 4096     # chunk eval attention beyond this

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array,
                 train: bool = False) -> Array:
        d, h = self.d_model, self.nhead
        dh = d // h
        # packed qkv projection (torch in_proj layout: output rows
        # [q; k; v]); project each input with its slice.
        kernel = self.param("in_proj_kernel",
                            nn.initializers.xavier_uniform(), (d, 3 * d))
        bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        pq = q @ kernel[:, :d] + bias[:d]
        pk = k @ kernel[:, d:2 * d] + bias[d:2 * d]
        pv = v @ kernel[:, 2 * d:] + bias[2 * d:]

        def heads(x):   # (B,N,D) -> (B,h,N,dh)
            b, nn_, _ = x.shape
            return x.reshape(b, nn_, h, dh).transpose(0, 2, 1, 3)

        aq, ak, av = heads(pq), heads(pk), heads(pv)
        n_q = aq.shape[2]
        if not train and n_q > self.chunk_threshold:
            # big token counts (720p EVAID eval: 90x160 = 14400 tokens ->
            # a 14400^2 x 8 logits tensor is ~6.6 GB). On TPU use the
            # Pallas flash kernel (never materializes the logits: ~10ms
            # vs ~25ms for chunked XLA at 14400 tokens f32); elsewhere
            # fall back to sequential query blocks.
            if jax.default_backend() not in ("cpu", "gpu"):
                out = _flash_attention_padded(aq, ak, av, dh)
            else:
                blk = 2048
                pad = (-n_q) % blk
                aq_p = jnp.pad(aq, ((0, 0), (0, 0), (0, pad), (0, 0)))
                qb = aq_p.reshape(aq.shape[0], h, -1, blk, dh)

                def one(q):
                    logits = jnp.einsum("bhnd,bhmd->bhnm", q, ak,
                                        preferred_element_type=jnp.float32
                                        ) / np.sqrt(dh)
                    return jnp.einsum("bhnm,bhmd->bhnd",
                                      jax.nn.softmax(logits, axis=-1), av)

                out = jax.lax.map(one, jnp.moveaxis(qb, 2, 0))
                out = jnp.moveaxis(out, 0, 2).reshape(
                    aq.shape[0], h, -1, dh)[:, :, :n_q]
        else:
            logits = jnp.einsum("bhnd,bhmd->bhnm", aq, ak,
                                preferred_element_type=jnp.float32
                                ) / np.sqrt(dh)
            # logits/softmax stay f32 (stability); the value contraction
            # returns to the compute dtype — otherwise one f32 softmax
            # promotes every downstream matmul under bf16 training
            attn = jax.nn.softmax(logits, axis=-1).astype(av.dtype)
            if train and self.dropout > 0:
                attn = nn.Dropout(self.dropout, deterministic=False)(attn)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, av)
        b, _, n_, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n_, d)
        return nn.Dense(d, name="out_proj")(out)


class EncoderLayer(nn.Module):
    """Pre-norm self-attention + FFN
    (model/eitr/transformer_encoder.py:48-76)."""
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src: Array, train: bool = False) -> Array:
        q = nn.LayerNorm(name="norm1")(src)
        src1 = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  name="self_attn")(q, q, q, train)
        src2 = src + _drop(src1, self.dropout, train)
        x = nn.LayerNorm(name="norm2")(src2)
        x = nn.Dense(self.dim_feedforward, name="linear1")(x)
        x = _drop(nn.relu(x), self.dropout, train)
        x = nn.Dense(self.d_model, name="linear2")(x)
        return src2 + _drop(x, self.dropout, train)


class DecoderLayer(nn.Module):
    """Pre-norm self + cross attention + FFN
    (model/eitr/transformer_decoder.py:44-82)."""
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt: Array, memory: Array,
                 train: bool = False) -> Array:
        q = nn.LayerNorm(name="norm1")(tgt)
        tgt1 = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  name="self_attn")(q, q, q, train)
        tgt2 = tgt + _drop(tgt1, self.dropout, train)
        q = nn.LayerNorm(name="norm21")(tgt2)
        kv = nn.LayerNorm(name="norm22")(memory)
        tgt3 = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  name="cross_attn")(q, kv, kv, train)
        tgt4 = tgt2 + _drop(tgt3, self.dropout, train)
        x = nn.LayerNorm(name="norm3")(tgt4)
        x = nn.Dense(self.dim_feedforward, name="linear1")(x)
        x = _drop(nn.relu(x), self.dropout, train)
        x = nn.Dense(self.d_model, name="linear2")(x)
        return tgt4 + _drop(x, self.dropout, train)


def _drop(x, rate, train):
    return nn.Dropout(rate, deterministic=not train)(x) if train else x


class TransformerEncoder(nn.Module):
    num_layers: int = 3
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src: Array, pos: Array, train: bool = False) -> Array:
        x = src + pos
        for i in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                             self.dropout, name=f"layers_{i}")(x, train)
        return x


class TransformerDecoder(nn.Module):
    num_layers: int = 2
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt: Array, memory: Array,
                 train: bool = False) -> Array:
        x = tgt
        for i in range(self.num_layers):
            x = DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                             self.dropout, name=f"layers_{i}")(x, memory, train)
        return x


class EITR(nn.Module):
    """Reference target `model.eitr.eitr.EITR` (eitr_kwargs: num_bins,
    norm). State: 3 ConvLSTM states.

    Split into pre / spine_step / tail like the recurrent UNets
    (models/unet.py _RecurrentUNetBase) so the task interface can hoist
    the temporally-independent work — here that includes the ENTIRE
    transformer pyramid and upsample decoder, which at the production
    train shape (B=6) is VPU-bound on tiny (6,256,256) token tensors;
    T-batched it runs once on (6*T,256,256). __call__ composes the three
    (single-step semantics and the torch parity tests unchanged).
    Setup-style with the attribute names matching the reference param
    tree (head / DownsampleConv_i / split1,2 / tri_* / UpsampleConv_i /
    pred)."""
    eitr_kwargs: Dict[str, Any]

    def setup(self):
        norm = self.eitr_kwargs.get("norm")
        if norm in ("none", "None", ""):
            norm = None
        self.head = ConvLayer(32, 5, 1, norm=norm)
        self.DownsampleConv_0 = RecurrentConvLayer(64, 5, 2, "convlstm",
                                                   norm=norm)
        self.DownsampleConv_1 = RecurrentConvLayer(128, 5, 2, "convlstm",
                                                   norm=norm)
        self.DownsampleConv_2 = RecurrentConvLayer(256, 5, 2, "convlstm",
                                                   norm=norm)
        self.split1 = nn.Conv(256, (2, 2), strides=(2, 2), padding="VALID")
        self.split2 = nn.Conv(256, (4, 4), strides=(4, 4), padding="VALID")
        # The reference runs its three same-shape encoder/decoder streams
        # sequentially (u_trans.py:96-105) — a CUDA-stream artifact. On
        # TPU the three streams are one BATCHED computation: nn.vmap
        # stacks their params on a leading (3,) axis, so every projection
        # / attention / FFN matmul of the transformer becomes one
        # 3x-larger batched dot instead of three small dispatches (the
        # roofline gap in docs/PERF.md). The torch converter stacks
        # trans_{en,de}coder{0,1,2} weights into tri_{en,de}coder
        # (models/convert.py:_stack_eitr_streams) — numerics unchanged.
        tri_enc = nn.vmap(TransformerEncoder,
                          in_axes=(0, None, None), out_axes=0,
                          variable_axes={"params": 0},
                          split_rngs={"params": True, "dropout": True})
        tri_dec = nn.vmap(TransformerDecoder,
                          in_axes=(0, 0, None), out_axes=0,
                          variable_axes={"params": 0},
                          split_rngs={"params": True, "dropout": True})
        # reference fixes dropout at 0.1 (transformer_encoder.py:52);
        # the kwarg exists for deterministic tests (dropout: 0)
        drop = float(self.eitr_kwargs.get("dropout", 0.1))
        self.tri_encoder = tri_enc(3, dropout=drop)
        self.tri_decoder = tri_dec(2, dropout=drop)
        self.UpsampleConv_0 = UpsampleConvLayer(128, 5, norm=norm)
        self.UpsampleConv_1 = UpsampleConvLayer(64, 5, norm=norm)
        self.UpsampleConv_2 = UpsampleConvLayer(32, 5, norm=norm)
        self.pred = ConvLayer(1, 1, activation=None, norm=norm)

    def pre(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
        """Pad to x8 + head conv + encoder-0's input conv (all
        temporally independent)."""
        b, h_in, w_in, _ = x.shape
        if (h_in % 8) or (w_in % 8):
            x = CropParameters(w_in, h_in, 3).pad(x)
        h = self.head(x, train=train)
        return h, self.DownsampleConv_0.apply_conv(h, train=train)

    def spine_step(self, pre0: Array, states: List[Any],
                   train: bool = False
                   ) -> Tuple[List[Array], List[Any]]:
        """The recurrent spine: encoder-0 cell + encoders 1-2."""
        x, s0 = self.DownsampleConv_0.apply_cell(pre0, states[0])
        blocks, new_states = [x], [s0]
        for enc, st in zip((self.DownsampleConv_1, self.DownsampleConv_2),
                           states[1:]):
            x, s = enc(x, st, train=train)
            blocks.append(x)
            new_states.append(s)
        return blocks, new_states

    def tail(self, head: Array, blocks: List[Any], train: bool = False,
             out_hw: Tuple[int, int] = None) -> Dict[str, Array]:
        """Tokenization + transformer pyramid + upsample decoder + pred
        (temporally independent given the per-step encoder outputs).
        `out_hw` crops back when pre() padded (h,w not x8)."""
        b, h8, w8, d = blocks[-1].shape
        h, w = h8 * 8, w8 * 8
        # scale 0: coarsest feature map, 1x1 tokens; scales 1-2:
        # 2x2 / 4x4 patch convs on the finer maps
        words0 = blocks[-1].reshape(b, -1, d)
        words1 = self.split1(blocks[-2]).reshape(b, -1, d)
        words2 = self.split2(blocks[-3]).reshape(b, -1, d)

        n_tok = words0.shape[1]
        pos = jnp.asarray(sinusoid_pos_table(n_tok, d))[None]   # f32

        # The transformer runs in f32 DELIBERATELY, whatever the compute
        # dtype: it is VPU/relayout-bound (LayerNorm/softmax/dropout
        # chains over small (B,256,256) tokens), and bf16 there measured
        # 1220 ms/step vs 797 ms for f32 at the production train shape —
        # the converts around every f32-accumulating op cost far more
        # than the tiny matmuls save (docs/PERF.md round-3 ETNet table).
        # The conv encoder/decoder stays in the compute dtype (bf16).
        words = jnp.stack([words0, words1, words2]).astype(jnp.float32)
        pos = pos.astype(jnp.float32)
        hs_enc = self.tri_encoder(words, pos, train)
        hs0, hs1 = hs_enc[0], hs_enc[1]
        memory = jnp.stack([hs0, hs0, hs1])
        hc = self.tri_decoder(hs_enc, memory, train)
        hs = ((jnp.sum(hs_enc, axis=0) + jnp.sum(hc, axis=0)) / 6.0
              ).astype(words0.dtype)
        hs = hs.reshape(b, h // 8, w // 8, d)

        # skips: blocks[2] (256ch), blocks[1] (128), blocks[0] (64)
        # (reference u_trans.py:107-108)
        for i, up in enumerate((self.UpsampleConv_0, self.UpsampleConv_1,
                                self.UpsampleConv_2)):
            hs = up(hs + blocks[2 - i], train=train)
        img = self.pred(hs + head, train=train)
        img = nn.sigmoid(img)
        if out_hw is not None and (out_hw[0] % 8 or out_hw[1] % 8):
            img = CropParameters(out_hw[1], out_hw[0], 3).crop(img)
        return {"image": img}

    def __call__(self, x: Array, state: List[Any], train: bool = False
                 ) -> Tuple[Dict[str, Array], List[Any]]:
        h_in, w_in = x.shape[1:3]
        head, pre0 = self.pre(x, train=train)
        blocks, new_states = self.spine_step(pre0, state, train=train)
        out = self.tail(head, blocks, train=train, out_hw=(h_in, w_in))
        return out, new_states

    @nn.nowrap
    def init_state(self, batch: int, height: int, width: int,
                   dtype=jnp.float32) -> List[Any]:
        height = -(-height // 8) * 8
        width = -(-width // 8) * 8
        cfg = UNetConfig(base_num_channels=32, num_encoders=3,
                         recurrent_block_type="convlstm")
        return _encoder_states(cfg, batch, height, width, dtype)
