"""Torch checkpoint -> Flax params conversion.

Converts the reference's released .pth checkpoints (ckpt_paths/*.txt,
scripts/convert_checkpoint_from_original.py produces
`{"state_dict": ...}`) into this package's parameter pytrees, for
inference parity with the published benchmark numbers.

Layout rules:
  * Conv2d      weight (O,I,kH,kW) -> kernel (kH,kW,I,O)
  * ConvTranspose2d weight (I,O,kH,kW) -> kernel (kH,kW,O,I)
    (flax ConvTranspose(transpose_kernel=True))
  * Linear      weight (O,I) -> kernel (I,O)
  * BatchNorm   weight/bias -> scale/bias; running stats -> batch_stats
  * torch ModuleList indices `encoders.0` -> flax child `encoders_0`;
    the shared decoder stack lives under a `decoders` submodule
    (`decoders.0.conv2d` -> `decoders/decoders_0/conv2d`).

The torch prefixes `module.` (DDP) and `_orig_mod.` (torch.compile) are
stripped, mirroring convert_to_compiled (reference train.py:18-39).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _strip_wrappers(key: str) -> str:
    parts = key.split(".")
    while parts and parts[0] in ("_orig_mod", "module"):
        parts.pop(0)
    return ".".join(parts)


# torch container attributes that are ModuleLists in the reference models:
# flax names their children `{name}_{i}`.
_MODULELISTS = ("encoders", "resblocks", "DownsampleConv", "UpsampleConv",
                "layers", "bases_net", "layer1", "layer2", "layer3",
                "downsample", "mask",
                # NerNet (model/nernet/*): ValueLayer mlp, RepCNN
                # Sequential, NAM-cell Sequential conv wrappers, GCB
                # channel_add_conv Sequential
                "mlp", "cnn", "conv_x", "conv_h", "conv_m", "conv_o",
                "channel_add_conv")
# torch wrapper levels with no flax counterpart: the
# transformer_encoder.encoder / transformer_decoder.decoder nesting
# (dropped only directly inside a trans_* module — ERAFT's motion
# `encoder` keeps its name).
_DROP_TOKENS = ("encoder", "decoder")
# decoder stacks live in a _Decoders submodule whose children are
# decoders_{i} regardless of the stack's own name.
_DECODER_STACKS = ("decoders", "image_decoders", "flow_decoders",
                   "m_t_UpsampleLayer")


def _flax_path(parts: List[str]) -> List[str]:
    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _DROP_TOKENS and i > 0 and parts[i - 1].startswith("trans_"):
            i += 1
            continue
        if p == "representation" and i + 1 < len(parts):
            # NerNet Voxelization children live under flat flax names
            # `representation.quantization_layer` / `representation.ConvLayer`
            # (nernet_model.py:57).
            out.append(f"representation.{parts[i + 1]}")
            i += 2
            continue
        if (p in _MODULELISTS and i + 1 < len(parts)
                and parts[i + 1].isdigit()):
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif (p in _DECODER_STACKS and i + 1 < len(parts)
              and parts[i + 1].isdigit()):
            out.append(p)
            out.append(f"decoders_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def _set_path(tree: Dict, path: List[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_dict_to_flax(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Generic structural conversion. Returns {'params': tree}
    (+ 'batch_stats' tree if running stats present)."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for key, val in state_dict.items():
        key = _strip_wrappers(key)
        arr = np.asarray(val.detach().cpu().numpy()
                         if hasattr(val, "detach") else val)
        parts = key.split(".")
        leaf = parts[-1]
        module_path = _flax_path(parts[:-1])

        if leaf == "num_batches_tracked":
            continue
        if leaf == "compositional_coefficients":
            # DynamicConv 1x1 composition (O, I, 1, 1) -> (1, 1, I, O)
            _set_path(params, module_path + [leaf], arr.transpose(2, 3, 1, 0))
            continue
        if leaf == "in_proj_weight":     # packed torch MHA qkv (3D, D)
            _set_path(params, module_path + ["in_proj_kernel"], arr.T)
            continue
        if leaf == "in_proj_bias":
            _set_path(params, module_path + ["in_proj_bias"], arr)
            continue
        if leaf in ("running_mean", "running_var"):
            name = "mean" if leaf == "running_mean" else "var"
            _set_path(batch_stats, module_path + [name], arr)
            continue
        if leaf == "weight":
            if arr.ndim == 4:
                # one permutation covers BOTH conv flavors: Conv2d
                # (O,I,kH,kW)->(kH,kW,I,O), and ConvTranspose2d
                # (I,O,kH,kW)->(kH,kW,O,I) because flax
                # ConvTranspose(transpose_kernel=True) swaps the channel
                # roles of the kernel
                _set_path(params, module_path + ["kernel"],
                          arr.transpose(2, 3, 1, 0))
            elif arr.ndim == 2:
                _set_path(params, module_path + ["kernel"], arr.T)
            else:                                     # norm scale
                if arr.ndim == 3 and arr.shape[1:] == (1, 1):
                    arr = arr.reshape(-1)  # LayerNorm([C,1,1]) -> (C,)
                _set_path(params, module_path + ["scale"], arr)
            continue
        if leaf == "bias":
            if arr.ndim == 3 and arr.shape[1:] == (1, 1):
                arr = arr.reshape(-1)      # LayerNorm([C,1,1]) -> (C,)
            _set_path(params, module_path + ["bias"], arr)
            continue
        _set_path(params, module_path + [leaf], arr)

    _stack_eitr_streams(params)
    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _stack_eitr_streams(params: Dict[str, Any]) -> None:
    """EITR layout quirk: the torch model's three same-shape transformer
    streams (trans_encoder0/1/2, trans_decoder0/1/2 — reference
    model/eitr/u_trans.py:96-105) run as ONE nn.vmap'd module here
    (models/eitr.py), so their converted weights stack on a leading
    (3,) axis under tri_encoder / tri_decoder."""
    def stack(trees):
        if isinstance(trees[0], dict):
            return {k: stack([t[k] for t in trees]) for k in trees[0]}
        return np.stack(trees)

    for base, tri in (("trans_encoder", "tri_encoder"),
                      ("trans_decoder", "tri_decoder")):
        names = [f"{base}{i}" for i in range(3)]
        if all(n in params for n in names):
            params[tri] = stack([params.pop(n) for n in names])


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def validate_against(template: Dict[str, Any], converted: Dict[str, Any],
                     strict: bool = True) -> Dict[str, Any]:
    """Check the converted tree covers the template (shape-exact); with
    strict=False, missing leaves keep template values
    (load_state_dict(strict=False) analog, test_e2vid.py:188)."""
    tpl = {p: v for p, v in _tree_paths(template)}
    cvt = {p: v for p, v in _tree_paths(converted)}
    missing = [p for p in tpl if p not in cvt]
    extra = [p for p in cvt if p not in tpl]
    mismatched = [p for p in tpl if p in cvt
                  and tuple(np.shape(cvt[p])) != tuple(np.shape(tpl[p]))]
    if strict and (missing or mismatched):
        raise ValueError(
            f"conversion mismatch: missing={missing[:5]} "
            f"({len(missing)} total), shape-mismatch={mismatched[:5]}, "
            f"extra={extra[:5]} ({len(extra)} total)")
    # rebuild with template structure
    flat_out = {}
    for p, v in tpl.items():
        flat_out[p] = np.asarray(cvt[p]) if p in cvt and tuple(
            np.shape(cvt[p])) == tuple(np.shape(v)) else v

    def rebuild(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}
        return flat_out[prefix]

    return rebuild(template)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Read a reference checkpoint file; returns the raw state_dict."""
    import torch
    saved = torch.load(path, map_location="cpu", weights_only=False)
    return saved.get("state_dict", saved)


def convert_checkpoint(path: str, params_template: Dict[str, Any],
                       strict: bool = False) -> Dict[str, Any]:
    """One-call conversion: .pth path + init'd flax params -> loadable
    params pytree."""
    sd = load_torch_checkpoint(path)
    converted = torch_state_dict_to_flax(sd)
    return validate_against(params_template, converted, strict=strict)
