"""MXU FLOP accounting by jaxpr traversal.

XLA's HLO cost analysis counts a While/Scan body ONCE regardless of trip
count, so it undercounts any scanned program (the E2VID T=40 scan by
~40x). This counter walks the jaxpr instead: dot_general and
conv_general_dilated FLOPs from shapes, scan bodies multiplied by their
static `length`, remat/pjit/custom-grad calls recursed. It counts the
program AS AUTHORED — rematerialized recompute appears because
`jax.checkpoint` regions are re-traced into the backward jaxpr.

Usage (roofline tables, docs/PERF.md):

    flops = count_flops(jax.make_jaxpr(fn)(*args))
    # or for a jitted step:
    flops = count_flops(jitted.trace(*args).jaxpr)

Only MXU work is counted (matmul/conv multiply-adds, x2); elementwise
VPU work is not comparable against the matmul peak and is omitted.
"""
from __future__ import annotations

import math
import warnings
from typing import Any

from jax.extend import core as jex_core  # jaxpr structure access

_warned_while = False


def _warn_while() -> None:
    """One-time warning: a lax.while_loop body is counted ONCE (trip
    count unknown at trace time), so any FLOP total that includes one is
    a lower bound of unknown tightness — roofline "FLOOR"s derived from
    it must be annotated approximate (scripts/roofline_floor.py checks
    `saw_while()`)."""
    global _warned_while
    if not _warned_while:
        _warned_while = True
        warnings.warn(
            "count_flops: lax.while_loop encountered — its body is "
            "counted once (unknown trip count); the FLOP total is an "
            "approximate lower bound", stacklevel=3)


def saw_while() -> bool:
    """True if any traversal in this process met a while primitive."""
    return _warned_while


def _dot_flops(eqn) -> float:
    (contract_lhs, _), (batch_lhs, _) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval
    out = eqn.outvars[0].aval
    k = math.prod(lhs.shape[d] for d in contract_lhs)
    return 2.0 * math.prod(out.shape) * k


def _conv_flops(eqn) -> float:
    rhs = eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    kernel_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    # rhs_spec[1] is the kernel's input-feature dim — already per-group
    in_ch = rhs.shape[dn.rhs_spec[1]]
    return 2.0 * math.prod(out.shape) * kernel_spatial * in_ch


def count_flops(jaxpr: Any) -> float:
    """MXU FLOPs of a (Closed)Jaxpr, scan lengths multiplied through."""
    if hasattr(jaxpr, "jaxpr"):               # ClosedJaxpr
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * count_flops(eqn.params["jaxpr"])
        elif name == "while":
            # unknown trip count: count the body once (fori_loop with
            # static bounds lowers to scan, so this is rare here)
            _warn_while()
            total += count_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            total += max((count_flops(b) for b in eqn.params["branches"]),
                         default=0.0)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key) if eqn.params else None
                if inner is not None:
                    total += count_flops(inner)
                    break
    return total


def count_flops_by_shape(jaxpr: Any, hist: dict | None = None,
                         mult: float = 1.0) -> dict:
    """FLOP histogram keyed by (primitive, operand/result signature) —
    the roofline-attack view: which matmul/conv shapes carry the FLOPs
    (small contraction dims and small channel counts cannot fill the
    MXU's 128 lanes)."""
    if hist is None:
        hist = {}
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
            key = f"dot {lhs}x{rhs}->{eqn.outvars[0].aval.shape}"
            hist[key] = hist.get(key, 0.0) + mult * _dot_flops(eqn)
        elif name == "conv_general_dilated":
            lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
            key = f"conv {lhs}*{rhs}->{eqn.outvars[0].aval.shape}"
            hist[key] = hist.get(key, 0.0) + mult * _conv_flops(eqn)
        elif name == "scan":
            count_flops_by_shape(eqn.params["jaxpr"], hist,
                                 mult * eqn.params["length"])
        elif name == "while":
            _warn_while()
            count_flops_by_shape(eqn.params["body_jaxpr"], hist, mult)
        elif name == "cond":
            for b in eqn.params["branches"]:
                count_flops_by_shape(b, hist, mult)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key) if eqn.params else None
                if inner is not None:
                    count_flops_by_shape(inner, hist, mult)
                    break
    return hist


def collect_mxu_ops(jaxpr: Any, out: dict | None = None,
                    mult: float = 1.0) -> dict:
    """Aggregate every dot_general / conv_general_dilated in the program
    with enough of its params to REPLAY it standalone (the measured-
    floor method: microbench each unique shape on-chip, floor =
    sum(flops_i / measured_rate_i); scripts/roofline_floor.py).

    Returns {signature: {kind, lhs/rhs shape+dtype, params, flops,
    count}} with scan trip counts multiplied through."""
    if out is None:
        out = {}
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("dot_general", "conv_general_dilated"):
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            if name == "dot_general":
                keep = {"dimension_numbers": eqn.params["dimension_numbers"],
                        "preferred_element_type":
                            eqn.params.get("preferred_element_type")}
                fl = _dot_flops(eqn)
            else:
                keep = {k: eqn.params[k] for k in
                        ("window_strides", "padding", "lhs_dilation",
                         "rhs_dilation", "dimension_numbers",
                         "feature_group_count", "batch_group_count")}
                keep["preferred_element_type"] = eqn.params.get(
                    "preferred_element_type")
                fl = _conv_flops(eqn)
            sig = (name, lhs.shape, str(lhs.dtype), rhs.shape,
                   str(rhs.dtype), repr(keep))
            ent = out.setdefault(sig, {
                "kind": name, "lhs_shape": lhs.shape,
                "lhs_dtype": str(lhs.dtype), "rhs_shape": rhs.shape,
                "rhs_dtype": str(rhs.dtype), "params": keep,
                "flops": 0.0, "count": 0.0})
            ent["flops"] += mult * fl
            ent["count"] += mult
        elif name == "scan":
            collect_mxu_ops(eqn.params["jaxpr"], out,
                            mult * eqn.params["length"])
        elif name == "while":
            _warn_while()
            collect_mxu_ops(eqn.params["body_jaxpr"], out, mult)
        elif name == "cond":
            for b in eqn.params["branches"]:
                collect_mxu_ops(b, out, mult)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key) if eqn.params else None
                if inner is not None:
                    collect_mxu_ops(inner, out, mult)
                    break
    return out


def step_flops(jitted, *args, **kwargs) -> float:
    """FLOPs of a jitted function at these arguments (trace only)."""
    import jax
    return count_flops(jax.make_jaxpr(jitted)(*args, **kwargs))
