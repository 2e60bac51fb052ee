"""Measured-floor analysis for a train config (docs/PERF.md roofline).

Method: trace the config's fused train step (no compile), aggregate
every dot_general / conv_general_dilated with scan trip counts
multiplied through (v2v_tpu/utils/flops.py:collect_mxu_ops), then
REPLAY the top-K shapes standalone on-chip — each as a device-chained
fori_loop with a forced data dependency (the only honest timing on the
axon relay, see docs/PERF.md). The config's floor is

    T_floor = sum_i flops_i / rate_i

with measured rates for the top-K entries (covering ~95+% of FLOPs)
and the practical matmul peak for the tail — so T_floor is a true
lower bound: the step cannot run faster than its own matmuls run in
isolation. gap = measured_step / T_floor.

Usage (TPU):
    timeout 1500 python -u scripts/roofline_floor.py \
        --config configs/train_v2v_etnet_10k.yaml [--top 12] [--iters 30]
CPU dry form (collection + table only, no measurement):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -u scripts/roofline_floor.py --config ... --collect-only
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PRACTICAL_PEAK = 67e12      # measured chained 4096^3 bf16 (docs/PERF.md)


def replay_fn(ent):
    """Build op(lhs, rhs) for a collected entry."""
    import jax.numpy as jnp
    from jax import lax
    p = ent["params"]
    if ent["kind"] == "dot_general":
        def op(lhs, rhs):
            return lax.dot_general(
                lhs, rhs, p["dimension_numbers"],
                preferred_element_type=p["preferred_element_type"])
    else:
        def op(lhs, rhs):
            return lax.conv_general_dilated(
                lhs, rhs, p["window_strides"], p["padding"],
                lhs_dilation=p["lhs_dilation"],
                rhs_dilation=p["rhs_dilation"],
                dimension_numbers=p["dimension_numbers"],
                feature_group_count=p["feature_group_count"],
                batch_group_count=p["batch_group_count"],
                preferred_element_type=p["preferred_element_type"])
    return op


def measure_entry(ent, iters):
    """Median chained rate (FLOP/s) of one shape on the device."""
    import jax
    import jax.numpy as jnp

    lhs = jnp.asarray(
        np.random.RandomState(0).randn(*ent["lhs_shape"]) * 0.1,
        dtype=ent["lhs_dtype"])
    rhs = jnp.asarray(
        np.random.RandomState(1).randn(*ent["rhs_shape"]) * 0.1,
        dtype=ent["rhs_dtype"])
    op = replay_fn(ent)
    per_iter_flops = ent["flops"] / ent["count"]

    @jax.jit
    def chained(lhs, rhs):
        def body(i, carry):
            c, acc = carry
            out = op(lhs + c.astype(lhs.dtype), rhs)
            s = jnp.sum(out.reshape(-1)[:8]).astype(jnp.float32)
            return (s * 1e-20, acc + s)
        _, acc = jax.lax.fori_loop(0, iters, body,
                                   (jnp.float32(0), jnp.float32(0)))
        return acc

    float(chained(lhs, rhs))                 # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(lhs, rhs))             # host fetch = the only sync
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] / iters
    return per_iter_flops / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--collect-only", action="store_true")
    ap.add_argument("--lpips-remat", default="full")
    ap.add_argument("--remat-policy", default="full")
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--flow", default=None)
    args = ap.parse_args()

    from bench_full_step import build
    import jax
    import jax.numpy as jnp
    from v2v_tpu.utils.flops import collect_mxu_ops

    (name, step, params, opt_state, batch, key, step_kwargs,
     (b, t, h, w)) = build(args)
    hb = jnp.float32(step_kwargs.get("hyper_beta", 0.0))
    print("tracing ...", flush=True)
    jxp = jax.make_jaxpr(step._jitted)(params, opt_state, batch, key, hb)
    ops = collect_mxu_ops(jxp)
    total = sum(e["flops"] for e in ops.values())
    ranked = sorted(ops.values(), key=lambda e: -e["flops"])
    top = ranked[:args.top]
    top_fl = sum(e["flops"] for e in top)
    print(f"{name}: {total / 1e12:.3f} TF total over {len(ops)} unique "
          f"MXU shapes; top {len(top)} cover {top_fl / total * 100:.1f}%",
          flush=True)
    by_dtype = {}
    for e in ops.values():
        by_dtype[e["lhs_dtype"]] = by_dtype.get(e["lhs_dtype"], 0.0) \
            + e["flops"]
    print("  dtype census: " + ", ".join(
        f"{k} {v / total * 100:.1f}%" for k, v in
        sorted(by_dtype.items(), key=lambda kv: -kv[1])) +
        "  (f32 runs the MXU at half rate — every f32 share must be "
        "deliberate, e.g. ETNet's VPU-bound transformer; PERF.md)",
        flush=True)
    if args.collect_only:
        for e in top:
            print(f"  {e['flops'] / 1e12:7.3f} TF x{e['count']:6.0f} "
                  f"{e['kind'][:4]} {e['lhs_shape']}·{e['rhs_shape']} "
                  f"{e['lhs_dtype']}", flush=True)
        return

    floor = (total - top_fl) / PRACTICAL_PEAK
    print(f"measuring top {len(top)} shapes on "
          f"{jax.devices()[0].platform} ...", flush=True)
    for e in top:
        rate, dt = measure_entry(e, args.iters)
        contrib = e["flops"] / rate
        floor += contrib
        print(f"  {e['flops'] / 1e12:7.3f} TF x{e['count']:6.0f} "
              f"{e['kind'][:4]} {str(e['lhs_shape']):24s}"
              f"{str(e['rhs_shape']):22s} -> {rate / 1e12:5.1f} TF/s "
              f"({contrib * 1e3:6.1f} ms)", flush=True)
    print(f"FLOOR {name}: {floor * 1e3:.0f} ms/step "
          f"(tail at practical peak {PRACTICAL_PEAK / 1e12:.0f} TF/s); "
          f"compare measured ms/step from bench_full_step.py", flush=True)


if __name__ == "__main__":
    main()
