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

# Measured by THIS harness (delta method, full-sum carry, max gate):
# a chained 4096^3 bf16 matmul reads 195.5 TF/s = 99% of the v5e's
# nominal 197 TF/s bf16 peak. Round 2's "practical peak ~67-69 TF/s"
# was an artifact of its ad-hoc chain (un-cancelled per-iteration
# overhead) — see docs/PERF.md round-3 roofline revision. The script
# re-measures this calibration shape at startup (--no-calibrate skips).
PRACTICAL_PEAK = 195e12


def calibration_entry():
    import jax.numpy as jnp
    return {
        "kind": "dot_general",
        "lhs_shape": (4096, 4096), "rhs_shape": (4096, 4096),
        "lhs_dtype": "bfloat16", "rhs_dtype": "bfloat16",
        "flops": 2 * 4096 ** 3, "count": 1,
        "params": {"dimension_numbers": (((1,), (0,)), ((), ())),
                   "preferred_element_type": jnp.float32},
    }


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
    """Chained rate (FLOP/s) of one shape on the device, by the DELTA
    method: time loops running k=1 and k=9 sequentially-dependent
    copies of the op per iteration and take the rate from the
    difference. A single small op per iteration measures the loop's
    fixed per-iteration overhead, not the op (an isolated
    (10,16,16,384) conv read 1.2 ms standalone vs ~50 us in context);
    the delta cancels the fixed part — the same trick that exposed the
    relay's 33 ms dispatch overhead in bench.py.

    Two XLA optimizations must be defeated for the copies to actually
    execute (both produced "1500+ TF/s" before they were):
      * conv/dot are LINEAR, so a carry entering as `op(lhs + c)` gets
        factored into hoisted loop-invariant ops (conv(lhs) + c*conv(1));
        a where()-select gate is rewritten to arithmetic and factored
        the same way. The carry must enter through a NON-linear op:
        maximum(lhs, gate) with gate data-dependent (runtime ~-3e38, so
        numerically gated == lhs, but unprovable at compile time).
      * the carry must consume the FULL output: reducing a slice
        (out[0,0,0,:8]) lets the algebraic simplifier sink the slice
        through the conv and compute only 8 output channels per copy.
    """
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

    def make(k):
        @jax.jit
        def chained(lhs, rhs):
            def body(i, carry):
                c, acc = carry
                for _ in range(k):     # dependent: no CSE, serialized
                    gate = (c * jnp.float32(1e-38)
                            - jnp.float32(3e38)).astype(lhs.dtype)
                    out = op(jnp.maximum(lhs, gate), rhs)
                    c = jnp.sum(out, dtype=jnp.float32)
                return (c, acc + c * 1e-30)
            _, acc = jax.lax.fori_loop(0, iters, body,
                                       (jnp.float32(0), jnp.float32(0)))
            return acc
        return chained

    # size the loop so the DELTA work alone is ~350 ms even if the op
    # ran at 4e14 FLOP/s (2x nominal peak) — small ops at peak take
    # ~10 us and the relay's run-to-run noise is +-5 ms, so thousands
    # of executions are needed before the delta is signal
    iters = int(min(20000, max(iters, 0.35 / (8 * per_iter_flops / 4e14))))

    times = {}
    for k in (1, 9):
        fn = make(k)
        float(fn(lhs, rhs))                  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(lhs, rhs))              # host fetch = the only sync
            ts.append(time.perf_counter() - t0)
        times[k] = sorted(ts)[1]
    delta = times[9] - times[1]
    if delta < 0.02:
        # below ~4x the observed relay noise floor: unresolvable —
        # report None so the floor uses the practical peak (keeps the
        # floor a valid lower bound)
        return None
    return per_iter_flops / (delta / (8 * iters))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--iters", type=int, default=100,
                    help="minimum loop length; auto-raised per entry "
                         "so the k=9-vs-1 delta work is ~350 ms")
    ap.add_argument("--collect-only", action="store_true")
    ap.add_argument("--no-calibrate", action="store_true",
                    help="skip the 4096^3 peak re-measurement")
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

    peak = PRACTICAL_PEAK
    if not args.no_calibrate:
        cal = measure_entry(calibration_entry(), args.iters)
        if cal:
            peak = cal
        print(f"calibration 4096^3 bf16 matmul: "
              f"{(cal or 0) / 1e12:.1f} TF/s (tail + leak-guard peak)",
              flush=True)
    floor = (total - top_fl) / peak
    print(f"measuring top {len(top)} shapes on "
          f"{jax.devices()[0].platform} ...", flush=True)
    for e in top:
        rate = measure_entry(e, args.iters)
        if rate is None:
            rate = peak
            note = " (unresolvable: < dispatch noise; peak assumed)"
        elif rate > 1.15 * peak:
            # above the chip's own measured matmul peak: the copies are
            # not actually executing (an XLA rewrite leaked through the
            # gate) — the number would corrupt the floor's lower-bound
            # property, so refuse it
            note = (f" (!! {rate / 1e12:.0f} TF/s > practical peak: "
                    "method leak, peak assumed)")
            rate = peak
        else:
            note = ""
        contrib = e["flops"] / rate
        floor += contrib
        print(f"  {e['flops'] / 1e12:7.3f} TF x{e['count']:6.0f} "
              f"{e['kind'][:4]} {str(e['lhs_shape']):24s}"
              f"{str(e['rhs_shape']):22s} -> {rate / 1e12:5.1f} TF/s "
              f"({contrib * 1e3:6.1f} ms){note}", flush=True)
    from v2v_tpu.utils.flops import saw_while
    approx = (" [APPROXIMATE: a lax.while_loop body was counted once — "
              "unknown trip count undercounts FLOPs]" if saw_while()
              else "")
    print(f"FLOOR {name}: {floor * 1e3:.0f} ms/step "
          f"(tail at practical peak {peak / 1e12:.0f} TF/s); "
          f"compare measured ms/step from bench_full_step.py{approx}",
          flush=True)


if __name__ == "__main__":
    main()
