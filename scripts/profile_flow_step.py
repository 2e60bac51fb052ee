"""Per-block TPU floor measurement for the FLOW train configs
(train_v2v_eraft_10k / train_v2v_evflow_10k) — the flagship's
measured-floor methodology applied to the two configs whose roofline gap
(~35-40% of the chip) was previously explained by narrative only
(docs/PERF.md round-3 table; round-3 verdict weak #3).

Method: each block of the step is timed standalone with the
device-chained discipline (lax.fori_loop with a forced data dependency,
one dispatch, host-scalar sync — host loops lie on the axon relay),
then multiplied by its executions per step INCLUDING the scan-remat
recompute (a rematted block runs fwd twice + bwd once per step):

    contribution = n_exec * (t_fwd + t_fwd_bwd)   [rematted blocks]
                   n_exec * t_fwd                 [fwd-only blocks]

and the sum is compared against the measured full step
(scripts/bench_full_step.py --config ...). A table totaling >=90% of
the step replaces the "pipeline fill between the convs" narrative with
numbers.

Usage (TPU; eraft compiles are slow — bound generously):
    timeout 1800 python -u scripts/profile_flow_step.py eraft
    timeout 1200 python -u scripts/profile_flow_step.py evflow
CPU smoke: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -u scripts/profile_flow_step.py eraft --smoke
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DTYPE = jnp.bfloat16


def timed_chain(body, x0, iters, reps=3):
    """Median seconds per body() execution: fori_loop-chained, one
    dispatch, host-scalar sync."""
    def run(x):
        def it(i, c):
            return body(c, i)
        return jax.lax.fori_loop(0, iters, it, x)

    fn = jax.jit(run)
    out = fn(x0)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())   # compile+sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x0)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / iters


def _perturb(x, i):
    return x + (1e-6 * i).astype(x.dtype) if jnp.issubdtype(
        x.dtype, jnp.floating) else x


def _row(rows, item):
    rows.append(item)
    print(f"  [row] {item[0]:<52s} {item[1] * 1e3:9.2f} ms", flush=True)


def profile_eraft(smoke, iters, only=None):
    from v2v_tpu.models.eraft import (ERAFT, convex_upsample,
                                      correlation_pyramid,
                                      forward_interpolate, lookup_pyramid)
    from v2v_tpu.training import raft

    b, t, h, w, bins = (2, 3, 64, 64, 5) if smoke else (10, 40, 128, 128, 5)
    n_iters = 12
    model = ERAFT(config={"subtype": "warm_start"}, n_first_channels=bins,
                  iters=n_iters)
    state0 = model.init_state(b, h, w)
    key = jax.random.PRNGKey(0)
    vox = jax.random.normal(key, (b, h, w, bins))
    params = model.init(key, vox, vox, state0)
    # bf16 compute cast exactly as FlowModelInterface._cast_compute
    cast = (lambda x: x.astype(DTYPE)
            if jnp.issubdtype(x.dtype, jnp.floating) else x)
    cparams = dict(params)
    cparams["params"] = jax.tree.map(cast, params["params"])

    h8, w8 = h // 8, w // 8
    rows = []
    # `only` selects row subsets ("pair", "fnet", or "pair,fnet") —
    # round 5's close_eraft_floor.py measures ONLY the scan
    # constituents in the same session as the full step
    want = set(only.split(",")) if only else None

    # --- fnet encode: T+1 voxels per step; checkpointed (fwd x2 + bwd)
    vox_b = jax.random.normal(key, (b, h, w, bins), DTYPE)

    if want is not None and "pair" in want:
        # One FULL pair step as XLA actually schedules it: correlation
        # pyramid + cnet context + the 12 python-UNROLLED refinement
        # iterations + convex upsample + warm-start splat
        # (models/eraft.py:step_with_fmaps — the train scan body minus
        # the fnet encode). The isolated per-op rows (--only blocks)
        # serialize latency-bound 16^2 ops behind a fori_loop data
        # dependency; the real unrolled program overlaps them, so the
        # pair step is the honest scheduling unit for the floor table.
        fmap1 = jax.random.normal(key, (b, h8, w8, 256), DTYPE)
        fmap2 = jax.random.normal(jax.random.PRNGKey(1),
                                  (b, h8, w8, 256), DTYPE)
        state = jnp.zeros((b, h8, w8, 2), jnp.float32)

        def pair_fwd(f2, i):
            (out, ns), _ = model.apply(
                cparams, fmap1, _perturb(f2, i), vox_b, state,
                method="step_with_fmaps", train=True,
                mutable=["batch_stats"])
            return f2 + 1e-6 * (out["flow"].astype(jnp.float32).mean()
                                + ns.mean()).astype(f2.dtype)

        t_pair = timed_chain(pair_fwd, fmap2, iters)
        _row(rows, (f"pair step fwd (x{t})", t * t_pair))

        def pair_fb(f2, i):
            def lf(ff):
                (out, ns), _ = model.apply(
                    cparams, fmap1, ff, vox_b, state,
                    method="step_with_fmaps", train=True,
                    mutable=["batch_stats"])
                return (out["flow"].astype(jnp.float32).mean()
                        + ns.mean())
            val, g = jax.value_and_grad(lf)(_perturb(f2, i))
            return f2 + 1e-6 * g.astype(f2.dtype) \
                + 1e-6 * val.astype(f2.dtype)

        t_pair_fb = timed_chain(pair_fb, fmap2, max(2, iters // 2))
        _row(rows, (f"pair step fwd+bwd incl fwd (x{t} remat)",
                     t * t_pair_fb))
        _row(rows, (f"pair scan contribution (T={t}: fwd + fwd+bwd)",
                     t * (t_pair + t_pair_fb)))
        if want == {"pair"}:
            return rows

    def enc_fwd(v, i):
        out = model.apply(cparams, _perturb(v, i), method="encode")
        return v + 1e-6 * out.astype(DTYPE).mean()

    t_enc = timed_chain(enc_fwd, vox_b, iters)

    def enc_fb(v, i):
        def lf(vv):
            return model.apply(cparams, vv,
                               method="encode").astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(_perturb(v, i))
        return v + 1e-6 * g.astype(v.dtype) + 1e-6 * val.astype(v.dtype)

    t_enc_fb = timed_chain(enc_fb, vox_b, max(2, iters // 2))
    _row(rows, ("fnet encode (x%d fwd + x%d remat fwd+bwd)"
                 % (t + 1, t + 1),
                 (t + 1) * (t_enc + t_enc_fb)))
    if want is not None:
        return rows          # subset mode covers only pair/fnet

    # --- cnet context: once per pair, rematted
    def cnet_apply(v):
        img = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, 0)))
        return model.apply(cparams, img, method=lambda m, x: m.cnet(x))

    def cnet_fwd(v, i):
        out = cnet_apply(_perturb(v, i))
        return v + 1e-6 * out.astype(DTYPE).mean()

    t_cnet = timed_chain(cnet_fwd, vox_b, iters)

    def cnet_fb(v, i):
        def lf(vv):
            return cnet_apply(vv).astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(_perturb(v, i))
        return v + 1e-6 * g.astype(v.dtype) + 1e-6 * val.astype(v.dtype)

    t_cnet_fb = timed_chain(cnet_fb, vox_b, max(2, iters // 2))
    _row(rows, (f"cnet context (x{t} fwd + x{t} remat fwd+bwd)",
                 t * (t_cnet + t_cnet_fb)))

    # --- correlation pyramid: once per pair, rematted
    fmap = jax.random.normal(key, (b, h8, w8, 256), DTYPE)

    def corr_fwd(f, i):
        pyr = correlation_pyramid(_perturb(f, i), f)
        return f + 1e-6 * pyr[0].astype(DTYPE).mean()

    t_corr = timed_chain(corr_fwd, fmap, iters)

    def corr_fb(f, i):
        def lf(ff):
            pyr = correlation_pyramid(ff, ff)
            return sum(p.astype(jnp.float32).mean() for p in pyr)
        val, g = jax.value_and_grad(lf)(_perturb(f, i))
        return f + 1e-6 * g.astype(f.dtype) + 1e-6 * val.astype(f.dtype)

    t_corr_fb = timed_chain(corr_fb, fmap, max(2, iters // 2))
    _row(rows, (f"correlation pyramid (x{t} fwd + x{t} fwd+bwd)",
                 t * (t_corr + t_corr_fb)))

    # --- lookup_pyramid: 12 per pair
    pyramid = correlation_pyramid(fmap, fmap)
    coords = jnp.zeros((b, h8, w8, 2), jnp.float32) + \
        jnp.stack(jnp.meshgrid(jnp.arange(w8, dtype=jnp.float32),
                               jnp.arange(h8, dtype=jnp.float32))[::1],
                  axis=-1)

    def lk_fwd(c, i):
        v = lookup_pyramid(pyramid, _perturb(c, i))
        return c + 1e-6 * v.astype(jnp.float32).mean()

    t_lk = timed_chain(lk_fwd, coords, iters)

    def lk_fb(c, i):
        def lf(cc):
            return lookup_pyramid(pyramid, cc).astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(_perturb(c, i))
        return c + 1e-6 * g + 1e-6 * val

    t_lk_fb = timed_chain(lk_fb, coords, max(2, iters // 2))
    _row(rows, (f"corr lookup (x{t * n_iters} fwd + fwd+bwd)",
                 t * n_iters * (t_lk + t_lk_fb)))

    # --- update block (motion encoder + SepConvGRU + flow head + mask):
    #     12 per pair
    net = jax.random.normal(key, (b, h8, w8, 128), DTYPE)
    inp = jax.random.normal(key, (b, h8, w8, 128), DTYPE)
    corr = jax.random.normal(key, (b, h8, w8, 4 * 81), DTYPE)
    flow = jax.random.normal(key, (b, h8, w8, 2), DTYPE)

    def ub_apply(netv, corrv):
        return model.apply(
            cparams, netv, inp, corrv, flow,
            method=lambda m, n_, i_, c_, f_: m.update_block(n_, i_, c_, f_))

    def ub_fwd(n_, i):
        nn2, mask, delta = ub_apply(_perturb(n_, i), corr)
        return nn2 + 1e-6 * (mask.astype(DTYPE).mean()
                             + delta.astype(DTYPE).mean())

    t_ub = timed_chain(ub_fwd, net, iters)

    def ub_fb(n_, i):
        def lf(nv):
            nn2, mask, delta = ub_apply(nv, corr)
            return (nn2.astype(jnp.float32).mean()
                    + mask.astype(jnp.float32).mean()
                    + delta.astype(jnp.float32).mean())
        val, g = jax.value_and_grad(lf)(_perturb(n_, i))
        return n_ + 1e-6 * g.astype(n_.dtype) + 1e-6 * val.astype(n_.dtype)

    t_ub_fb = timed_chain(ub_fb, net, max(2, iters // 2))
    _row(rows, (f"update block (x{t * n_iters} fwd + fwd+bwd)",
                 t * n_iters * (t_ub + t_ub_fb)))

    # --- convex upsample + warm-start splat: once per pair
    mask = jax.random.normal(key, (b, h8, w8, 64 * 9), DTYPE)
    flow_f32 = flow.astype(jnp.float32)

    def up_fwd(f_, i):
        up = convex_upsample(_perturb(f_, i), mask)
        sp = forward_interpolate(f_)
        return f_ + 1e-6 * (up.astype(jnp.float32).mean()
                            + sp.mean()).astype(f_.dtype)

    t_up = timed_chain(up_fwd, flow_f32, iters)

    def up_fb(f_, i):
        def lf(fv):
            return convex_upsample(fv, mask).astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(_perturb(f_, i))
        return f_ + 1e-6 * g + 1e-6 * val

    t_up_fb = timed_chain(up_fb, flow_f32, max(2, iters // 2))
    _row(rows, (f"upsample+splat (x{t} fwd + fwd+bwd)",
                 t * (t_up + t_up_fb)))

    # --- RAFT-large teacher: fwd only (stop-gradient pseudo-GT)
    raft.seed_random_teacher("raft_large", 12)
    frames = jax.random.uniform(key, (b, t + 1, h, w, 1))

    def teacher_fwd(fr, i):
        fl = raft.raft_flow("raft_large", _perturb(fr, i), 1,
                            num_flow_updates=12)
        return fr + 1e-6 * fl.mean().astype(fr.dtype)

    t_teacher = timed_chain(teacher_fwd, frames, max(2, iters // 10))
    _row(rows, ("RAFT-large teacher (fwd, %d pairs)" % t, t_teacher))

    # --- simulator (fwd only; events carry no param gradients)
    from v2v_tpu.ops.voxel import SimConfig
    from v2v_tpu.training.steps import synthesize_batch
    n_frames = (t + 1) * 5 + 1
    video = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (b, n_frames, h, w)), jnp.uint8)
    keys2 = jnp.stack([jax.random.PRNGKey(3)] * b).astype(jnp.uint32)

    def sim_fwd(s, i):
        ev, gt = synthesize_batch(video, keys2 + i.astype(jnp.uint32),
                                  SimConfig(), 5, 1, extra_frame=True,
                                  extra_evs=True)
        return s + 1e-6 * (ev.astype(jnp.float32).mean() + gt.mean())

    t_sim = timed_chain(sim_fwd, jnp.float32(0.0), max(2, iters // 10))
    _row(rows, ("simulator (fwd)", t_sim))

    return rows


def profile_evflow(smoke, iters):
    from v2v_tpu.models.model import EVFlowNet
    from v2v_tpu.training import raft

    b, t, h, w, bins = (2, 3, 64, 64, 5) if smoke else (10, 40, 128, 128, 5)
    kwargs = {"num_bins": bins, "base_num_channels": 32, "num_encoders": 4,
              "num_residual_blocks": 2}
    model = EVFlowNet(unet_kwargs=kwargs)
    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((b, h, w, bins))
    params = model.init(key, x1, ())
    cast = (lambda a: a.astype(DTYPE)
            if jnp.issubdtype(a.dtype, jnp.floating) else a)
    cparams = dict(params)
    cparams["params"] = jax.tree.map(cast, params["params"])

    rows = []
    # --- the batched B*T forward (scan_split path) fwd and fwd+bwd
    flat = jax.random.normal(key, (b * t, h, w, bins), DTYPE)

    def fwd(v, i):
        out, _ = model.apply(cparams, _perturb(v, i), ())
        return v + 1e-6 * out["flow"].astype(DTYPE).mean()

    t_fwd = timed_chain(fwd, flat, max(2, iters // 10))

    def fb(v, i):
        def lf(vv):
            out, _ = model.apply(cparams, vv, ())
            return out["flow"].astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(_perturb(v, i))
        return v + 1e-6 * g.astype(v.dtype) + 1e-6 * val.astype(v.dtype)

    t_fb = timed_chain(fb, flat, max(2, iters // 10))
    _row(rows, (f"EVFlowNet B*T={b * t} batched fwd", t_fwd))
    _row(rows, ("EVFlowNet fwd+bwd (incl. fwd)", t_fb))

    # --- RAFT-large teacher
    raft.seed_random_teacher("raft_large", 12)
    frames = jax.random.uniform(key, (b, t + 1, h, w, 1))

    def teacher_fwd(fr, i):
        fl = raft.raft_flow("raft_large", _perturb(fr, i), 1,
                            num_flow_updates=12)
        return fr + 1e-6 * fl.mean().astype(fr.dtype)

    t_teacher = timed_chain(teacher_fwd, frames, max(2, iters // 10))
    _row(rows, (f"RAFT-large teacher (fwd, {t} pairs)", t_teacher))

    # --- simulator
    from v2v_tpu.ops.voxel import SimConfig
    from v2v_tpu.training.steps import synthesize_batch
    n_frames = t * 5 + 1
    video = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (b, n_frames, h, w)), jnp.uint8)
    keys2 = jnp.stack([jax.random.PRNGKey(3)] * b).astype(jnp.uint32)

    def sim_fwd(s, i):
        ev, gt = synthesize_batch(video, keys2 + i.astype(jnp.uint32),
                                  SimConfig(), 5, 1, extra_frame=True)
        return s + 1e-6 * (ev.astype(jnp.float32).mean() + gt.mean())

    t_sim = timed_chain(sim_fwd, jnp.float32(0.0), max(2, iters // 10))
    _row(rows, ("simulator (fwd)", t_sim))
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("family", choices=["eraft", "evflow"])
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--iters", type=int, default=20,
                    help="chained iterations per block measurement")
    ap.add_argument("--only", choices=["pair", "fnet", "pair,fnet"],
                    default=None,
                    help="eraft: measure only these row subsets (the "
                         "pair step is the honest scheduling unit; "
                         "close_eraft_floor.py uses pair,fnet)")
    args = ap.parse_args()

    if args.family == "eraft":
        rows = profile_eraft(args.smoke, args.iters, only=args.only)
    else:
        rows = profile_evflow(args.smoke, args.iters)
    total = sum(sec for _, sec in rows)
    print(f"\n=== {args.family} per-block floor table "
          f"(device-chained, {jax.devices()[0].platform}) ===", flush=True)
    for name, sec in rows:
        print(f"  {name:<46s} {sec * 1e3:9.1f} ms "
              f"({sec / total * 100:5.1f}% of sum)", flush=True)
    print(f"  {'SUM':<46s} {total * 1e3:9.1f} ms", flush=True)
    print("compare against the measured full step "
          "(scripts/bench_full_step.py --config "
          f"configs/train_v2v_{args.family}_10k.yaml); the table "
          "replaces the round-3 floor narrative (docs/PERF.md)",
          flush=True)


if __name__ == "__main__":
    main()
