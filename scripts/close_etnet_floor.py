"""ETNet floor closure — the eraft/evflow one-session methodology
applied to the last production config without a measured per-block
table (round-3 left etnet at "~48% of practical peak, transformer is
VPU-bound" prose after the tri-stream fusion + dtype work).

Every number in ONE relay session:

  S_all    full fused train step, shipped config (raft_small teacher)
  S_zeros  same step, optical_flow_source: zeros — teacher+TC by
           same-session subtraction
  sim      simulator fwd at the etnet shape (B=6), device-chained
  scan     = S_zeros - sim  (model + LPIPS + L1 + AdamW as XLA
           schedules them)
  P        chained model constituents, matching the production
           scan-split decomposition (interface._forward_split — each
           stage is its own remat region, cost = fwd + (fwd+bwd)):
             pre   : head conv + encoder-0 input conv on the (B*T)
                     flat batch
             spine : ConvLSTM chain, one step x T (the only part that
                     scans)
             tail  : tokenize + tri-stream transformer (f32) +
                     upsample decoder + pred on the (B*T) flat batch
  residual = scan - P — LPIPS(chunked)+L1+AdamW (cross-check: the
           flagship's measured LPIPS row is ~340 ms at B=12; etnet
           runs B=6).

Reference counterparts: model/eitr/u_trans.py:96-108 (sequential
tri-stream — batched here), model/eitr/eitr.py (recurrent spine),
config/train_v2v_etnet_10k.yaml (B=6, T=40, 128^2).

Usage (TPU; two fused-step compiles are the long pole — persistent
compile cache honored):
    timeout 5400 python -u scripts/close_etnet_floor.py \
        [--steps 5] [--iters 20] [--json-out docs/etnet_floor_r5.json]
CPU smoke:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python -u scripts/close_etnet_floor.py --smoke
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from v2v_tpu.utils.compile_cache import maybe_enable  # noqa: E402

import bench_full_step as BFS  # noqa: E402


def _nolpips_config():
    """Temp copy of the etnet config with lpips_weight 0 (and zeros
    teacher via --flow): S_zeros - S_nolpips = the LPIPS row as XLA
    schedules it inside the fused step."""
    import yaml
    src = os.path.join(REPO, "configs", "train_v2v_etnet_10k.yaml")
    with open(src) as f:
        cfg = yaml.safe_load(f)
    cfg["module"]["loss"]["lpips_weight"] = 0
    dst = os.path.join("/tmp", "train_v2v_etnet_10k_nolpips.yaml")
    with open(dst, "w") as f:
        yaml.safe_dump(cfg, f)
    return dst


def measure_step(flow, steps, config=None):
    """Median s/step of the full fused etnet train step."""
    args = argparse.Namespace(
        config=config or os.path.join(REPO, "configs",
                                      "train_v2v_etnet_10k.yaml"),
        lpips_remat="full", remat_policy="full", chunk=0, steps=steps,
        scan_split="on", flow=flow, flops=False, flops_only=False,
        ab_split=False)
    (name, step, params, opt_state, batch, key, kwargs,
     (b, t, h, w)) = BFS.build(args)
    t0 = time.time()
    params, opt_state, loss, _ = step(params, opt_state, batch, key,
                                      **kwargs)
    l0 = float(loss)
    print(f"[{flow or 'config-default'}] compile+first step "
          f"{time.time() - t0:.0f}s, loss {l0:.5f}", flush=True)
    ts = []
    for _ in range(steps):
        t1 = time.perf_counter()
        params, opt_state, loss, _ = step(params, opt_state, batch, key,
                                          **kwargs)
        float(loss)
        ts.append(time.perf_counter() - t1)
    med = sorted(ts)[len(ts) // 2]
    print(f"[{flow or 'config-default'}] {med * 1e3:.0f} ms/step "
          f"(all: {', '.join(f'{x * 1e3:.0f}' for x in ts)})",
          flush=True)
    return med


def measure_sim(iters):
    """Simulator fwd at the etnet train shape (B=6, reconstruction
    task: no extra frame/evs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from v2v_tpu.ops.voxel import SimConfig
    from v2v_tpu.training.steps import synthesize_batch

    b, t, h, w, bins = 6, 40, 128, 128, 5
    n_frames = t * bins + 1
    video = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (b, n_frames, h, w)), jnp.uint8)
    keys2 = jnp.stack([jax.random.PRNGKey(3)] * b).astype(jnp.uint32)

    def sim_fwd(s, i):
        ev, gt = synthesize_batch(video, keys2 + i.astype(jnp.uint32),
                                  SimConfig(), bins, 1)
        return s + 1e-6 * (ev.astype(jnp.float32).mean() + gt.mean())

    return timed_chain(sim_fwd, jnp.float32(0.0), max(2, iters // 10))


def timed_chain(body, x0, iters, reps=3):
    import jax
    import jax.numpy as jnp

    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, c: body(c, i), x)

    fn = jax.jit(run)
    out = fn(x0)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x0)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / iters


def profile_stages(smoke, iters):
    """pre / spine-step / tail rows at the production scan-split shapes
    (fwd and fwd+bwd each, device-chained; dropout off — eval-forward
    semantics, the production train tail adds a dropout mask on top)."""
    import jax
    import jax.numpy as jnp
    from v2v_tpu.models.eitr import EITR

    DTYPE = jnp.bfloat16
    b, t, h, w, bins = (2, 3, 32, 32, 5) if smoke else (6, 40, 128, 128, 5)
    bt = b * t
    key = jax.random.PRNGKey(0)
    model = EITR(eitr_kwargs={"num_bins": bins, "norm": "none",
                              "dropout": 0.0})
    state = model.init_state(b, h, w, DTYPE)
    vox1 = jax.random.normal(key, (b, h, w, bins), jnp.float32)
    params = model.init(key, vox1, state)
    cast = (lambda a: a.astype(DTYPE)
            if jnp.issubdtype(a.dtype, jnp.floating) else a)
    params = {"params": jax.tree.map(cast, params["params"])}

    # shape probes (single step)
    head1, pre0_1 = model.apply(params, vox1.astype(DTYPE), train=False,
                                method="pre")
    blocks1, _ = model.apply(params, pre0_1, state, train=False,
                             method="spine_step")

    rows = []

    def _row(name, sec):
        rows.append((name, float(sec)))
        print(f"  [row] {name:<52s} {sec * 1e3:9.2f} ms", flush=True)

    flat_v = jax.random.normal(key, (bt, h, w, bins), DTYPE)

    def pre_fwd(v, i):
        hd, p0 = model.apply(params, v + (1e-6 * i).astype(v.dtype),
                             train=False, method="pre")
        return v + 1e-6 * (hd.astype(jnp.float32).mean()
                           + p0.astype(jnp.float32).mean()).astype(v.dtype)

    t_pre = timed_chain(pre_fwd, flat_v, iters)
    _row(f"pre fwd (B*T={bt} flat)", t_pre)

    def pre_fb(v, i):
        def lf(vv):
            hd, p0 = model.apply(params, vv, train=False, method="pre")
            return (hd.astype(jnp.float32).mean()
                    + p0.astype(jnp.float32).mean())
        val, g = jax.value_and_grad(lf)(v + (1e-6 * i).astype(v.dtype))
        return v + 1e-6 * g.astype(v.dtype) + 1e-6 * val.astype(v.dtype)

    t_pre_fb = timed_chain(pre_fb, flat_v, max(2, iters // 2))
    _row(f"pre fwd+bwd (B*T={bt} flat, incl. fwd)", t_pre_fb)

    def sp_fwd(v, i):
        bl, ns = model.apply(params, v + (1e-6 * i).astype(v.dtype),
                             state, train=False, method="spine_step")
        return v + 1e-6 * sum(x.astype(jnp.float32).mean()
                              for x in bl).astype(v.dtype)

    t_sp = timed_chain(sp_fwd, pre0_1, iters)
    _row("spine step fwd (x1)", t_sp)

    def sp_fb(v, i):
        def lf(vv):
            bl, ns = model.apply(params, vv, state, train=False,
                                 method="spine_step")
            return sum(x.astype(jnp.float32).mean() for x in bl)
        val, g = jax.value_and_grad(lf)(v + (1e-6 * i).astype(v.dtype))
        return v + 1e-6 * g.astype(v.dtype) + 1e-6 * val.astype(v.dtype)

    t_sp_fb = timed_chain(sp_fb, pre0_1, max(2, iters // 2))
    _row("spine step fwd+bwd (x1, incl. fwd)", t_sp_fb)
    _row(f"spine scan contribution (T={t}: fwd + fwd+bwd remat)",
         t * (t_sp + t_sp_fb))

    head = jax.random.normal(key, (bt,) + head1.shape[1:], DTYPE)
    blocks = tuple(
        jax.random.normal(key, (bt,) + bl.shape[1:], DTYPE)
        for bl in blocks1)

    # head/blocks must enter as TRACED arguments: baked as closure
    # constants they embed ~250 MB into the HLO proto and the relay's
    # remote-compile request rejects it (HTTP 413)
    def timed_chain_c(body, c0, consts, iters, reps=3):
        def run(c, *cs):
            return jax.lax.fori_loop(
                0, iters, lambda i, cc: body(cc, i, *cs), c)
        fn = jax.jit(run)
        out = fn(c0, *consts)
        float(out.astype(jnp.float32).sum())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(c0, *consts)
            float(out.astype(jnp.float32).sum())
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / iters

    def tail_fwd(v, i, hd, b1, b2):
        bl = [v + (1e-6 * i).astype(v.dtype), b1, b2]
        out = model.apply(params, hd, bl, train=False, method="tail")
        return v + 1e-6 * out["image"].astype(jnp.float32).mean().astype(
            v.dtype)

    t_tail = timed_chain_c(tail_fwd, blocks[0],
                           (head, blocks[1], blocks[2]), iters)
    _row(f"tail fwd (tokens+transformer+decoder, B*T={bt})", t_tail)

    def tail_fb(v, i, hd, b1, b2):
        def lf(b0):
            out = model.apply(params, hd, [b0, b1, b2],
                              train=False, method="tail")
            return out["image"].astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(v + (1e-6 * i).astype(v.dtype))
        return v + 1e-6 * g.astype(v.dtype) + 1e-6 * val.astype(v.dtype)

    t_tail_fb = timed_chain_c(tail_fb, blocks[0],
                              (head, blocks[1], blocks[2]),
                              max(2, iters // 2))
    _row(f"tail fwd+bwd (B*T={bt}, incl. fwd)", t_tail_fb)

    p_model = (t_pre + t_pre_fb) + t * (t_sp + t_sp_fb) \
        + (t_tail + t_tail_fb)
    _row("chained model constituents P (pre+spine*T+tail, remat cost)",
         p_model)
    return rows, p_model


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--lpips-split", action="store_true",
                    help="third ablation (lpips_weight 0 + zeros "
                         "teacher): S_zeros - S_nolpips = the LPIPS "
                         "row in-schedule; one more fused compile")
    args = ap.parse_args()
    cache = maybe_enable()
    print(f"compile cache: {cache or 'off'}", flush=True)

    s_nolpips = None
    if args.smoke:
        rows, p_model = profile_stages(True, 2)
        s_all, s_zeros, t_sim = 0.02, 0.01, 0.001
    else:
        s_all = measure_step(None, args.steps)
        s_zeros = measure_step("zeros", args.steps)
        if args.lpips_split:
            s_nolpips = measure_step("zeros", args.steps,
                                     config=_nolpips_config())
        t_sim = measure_sim(args.iters)
        rows, p_model = profile_stages(False, args.iters)

    teacher = s_all - s_zeros
    scan = s_zeros - t_sim
    residual = scan - p_model

    print("\n=== etnet floor closure (ONE session) ===", flush=True)

    def line(name, sec):
        print(f"  {name:<56s} {sec * 1e3:8.1f} ms  "
              f"({sec / s_all * 100:5.1f}% of step)", flush=True)

    line("full step S_all (shipped config, raft_small)", s_all)
    line("step with zeros teacher S_zeros", s_zeros)
    line("teacher+TC = S_all - S_zeros (same-session delta)", teacher)
    line("simulator (chained fwd)", t_sim)
    line("scan region = S_zeros - sim (model+LPIPS+L1+AdamW)", scan)
    line("chained model constituents P (pre+spine*T+tail)", p_model)
    line("residual = scan - P (LPIPS+L1+AdamW+fill)", residual)
    if s_nolpips is not None:
        line("step zeros teacher + lpips_weight 0 (S_nolpips)",
             s_nolpips)
        line("LPIPS row = S_zeros - S_nolpips (in-schedule delta)",
             s_zeros - s_nolpips)
        line("residual minus LPIPS (L1+AdamW+fill)",
             residual - (s_zeros - s_nolpips))
    print("  closure: teacher+sim+P+residual = 100.0% by construction; "
          "every row measured this session. Cross-check: flagship's "
          "LPIPS row is ~340 ms at B=12 (etnet is B=6).", flush=True)

    out = {
        "s_all_ms": round(s_all * 1e3, 1),
        "s_zeros_ms": round(s_zeros * 1e3, 1),
        "teacher_tc_ms": round(teacher * 1e3, 1),
        "sim_ms": round(t_sim * 1e3, 1),
        "scan_ms": round(scan * 1e3, 1),
        "model_constituents_ms": round(p_model * 1e3, 1),
        "residual_lpips_l1_adam_ms": round(residual * 1e3, 1),
        **({"s_nolpips_ms": round(s_nolpips * 1e3, 1),
            "lpips_row_ms": round((s_zeros - s_nolpips) * 1e3, 1)}
           if s_nolpips is not None else {}),
        "rows": {k: round(v * 1e3, 2) for k, v in rows},
        "smoke": args.smoke,
    }
    jout = args.json_out or os.path.join(
        REPO, "docs", "etnet_floor_r5.json")
    with open(jout, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {jout}", flush=True)


if __name__ == "__main__":
    main()
