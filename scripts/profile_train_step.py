"""Per-block TPU profiling of the flagship E2VID train step.

Measures where the scan fwd+bwd milliseconds go (per-block costs, remat
policies with temp-HBM, unroll variants, the simulator) so tuning
targets the right op; the findings live in docs/PERF.md ("The scan is
at the practical roofline").

Timing discipline (see .claude/skills/verify/SKILL.md): one dispatch of a
device-side `lax.fori_loop` whose iterations carry a data dependency;
sync by fetching a host scalar. Host-side dispatch loops lie on the axon
relay.

Usage:  timeout 560 python -u scripts/profile_train_step.py [variants...]
        variants in {fwd, bwd, unroll, policy, noremat, blocks, sim};
        default all.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, T, BINS, H, W = 12, 40, 5, 128, 128
DTYPE = jnp.bfloat16


def timed(fn, *args, reps=3):
    """Median wall time of a jitted fn returning a scalar; first call
    compiles (excluded)."""
    out = fn(*args)
    float(out)  # compile + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        f = float(out)  # the only reliable sync on the relay
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], f


def chain(body, n, x0):
    """fori_loop chaining `body` n times with a forced data dependency."""
    def run(x):
        def it(i, c):
            return body(c + 1e-6 * jnp.float32(i).astype(c.dtype))
        return jax.lax.fori_loop(0, n, it, x).astype(jnp.float32).sum()
    return jax.jit(run), x0


def build():
    from v2v_tpu.models.model import E2VIDRecurrent
    kwargs = dict(num_bins=BINS, recurrent_block_type="convlstm",
                  base_num_channels=32, num_encoders=3,
                  num_residual_blocks=2, use_upsample_conv=True,
                  norm="none", kernel_size=5)
    model = E2VIDRecurrent(unet_kwargs=kwargs)
    state = model.init_state(B, H, W, DTYPE)
    x = jnp.zeros((B, H, W, BINS), DTYPE)
    params = model.init(jax.random.PRNGKey(0), x, state)
    params = jax.tree.map(lambda a: a.astype(DTYPE)
                          if jnp.issubdtype(a.dtype, jnp.floating) else a,
                          params)
    return model, params, state


def scan_loss(model, params, events, state, remat=True, unroll=1,
              policy=None):
    def step(carry, voxel):
        out, new_state = model.apply(params, voxel, carry, train=True)
        return new_state, out["image"]
    if remat:
        step = jax.checkpoint(step, policy=policy)
    _, imgs = jax.lax.scan(step, state, jnp.swapaxes(events, 0, 1),
                           unroll=unroll)
    gt = jnp.ones_like(imgs) * 0.5
    return jnp.abs(imgs - gt).mean().astype(jnp.float32)


def main(variants):
    model, params, state = build()
    events = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, BINS),
                               DTYPE)
    res = {}

    if "fwd" in variants:
        f = jax.jit(lambda ev: scan_loss(model, params,
                                         jax.lax.stop_gradient(ev), state,
                                         remat=False))
        t, _ = timed(f, events)
        res["scan_fwd_only"] = t

    if "bwd" in variants:
        g = jax.jit(jax.grad(lambda p, ev: scan_loss(model, p, ev, state),
                             argnums=0))
        def loss_of(ev):
            gr = g(params, ev)
            return sum(jnp.sum(jnp.abs(a.astype(jnp.float32)))
                       for a in jax.tree.leaves(gr))
        f = jax.jit(loss_of)
        t, _ = timed(f, events)
        res["scan_fwd_bwd_remat"] = t

    if "unroll" in variants:
        for u in (2, 4):
            g = jax.jit(jax.grad(
                lambda p, ev: scan_loss(model, p, ev, state, unroll=u)))
            f = jax.jit(lambda ev: sum(
                jnp.sum(jnp.abs(a.astype(jnp.float32)))
                for a in jax.tree.leaves(g(params, ev))))
            t, _ = timed(f, events)
            res[f"scan_fwd_bwd_remat_unroll{u}"] = t

    if "policy" in variants:
        # selective remat: keep named tensors across the scan instead of
        # recomputing them in the backward pass; report time + temp HBM
        from jax.ad_checkpoint import checkpoint_policies as cp
        policies = {
            "save_gates": cp.save_only_these_names("convlstm_gates"),
            "save_gates_convs": cp.save_only_these_names(
                "convlstm_gates", "conv_out"),
        }
        for pname, pol in [("full_remat", None)] + list(policies.items()):
            g = jax.jit(jax.grad(
                lambda p, ev: scan_loss(model, p, ev, state, policy=pol)))
            f = jax.jit(lambda ev: sum(
                jnp.sum(jnp.abs(a.astype(jnp.float32)))
                for a in jax.tree.leaves(g(params, ev))))
            lowered = f.lower(events)
            mem = lowered.compile().memory_analysis()
            tmp = getattr(mem, "temp_size_in_bytes", None)
            t, _ = timed(f, events)
            res[f"scan_policy_{pname}"] = t
            print(f"  policy {pname}: temp HBM = "
                  f"{(tmp or 0) / 2**30:.2f} GiB", flush=True)

    if "noremat" in variants:
        tq = T // 4
        g = jax.jit(jax.grad(
            lambda p, ev: scan_loss(model, p, ev, state, remat=False)))
        f = jax.jit(lambda ev: sum(
            jnp.sum(jnp.abs(a.astype(jnp.float32)))
            for a in jax.tree.leaves(g(params, ev))))
        t, _ = timed(f, events[:, :tq])
        res[f"scan_fwd_bwd_noremat_T{tq}_x4"] = t * 4

    if "blocks" in variants:
        # Per-block fwd+bwd cost, chained x T iterations.
        from v2v_tpu.models.submodules import (ConvLayer, ConvLSTM,
                                               ResidualBlock,
                                               UpsampleConvLayer)
        def bench_block(name, mod, shape, method=None):
            x0 = jax.random.normal(jax.random.PRNGKey(2), shape, DTYPE)
            p = mod.init(jax.random.PRNGKey(3), x0)
            p = jax.tree.map(lambda a: a.astype(DTYPE)
                             if jnp.issubdtype(a.dtype, jnp.floating)
                             else a, p)
            def fwd_bwd(x):
                def lf(xx):
                    return mod.apply(p, xx).astype(jnp.float32).mean()
                l, gx = jax.value_and_grad(lf)(x)
                return x + gx.astype(x.dtype) * 1e-6 + l.astype(x.dtype)
            f, x0 = chain(fwd_bwd, T, x0)
            t, _ = timed(f, x0)
            res[f"block_{name}_xT"] = t

        bench_block("head5x5_5to32_128", ConvLayer(32, 5, 1),
                    (B, H, W, BINS))
        bench_block("enc5x5s2_32to64_128", ConvLayer(64, 5, 2),
                    (B, H, W, 32))
        bench_block("enc5x5s2_64to128_64", ConvLayer(128, 5, 2),
                    (B, H // 2, W // 2, 64))
        bench_block("enc5x5s2_128to256_32", ConvLayer(256, 5, 2),
                    (B, H // 4, W // 4, 128))
        bench_block("res3x3_256_16", ResidualBlock(256),
                    (B, H // 8, W // 8, 256))
        bench_block("dec_up5x5_256to128_16to32", UpsampleConvLayer(128, 5),
                    (B, H // 8, W // 8, 256))
        bench_block("dec_up5x5_128to64_32to64", UpsampleConvLayer(64, 5),
                    (B, H // 4, W // 4, 128))
        bench_block("dec_up5x5_64to32_64to128", UpsampleConvLayer(32, 5),
                    (B, H // 2, W // 2, 64))

        # ConvLSTM cells (stateful; bench via wrapper that sums outputs)
        for name, ch, hh in (("lstm_64_64", 64, H // 2),
                             ("lstm_128_32", 128, H // 4),
                             ("lstm_256_16", 256, H // 8)):
            cell = ConvLSTM(ch, 3)
            x0 = jax.random.normal(jax.random.PRNGKey(4), (B, hh, hh, ch),
                                   DTYPE)
            st = ConvLSTM.zero_state(B, hh, hh, ch, DTYPE)
            p = cell.init(jax.random.PRNGKey(5), x0, st)
            p = jax.tree.map(lambda a: a.astype(DTYPE)
                             if jnp.issubdtype(a.dtype, jnp.floating)
                             else a, p)
            def fwd_bwd(x, cell=cell, p=p, st=st):
                def lf(xx):
                    h, _ = cell.apply(p, xx, st)
                    return h.astype(jnp.float32).mean()
                l, gx = jax.value_and_grad(lf)(x)
                return x + gx.astype(x.dtype) * 1e-6 + l.astype(x.dtype)
            f, x0 = chain(fwd_bwd, T, x0)
            t, _ = timed(f, x0)
            res[f"block_{name}_xT"] = t

        # resize alone (the upsample half of the decoder)
        for name, ch, hh in (("resize_256_16to32", 256, H // 8),
                             ("resize_128_32to64", 128, H // 4),
                             ("resize_64_64to128", 64, H // 2)):
            x0 = jax.random.normal(jax.random.PRNGKey(6), (B, hh, hh, ch),
                                   DTYPE)
            def fwd_bwd(x, hh=hh):
                def lf(xx):
                    b, h2, w2, c = xx.shape
                    y = jax.image.resize(xx, (b, 2 * h2, 2 * w2, c),
                                         method="bilinear")
                    return y.astype(jnp.float32).mean()
                l, gx = jax.value_and_grad(lf)(x)
                return x + gx.astype(x.dtype) * 1e-6 + l.astype(x.dtype)
            f, x0 = chain(fwd_bwd, T, x0)
            t, _ = timed(f, x0)
            res[f"block_{name}_xT"] = t

    if "sim" in variants:
        from v2v_tpu.training.steps import synthesize_batch, _pallas_ok
        from v2v_tpu.ops.voxel import SimConfig
        cfg = SimConfig()
        video = jnp.asarray(np.random.RandomState(0).randint(
            0, 255, (B, T * BINS + 1, H, W), dtype=np.uint8))
        def sim(v):
            keys = jax.vmap(lambda i: jax.random.fold_in(
                jax.random.PRNGKey(7), i))(jnp.arange(B))
            ev, gt = synthesize_batch(v, keys, cfg, BINS, 1)
            return ev.astype(jnp.float32).sum() + gt.sum()
        f = jax.jit(sim)
        t, _ = timed(f, video)
        res["sim_only"] = t

    print(flush=True)
    for k, v in res.items():
        print(f"{k:42s} {v * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["fwd", "bwd", "unroll", "policy",
                                "noremat", "blocks", "sim"]
    main(variants)
