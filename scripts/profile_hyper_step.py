"""Per-block TPU floor measurement for train_v2v_hyper_10k — the
flagship's measured-floor methodology applied to HyperE2VID, the last
production config without one (round-3 verdict weak #2 / next #2).

The hyper train step differs from the flagship ONLY in the model: the
loss side (LPIPS-VGG, L1, TC with the raft_small teacher) and the
simulator are configured identically (B=12, T=40, 128^2, 5 bins), so
their measured rows in docs/PERF.md carry over. This script measures
what's left:

    hyper fwd          one voxel step of HyperE2VID
    hyper fwd+bwd      same with grad (a rematted scan step runs
                       fwd x2 + bwd per train step)
    e2vid-eq fwd(+bwd) the SAME UNetConfig with the standard decoder —
                       the backbone whose flagship twin measured ~95%
                       of practical peak; the hyper-minus-e2vid delta
                       isolates the dynamic decoder's true cost
    dyn layer fwd(+bwd) DynamicUpsampleLayer standalone at the exact
                       decoder-0 shapes (context fusion + atom
                       generation + dynamic conv)

Each block is timed with the device-chained discipline (fori_loop with
a data dependency, one dispatch, host-scalar sync — host loops lie on
the axon relay).

Usage (TPU):  timeout 1500 python -u scripts/profile_hyper_step.py
CPU smoke:    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                  python -u scripts/profile_hyper_step.py --smoke
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

UNET_KWARGS = dict(
    num_bins=5, skip_type="sum", recurrent_block_type="convlstm",
    num_encoders=3, base_num_channels=32, num_residual_blocks=2,
    use_upsample_conv=True, norm="none", kernel_size=5,
    channel_multiplier=2, num_output_channels=1)


def timed_chain(body, x0, iters, reps=3):
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


def _perturb(x, i):
    return x + (1e-6 * i).astype(x.dtype)


def _row(rows, item):
    rows.append(item)
    print(f"  [row] {item[0]:<52s} {item[1] * 1e3:9.2f} ms", flush=True)


def cast_params(params):
    cast = (lambda a: a.astype(DTYPE)
            if jnp.issubdtype(a.dtype, jnp.floating) else a)
    out = dict(params)
    out["params"] = jax.tree.map(cast, params["params"])
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from v2v_tpu.models.hyper import HyperE2VID, DynamicUpsampleLayer
    from v2v_tpu.models.model import E2VIDRecurrent

    b, t, h, w, bins = (2, 3, 32, 32, 5) if args.smoke \
        else (12, 40, 128, 128, 5)
    iters = args.iters
    key = jax.random.PRNGKey(0)
    vox = jax.random.normal(key, (b, h, w, bins), DTYPE)
    rows = []

    # ---- full hyper model, one voxel step --------------------------------
    hyper = HyperE2VID(unet_kwargs=UNET_KWARGS)
    state = hyper.init_state(b, h, w, DTYPE)
    params = cast_params(hyper.init(key, vox.astype(jnp.float32), state))

    def hy_fwd(v, i):
        out, _ = hyper.apply(params, _perturb(v, i), state, train=False)
        return v + 1e-6 * out["image"].astype(DTYPE).mean()

    t_hy = timed_chain(hy_fwd, vox, iters)
    _row(rows, ("hyper model fwd (x1)", t_hy))

    def hy_fb(v, i):
        def lf(vv):
            out, _ = hyper.apply(params, vv, state, train=False)
            return out["image"].astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(_perturb(v, i))
        return v + 1e-6 * g.astype(v.dtype) + 1e-6 * val.astype(v.dtype)

    t_hy_fb = timed_chain(hy_fb, vox, max(2, iters // 2))
    _row(rows, ("hyper model fwd+bwd (x1, incl. fwd)", t_hy_fb))
    _row(rows, (f"hyper scan contribution (T={t}: fwd + fwd+bwd remat)",
                 t * (t_hy + t_hy_fb)))

    # ---- same-config standard E2VID (the ~95%-of-peak backbone twin) ----
    e2vid_kwargs = {k: v for k, v in UNET_KWARGS.items()
                    if k not in ("channel_multiplier", "num_output_channels")}
    e2 = E2VIDRecurrent(unet_kwargs=e2vid_kwargs)
    st2 = e2.init_state(b, h, w, DTYPE)
    p2 = cast_params(e2.init(key, vox.astype(jnp.float32), st2))

    def e2_fwd(v, i):
        out, _ = e2.apply(p2, _perturb(v, i), st2, train=False)
        return v + 1e-6 * out["image"].astype(DTYPE).mean()

    t_e2 = timed_chain(e2_fwd, vox, iters)
    _row(rows, ("e2vid-equivalent fwd (x1)", t_e2))

    def e2_fb(v, i):
        def lf(vv):
            out, _ = e2.apply(p2, vv, st2, train=False)
            return out["image"].astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(_perturb(v, i))
        return v + 1e-6 * g.astype(v.dtype) + 1e-6 * val.astype(v.dtype)

    t_e2_fb = timed_chain(e2_fb, vox, max(2, iters // 2))
    _row(rows, ("e2vid-equivalent fwd+bwd (x1, incl. fwd)", t_e2_fb))
    _row(rows, ("dynamic-decoder delta per step "
                 "(hyper - e2vid, fwd + fwd+bwd)",
                 (t_hy + t_hy_fb) - (t_e2 + t_e2_fb)))

    # ---- DynamicUpsampleLayer standalone at decoder-0 shapes -------------
    c_in = 32 * 2 ** (UNET_KWARGS["num_encoders"] - 1) * \
        UNET_KWARGS["channel_multiplier"]                     # 256
    h0, w0 = h // 2 ** UNET_KWARGS["num_encoders"], \
        w // 2 ** UNET_KWARGS["num_encoders"]
    # decoder-0 input: 16^2 at 128^2 train crop; the layer upsamples x2
    # to meet the /4-downsampled context (32^2)
    xdec = jax.random.normal(key, (b, h0, w0, c_in), DTYPE)
    prev = jax.random.normal(key, (b, h, w, 1), DTYPE)
    layer = DynamicUpsampleLayer(c_in, c_in // 2,
                                 UNET_KWARGS["kernel_size"],
                                 in_fuse_channels=1 + bins)
    lp = cast_params(layer.init(key, xdec.astype(jnp.float32),
                                vox.astype(jnp.float32), prev))

    def dl_fwd(v, i):
        out = layer.apply(lp, xdec, _perturb(v, i), prev)
        return v + 1e-6 * out.astype(DTYPE).mean()

    t_dl = timed_chain(dl_fwd, vox, iters)
    _row(rows, ("DynamicUpsampleLayer fwd (ctx+atoms+dynconv, x1)", t_dl))

    def dl_fb(v, i):
        def lf(xv):
            out = layer.apply(lp, xv, v, prev)
            return out.astype(jnp.float32).mean()
        val, g = jax.value_and_grad(lf)(_perturb(xdec, i))
        return v + 1e-6 * (g.astype(jnp.float32).mean()
                           + val).astype(v.dtype)

    t_dl_fb = timed_chain(dl_fb, vox, max(2, iters // 2))
    _row(rows, ("DynamicUpsampleLayer fwd+bwd (x1, incl. fwd)", t_dl_fb))

    total_model = t * (t_hy + t_hy_fb)
    print(f"\n=== hyper per-block floor table "
          f"(device-chained, {jax.devices()[0].platform}) ===", flush=True)
    for name, sec in rows:
        print(f"  {name:<52s} {sec * 1e3:9.2f} ms", flush=True)
    print(f"  model scan total (T={t}) {total_model * 1e3:9.1f} ms; "
          f"add the flagship's measured loss rows (identical loss "
          f"config: LPIPS-VGG + TC/raft_small + sim, docs/PERF.md) and "
          f"compare against bench_full_step.py --config "
          f"configs/train_v2v_hyper_10k.yaml", flush=True)


if __name__ == "__main__":
    main()
