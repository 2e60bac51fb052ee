"""On-chip A/B of the HyperE2VID dynamic-conv shift-sum: fused Pallas
kernel (ops/dynconv.py) vs the jnp 25-slice einsum loop, fwd and
fwd+bwd, device-chained at the production decoder-0 shape.

Usage (TPU):  timeout 900 python -u scripts/bench_dynconv.py
CPU smoke:    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                  python -u scripts/bench_dynconv.py --smoke
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed_chain(body, x0, iters, reps=3):
    fn = jax.jit(lambda x: jax.lax.fori_loop(
        0, iters, lambda i, c: body(c, i), x))
    out = fn(x0)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(x0)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / iters


def jnp_loop(z, atoms, k):
    b, h, w, m, co = z.shape
    p = k // 2
    zp = jnp.pad(z, ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))
    out = jnp.zeros((b, h, w, co), jnp.float32)
    for i in range(k):
        for j in range(k):
            a = atoms[..., i * k + j]
            out = out + jnp.einsum(
                "bhwm,bhwmo->bhwo", a, zp[:, i:i + h, j:j + w],
                preferred_element_type=jnp.float32)
    return out


def jnp_wpatch(z, atoms, k):
    """Group the k^2 shift-sum into k einsums: materialize the k
    W-shifted copies once (k*|z| HBM, vs the full k^2 patch tensor),
    then contract (m, j) = 30 elements per output pixel per row-offset.
    Exact reassociation of jnp_loop (f32 accumulation throughout)."""
    b, h, w, m, co = z.shape
    p = k // 2
    zp = jnp.pad(z, ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))
    # zw[b, y, x, j, m, o] = zp[b, y, x + j, m, o]  (y over padded rows)
    zw = jnp.stack([zp[:, :, j:j + w] for j in range(k)], axis=3)
    out = jnp.zeros((b, h, w, co), jnp.float32)
    for i in range(k):
        a = atoms[..., i * k:(i + 1) * k]          # (B,H,W,M,k_w)
        out = out + jnp.einsum(
            "bhwmj,bhwjmo->bhwo", a, zw[:, i:i + h],
            preferred_element_type=jnp.float32)
    return out


def jnp_allpatch(z, atoms, k):
    """One einsum over the materialized k^2 patch tensor (the contraction
    is (l, m) = 150 elements per pixel; the patch tensor is k^2*|z| --
    what the round-4 reorder deliberately avoided, re-tested here at the
    contracted width where it is k^2*18.9 MB bf16, not k^2*157 MB)."""
    b, h, w, m, co = z.shape
    p = k // 2
    zp = jnp.pad(z, ((0, 0), (p, p), (p, p), (0, 0), (0, 0)))
    zs = jnp.stack([zp[:, i:i + h, j:j + w]
                    for i in range(k) for j in range(k)], axis=3)
    return jnp.einsum("bhwml,bhwlmo->bhwo", atoms, zs,
                      preferred_element_type=jnp.float32)


def _shift_mats(k, n, dtype):
    import numpy as np
    p = k // 2
    s = np.zeros((k, n, n), np.float32)
    for i in range(k):
        for y in range(n):
            yy = y + i - p
            if 0 <= yy < n:
                s[i, y, yy] = 1.0
    return jnp.asarray(s, dtype)


def jnp_matshift(z, atoms, k):
    """All k^2 shifted copies built by banded shift-matrix matmuls (the
    ERAFT-lookup/TC-warp trick): every read is aligned, the copies come
    out of two MXU contractions instead of 25 pad+slice chains, and the
    weighted reduction is one einsum. Exact: the shift matrices are 0/1
    banded (zero padding outside the frame)."""
    b, h, w, m, co = z.shape
    sh = _shift_mats(k, h, z.dtype)
    sw = _shift_mats(k, w, z.dtype)
    # zr[b,i,y,x,m,o] = zp[b, y+i-p, x, m, o]
    zr = jnp.einsum("iyY,bYxmo->biyxmo", sh, z)
    # zs[b,i,j,y,x,m,o] = zp[b, y+i-p, x+j-p, m, o]
    zs = jnp.einsum("jxX,biyXmo->bijyxmo", sw, zr)
    a = atoms.reshape(b, h, w, m, k, k)
    return jnp.einsum("bhwmij,bijhwmo->bhwo", a, zs,
                      preferred_element_type=jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from v2v_tpu.ops.dynconv import dynamic_shift_sum
    interp = jax.default_backend() == "cpu"
    b, h, w, m, co, k = (2, 8, 8, 3, 128, 3) if args.smoke \
        else (12, 32, 32, 6, 128, 5)
    kz, ka = jax.random.split(jax.random.PRNGKey(0))
    z = jax.random.normal(kz, (b, h, w, m, co)).astype(jnp.bfloat16)
    atoms = jax.random.normal(ka, (b, h, w, m, k * k), jnp.float32)

    impls = {
        "pallas": lambda z_, a_: dynamic_shift_sum(z_, a_, k,
                                                   interpret=interp),
        "jnp-loop": lambda z_, a_: jnp_loop(z_, a_, k),
        "jnp-wpatch": lambda z_, a_: jnp_wpatch(z_, a_, k),
        "jnp-allpatch": lambda z_, a_: jnp_allpatch(z_, a_, k),
        "jnp-matshift": lambda z_, a_: jnp_matshift(z_, a_, k),
    }
    # parity gate first: every variant must match the reference loop
    ref = jax.jit(lambda z_, a_: jnp_loop(z_, a_, k))(z, atoms)
    for name, f in impls.items():
        if name == "pallas":
            continue
        got = jax.jit(f)(z, atoms)
        err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref))
                                                   + 1e-12))
        assert err < 5e-3, (name, err)
        print(f"  parity {name:12s} max rel err {err:.2e}", flush=True)
    for name, f in impls.items():
        def fwd(v, i):
            out = f(v + (1e-6 * i).astype(v.dtype), atoms)
            return v + 1e-6 * out.astype(jnp.float32).mean().astype(v.dtype)

        t_f = timed_chain(fwd, z, args.iters)

        def fb(v, i):
            def lf(zv, av):
                return f(zv, av).astype(jnp.float32).mean()
            val, (gz, ga) = jax.value_and_grad(lf, argnums=(0, 1))(
                v + (1e-6 * i).astype(v.dtype), atoms)
            return v + 1e-6 * (gz.astype(jnp.float32).mean()
                               + ga.mean() + val).astype(v.dtype)

        t_fb = timed_chain(fb, z, max(2, args.iters // 2))
        print(f"  {name:10s} fwd {t_f * 1e3:7.3f} ms   "
              f"fwd+bwd {t_fb * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
