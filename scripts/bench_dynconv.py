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
    }
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
