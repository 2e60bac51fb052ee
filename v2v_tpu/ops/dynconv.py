"""Fused per-pixel dynamic-convolution shift-sum (HyperE2VID decoder).

The dynamic conv (reference hyper_dynamic.py:60-92; models/hyper.py
DynamicConv) ends in

    out[b,y,x,o] = sum_{l,m} atoms[b,y,x,m,l] * zpad[b, y+dy_l, x+dx_l, m, o]

with l ranging over the k*k=25 window offsets and m over the 6
compositional atoms. The XLA lowering of the 25-slice einsum loop
re-reads the (B,H,W,M,CO) tensor once per offset — ~790 MB of HBM
traffic per call at the production decoder-0 shape (12,32,32,6,128),
which profiling pins at ~1 ms fwd, i.e. AT the naive-traffic bandwidth
bound (docs/PERF.md round 4). The whole working set is ~3 MB, so the
fix is locality, not arithmetic: one Pallas program per batch item
keeps z (with halo), atoms and the accumulator in VMEM and performs
all 150 shifted fused multiply-adds on-chip — HBM traffic drops to one
read of each operand plus one write (~26 MB/call).

The backward pass has the same structure and the same bandwidth
problem twice (dz is the transposed shift-sum; datoms is a per-offset
lane reduction), so the op carries a custom VJP with a fused backward
kernel. The surrounding pad/transpose stay ordinary jnp ops outside
the custom_vjp boundary (XLA copies at HBM rate, ~0.1 ms total).

Layouts inside the kernels (minor-to-major chosen for the TPU tiling):
    z_t     (B, M, Hp, Wp, CO)   CO on lanes, spatial on sublanes
    atoms_t (B, M, L,  H,  W)    per-(m,l) spatial planes
    out     (B, H, W, CO)        f32 accumulator precision

Numerics match the jnp reference path to f32 accumulation order within
each (m,l) term; tests pin kernel==reference on random shapes for both
values and gradients (tests/test_dynconv.py, interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# per-program VMEM budget (bytes) the gate enforces — conservative
# against the 16 MB/core scoped default, leaving room for pipelining
_VMEM_BUDGET = 10 * 1024 * 1024


def pallas_ok(b: int, h: int, w: int, m: int, co: int, k: int,
              z_bytes: int) -> bool:
    """Shape gate: the fused kernel holds one batch item's padded z,
    atoms, gradient and f32 accumulators in VMEM."""
    hp, wp = h + k - 1, w + k - 1
    vmem = (
        m * hp * wp * co * z_bytes          # z tile (+halo)
        + m * hp * wp * co * 4              # dz f32 accumulator (bwd)
        + 2 * m * k * k * h * w * 4         # atoms + datoms
        + 2 * h * w * co * 4                # out/g f32
    )
    return vmem <= _VMEM_BUDGET and co % 128 == 0 and h >= 8 and w >= 8


def _fwd_kernel(k: int, z_ref, a_ref, out_ref):
    """In-place accumulation through the output ref: a functional
    `acc = acc + term` chain leaves Mosaic one SSA value per unrolled
    iteration (measured: 46.9 MB VMEM stack at the production shape,
    3x the scoped limit); ref updates make the buffer reuse explicit."""
    _, m_atoms, _, _, co = z_ref.shape
    _, _, _, h, w = a_ref.shape
    out_ref[0] = jnp.zeros((h, w, co), jnp.float32)
    for l in range(k * k):
        i, j = l // k, l % k
        for m in range(m_atoms):
            a = a_ref[0, m, l].astype(jnp.float32)          # (H,W)
            zsl = z_ref[0, m, i:i + h, j:j + w].astype(jnp.float32)
            out_ref[0] = out_ref[0] + a[:, :, None] * zsl


def _bwd_kernel(k: int, z_ref, a_ref, g_ref, dz_ref, da_ref):
    _, m_atoms, hp, wp, co = z_ref.shape
    _, _, _, h, w = a_ref.shape
    g = g_ref[0].astype(jnp.float32)                        # (H,W,CO)
    dz_ref[0] = jnp.zeros((m_atoms, hp, wp, co), jnp.float32)
    for l in range(k * k):
        i, j = l // k, l % k
        for m in range(m_atoms):
            a = a_ref[0, m, l].astype(jnp.float32)
            zsl = z_ref[0, m, i:i + h, j:j + w].astype(jnp.float32)
            # datoms[m,l] = <g, shift_l(z_m)> over channels
            da_ref[0, m, l] = jnp.sum(zsl * g, axis=-1)
            # dz_m[pad window] += a * g  (transposed shift-sum),
            # in-place on the output ref for the same reuse reason
            dz_ref[0, m, i:i + h, j:j + w, :] = \
                dz_ref[0, m, i:i + h, j:j + w, :] + a[:, :, None] * g


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _shift_sum(z_t: Array, atoms_t: Array, k: int,
               interpret: bool) -> Array:
    out, _ = _shift_sum_fwd(z_t, atoms_t, k, interpret)
    return out


def _shift_sum_fwd(z_t, atoms_t, k, interpret):
    b, m, hp, wp, co = z_t.shape
    h, w = hp - (k - 1), wp - (k - 1)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, m, hp, wp, co), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, k * k, h, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        # Mosaic stacks a temporary per unrolled FMA beyond what the
        # in-place refs already save; 16 MB scoped default is short at
        # the production shape (measured 27 MB) — v5e VMEM is 128 MB
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(z_t, atoms_t)
    return out, (z_t, atoms_t)


def _shift_sum_bwd(k, interpret, res, g):
    z_t, atoms_t = res
    b, m, hp, wp, co = z_t.shape
    h, w = hp - (k - 1), wp - (k - 1)
    dz, da = pl.pallas_call(
        functools.partial(_bwd_kernel, k),
        out_shape=(
            jax.ShapeDtypeStruct((b, m, hp, wp, co), jnp.float32),
            jax.ShapeDtypeStruct((b, m, k * k, h, w), jnp.float32),
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, m, hp, wp, co), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, k * k, h, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, m, hp, wp, co), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, k * k, h, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(z_t, atoms_t, g)
    return dz.astype(z_t.dtype), da.astype(atoms_t.dtype)


_shift_sum.defvjp(_shift_sum_fwd, _shift_sum_bwd)


def dynamic_shift_sum(z: Array, atoms: Array, kernel_size: int,
                      interpret: bool = False) -> Array:
    """Fused atoms-weighted k^2 shift-sum.

    z:     (B, H, W, M, CO)  contracted features (any float dtype)
    atoms: (B, H, W, M, L)   per-pixel atom weights, L == k*k
    returns (B, H, W, CO) float32 — same contraction as the jnp
    reference loop in models/hyper.py DynamicConv (torch-unfold
    row-major offset order).
    """
    k = kernel_size
    p = k // 2
    b, h, w, m, co = z.shape
    # (B,M,H,W,CO) with spatial halo; (B,M,L,H,W)
    z_t = jnp.pad(jnp.transpose(z, (0, 3, 1, 2, 4)),
                  ((0, 0), (0, 0), (p, p), (p, p), (0, 0)))
    atoms_t = jnp.transpose(atoms, (0, 3, 4, 1, 2))
    return _shift_sum(z_t, atoms_t, k, interpret)


# ---------------------------------------------------------------------------
# Round-4 verdict (on-chip, docs/PERF.md): MEASURED NEGATIVE at the
# production shape — XLA's lowering of the 25-slice loop is already
# latency-bound, not bandwidth-naive (jnp 1.62/2.67 ms vs this kernel
# 1.70/3.70 ms fwd / fwd+bwd), and the fused backward shows a 1.34%
# dz mismatch on-chip (clean in interpret mode; suspected overlapping
# unaligned-sublane RMW hazard). Kept as documented experiment; the
# DynamicConv gate is opt-in (V2V_DYNCONV_PALLAS=1) and the jnp loop
# remains the production path.
# ---------------------------------------------------------------------------
