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

The backward pass is a custom VJP in plain jnp (the transposed
shift-sum for dz, a per-offset channel reduction for datoms) — exactly
the gradients XLA autodiff derives for the jnp reference loop. A fused
Pallas backward was built in round 4 and RETIRED in round 5: it showed
a 1.34% dz mismatch on-chip (clean in interpret mode; suspected
overlapping unaligned-sublane read-modify-write windows on the
halo-padded dz accumulator), and the whole op had already measured
NEGATIVE vs XLA's lowering anyway (docs/PERF.md round 4) — a
known-wrong kernel must not ship one flag-flip away (round-5 verdict
weak #5). The surrounding pad/transpose stay ordinary jnp ops outside
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
        + m * hp * wp * co * 4              # headroom (was the bwd dz
        + 2 * m * k * k * h * w * 4         #   accumulator; the fused
        + 2 * h * w * co * 4                #   bwd is retired — kept
    )                                       #   conservative)
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
    """jnp backward — the same gradients XLA autodiff derives for the
    reference slice-loop, so on-chip grad parity is by construction.
    (The round-4 fused Pallas backward is retired; see module doc.)"""
    z_t, atoms_t = res
    b, m, hp, wp, co = z_t.shape
    h, w = hp - (k - 1), wp - (k - 1)
    g32 = g.astype(jnp.float32)                             # (B,H,W,CO)
    dz = jnp.zeros((b, m, hp, wp, co), jnp.float32)
    da_slices = []
    for l in range(k * k):
        i, j = l // k, l % k
        zsl = z_t[:, :, i:i + h, j:j + w, :].astype(jnp.float32)
        # datoms[:, :, l] = <g, shift_l(z_m)> over channels
        da_slices.append(jnp.einsum("bmhwc,bhwc->bmhw", zsl, g32,
                                    preferred_element_type=jnp.float32))
        # dz_m[pad window] += a * g  (transposed shift-sum)
        a = atoms_t[:, :, l].astype(jnp.float32)            # (B,M,H,W)
        dz = dz.at[:, :, i:i + h, j:j + w, :].add(
            a[..., None] * g32[:, None])
    da = jnp.stack(da_slices, axis=2)                       # (B,M,L,H,W)
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
# latency-bound, not bandwidth-naive (jnp 1.62/2.67 ms vs the fused
# kernels 1.70/3.70 ms fwd / fwd+bwd). Round 5: the fused backward
# (which additionally showed a 1.34% on-chip dz mismatch) is DELETED;
# the forward kernel + this jnp VJP remain as the documented
# experiment. The DynamicConv gate stays opt-in (V2V_DYNCONV_PALLAS=1)
# and the jnp loop remains the production path.
# ---------------------------------------------------------------------------
