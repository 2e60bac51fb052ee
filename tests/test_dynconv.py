"""Fused dynamic-conv shift-sum kernel == jnp reference (values and
gradients), CPU interpret mode. The jnp loop it must match is the
DynamicConv fallback path in models/hyper.py (itself pinned bitwise-
structurally against the reference unfold+einsum order by
tests/test_hyper_oracle-style tests), so agreement here chains the
Pallas kernel to the torch semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2v_tpu.ops.dynconv import dynamic_shift_sum, pallas_ok


def _reference(z, atoms, k):
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


@pytest.mark.parametrize("shape,k", [
    ((2, 16, 16, 6, 128), 5),     # production-like (decoder-0 is 32x32)
    ((1, 8, 12, 3, 128), 3),      # non-square, small kernel
    ((3, 9, 8, 2, 256), 5),       # odd H, wider channels
])
def test_shift_sum_matches_reference(shape, k):
    b, h, w, m, co = shape
    kz, ka = jax.random.split(jax.random.PRNGKey(0))
    z = jax.random.normal(kz, shape, jnp.float32)
    atoms = jax.random.normal(ka, (b, h, w, m, k * k), jnp.float32)

    ref = _reference(z, atoms, k)
    got = dynamic_shift_sum(z, atoms, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_shift_sum_gradients_match():
    b, h, w, m, co, k = 2, 12, 10, 4, 128, 5
    kz, ka, kg = jax.random.split(jax.random.PRNGKey(1), 3)
    z = jax.random.normal(kz, (b, h, w, m, co), jnp.float32)
    atoms = jax.random.normal(ka, (b, h, w, m, k * k), jnp.float32)
    cot = jax.random.normal(kg, (b, h, w, co), jnp.float32)

    def loss_ref(z_, a_):
        return jnp.vdot(_reference(z_, a_, k), cot)

    def loss_ker(z_, a_):
        return jnp.vdot(dynamic_shift_sum(z_, a_, k, interpret=True), cot)

    gr = jax.grad(loss_ref, argnums=(0, 1))(z, atoms)
    gk = jax.grad(loss_ker, argnums=(0, 1))(z, atoms)
    for r, g in zip(gr, gk):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-5, atol=3e-5)


def test_shift_sum_bf16_input():
    b, h, w, m, co, k = 1, 8, 8, 6, 128, 5
    z = jax.random.normal(jax.random.PRNGKey(2),
                          (b, h, w, m, co)).astype(jnp.bfloat16)
    atoms = jax.random.normal(jax.random.PRNGKey(3),
                              (b, h, w, m, k * k), jnp.float32)
    ref = _reference(z, atoms, k)
    got = dynamic_shift_sum(z, atoms, k, interpret=True)
    # bf16 operand, f32 accumulate on both paths
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_pallas_gate():
    # production decoder-0 shape fits; something enormous does not
    assert pallas_ok(12, 32, 32, 6, 128, 5, 2)
    assert not pallas_ok(1, 256, 256, 6, 512, 5, 4)
    # lanes must be full
    assert not pallas_ok(12, 32, 32, 6, 96, 5, 2)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="compiled-kernel path needs the TPU "
                           "(interpret parity is covered above)")
def test_shift_sum_compiled_on_tpu():
    """Compiled (non-interpret) kernel == jnp reference on-chip at the
    production decoder-0 shape — the path the hyper train step takes
    through the DynamicConv gate."""
    b, h, w, m, co, k = 12, 32, 32, 6, 128, 5
    kz, ka = jax.random.split(jax.random.PRNGKey(4))
    z = jax.random.normal(kz, (b, h, w, m, co)).astype(jnp.bfloat16)
    atoms = jax.random.normal(ka, (b, h, w, m, k * k), jnp.float32)
    ref = jax.jit(lambda z_, a_: _reference(z_, a_, k))(z, atoms)
    got = jax.jit(lambda z_, a_: dynamic_shift_sum(z_, a_, k))(z, atoms)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    def loss_ker(z_, a_):
        return jnp.sum(dynamic_shift_sum(z_, a_, k) ** 2)

    def loss_ref(z_, a_):
        return jnp.sum(_reference(z_, a_, k) ** 2)

    gk = jax.jit(jax.grad(loss_ker, argnums=(0, 1)))(z, atoms)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(z, atoms)
    for g, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(r, np.float32),
                                   rtol=5e-2, atol=5e-2)
