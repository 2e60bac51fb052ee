"""RAFT teacher: structure/shape tests (numerical parity vs torchvision
requires the pretrained weights, absent in this environment — see
CLAUDE.md known gaps)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("small", [True, False])
def test_raft_forward_shapes(small):
    from v2v_tpu.training.raft import RAFT
    model = RAFT(small=small, iters=2)
    b, h, w = 1, 64, 64
    img1 = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, 3)) * 0.3
    img2 = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 3)) * 0.3
    params = model.init(jax.random.PRNGKey(2), img1, img2)
    flow = model.apply(params, img1, img2)
    assert flow.shape == (b, h, w, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_flow_requires_weights(tmp_path, monkeypatch):
    from v2v_tpu.training import raft
    monkeypatch.setenv("V2V_WEIGHTS_DIR", str(tmp_path))
    raft._cache.clear()
    frames = jnp.zeros((1, 3, 32, 32, 1))
    with pytest.raises(FileNotFoundError):
        raft.raft_flow("raft_small", frames)


@pytest.mark.parametrize("small", [True, False])
def test_raft_flow_hoisted_encode_matches_pairwise(small, tmp_path,
                                                   monkeypatch):
    """raft_flow encodes each unique frame once (consecutive pairs share
    interior frames) and pairs the feature maps up; it must equal the
    naive per-pair __call__ loop. Non-x8 resolution exercises the
    padding; f32 keeps the comparison tight."""
    from v2v_tpu.training import raft
    monkeypatch.setenv("V2V_WEIGHTS_DIR", str(tmp_path))
    raft._cache.clear()
    try:
        src = "raft_small" if small else "raft_large"
        raft.seed_random_teacher(src, num_flow_updates=2)
        model, params = raft._cache[(src, 2)]
        b, t, h, w = 2, 4, 36, 44
        frames = jax.random.uniform(jax.random.PRNGKey(3), (b, t, h, w, 1))
        got = raft.raft_flow(src, frames, l0=1, num_flow_updates=2,
                             compute_dtype=None)
        for ti in range(t - 1):
            img1 = jnp.repeat(frames[:, ti] * 2 - 1, 3, axis=-1)
            img2 = jnp.repeat(frames[:, ti + 1] * 2 - 1, 3, axis=-1)
            ref = model.apply(params, img1, img2)
            np.testing.assert_allclose(np.asarray(got[:, ti + 1]),
                                       np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)
    finally:
        raft._cache.clear()


def test_seed_random_teacher_feeds_raft_flow(tmp_path, monkeypatch):
    """The benchmark harnesses run random-weight teachers through
    seed_random_teacher; it must hit raft_flow's cache exactly (a key
    mismatch once silently broke bench_full_step)."""
    from v2v_tpu.training import raft
    monkeypatch.setenv("V2V_WEIGHTS_DIR", str(tmp_path))  # no weights
    raft._cache.clear()
    try:
        raft.seed_random_teacher("raft_small", num_flow_updates=2)
        frames = jnp.linspace(0, 1, 2 * 3 * 40 * 48).reshape(
            (2, 3, 40, 48, 1))
        flow = raft.raft_flow("raft_small", frames, l0=1,
                              num_flow_updates=2)
        assert flow.shape == (2, 3, 40, 48, 2)
        assert np.isfinite(np.asarray(flow)).all()
        assert not np.any(np.asarray(flow[:, 0]))   # zeros for t < l0
    finally:
        raft._cache.clear()


def test_raft_flow_chunked_matches_batched(tmp_path, monkeypatch):
    """The corr-budget chunking (round-5: one 720p pair costs ~0.5 GB of
    all-pairs correlation, so the fully-batched teacher OOMs at EVAID —
    found by the release rehearsal) must be a pure scheduling change:
    chunked pair batches produce the identical flow."""
    from v2v_tpu.training import raft
    monkeypatch.setenv("V2V_WEIGHTS_DIR", str(tmp_path))
    monkeypatch.setenv("V2V_RANDOM_TEACHER", "1")
    raft._cache.clear()
    raft.seed_random_teacher("raft_small", num_flow_updates=2)
    frames = jax.random.uniform(jax.random.PRNGKey(7), (2, 5, 40, 48, 1))

    ref = raft.raft_flow("raft_small", frames, l0=1, num_flow_updates=2)
    # 8 pairs; a tiny budget forces ~1-pair chunks through lax.map
    monkeypatch.setenv("V2V_RAFT_CORR_BUDGET_GB", "1e-9")
    got = raft.raft_flow("raft_small", frames, l0=1, num_flow_updates=2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-3)
    assert np.isfinite(np.asarray(got, np.float32)).all()
    # non-divisible chunking: budget for ~3 of 8 pairs (pads the tail)
    monkeypatch.setenv("V2V_RAFT_CORR_BUDGET_GB",
                       str(3 * (5 * 6) ** 2 * 2 * 1.34 / 2 ** 30))
    got3 = raft.raft_flow("raft_small", frames, l0=1, num_flow_updates=2)
    np.testing.assert_allclose(np.asarray(got3, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-3)
