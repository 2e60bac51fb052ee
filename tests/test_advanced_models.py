"""Shape/state tests for ETNet, HyperE2VID, ERAFT, NerNet."""
import numpy as np
import jax
import jax.numpy as jnp


def test_eitr_forward():
    from v2v_tpu.models.eitr import EITR
    model = EITR(eitr_kwargs={"num_bins": 5, "norm": None})
    b, h, w = 1, 32, 40
    state = model.init_state(b, h, w)
    x = jnp.ones((b, h, w, 5))
    params = model.init(jax.random.PRNGKey(0), x, state)
    out, state1 = model.apply(params, x, state)
    assert out["image"].shape == (b, h, w, 1)
    assert 0 <= float(out["image"].min()) and float(out["image"].max()) <= 1
    out2, _ = model.apply(params, x, state1)
    assert not np.allclose(out["image"], out2["image"])


def test_eitr_pads_odd_sizes():
    from v2v_tpu.models.eitr import EITR
    model = EITR(eitr_kwargs={"num_bins": 5, "norm": None})
    b, h, w = 1, 30, 38       # not multiples of 8
    state = model.init_state(b, h, w)
    x = jnp.ones((b, h, w, 5))
    params = model.init(jax.random.PRNGKey(0), x, state)
    out, _ = model.apply(params, x, state)
    assert out["image"].shape == (b, h, w, 1)


def test_hyper_e2vid_forward_and_curriculum():
    from v2v_tpu.models.hyper import HyperE2VID
    kwargs = dict(num_bins=5, skip_type="sum", recurrent_block_type="convlstm",
                  num_encoders=3, base_num_channels=8, num_residual_blocks=1,
                  use_upsample_conv=True, norm=None, use_dynamic_decoder=True)
    model = HyperE2VID(unet_kwargs=kwargs)
    b, h, w = 1, 32, 32
    state = model.init_state(b, h, w)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 5))
    params = model.init(jax.random.PRNGKey(0), x, state)
    out, state1 = model.apply(params, x, state)
    assert out["image"].shape == (b, h, w, 1)
    # prev_recs carried: second step differs
    out2, _ = model.apply(params, x, state1)
    assert not np.allclose(out["image"], out2["image"])
    # GT-mixing curriculum path
    gt = jnp.ones((b, h, w, 1)) * 0.5
    out3, _ = model.apply(params, x, state1, gt_image=gt,
                          beta=jnp.float32(0.7))
    assert np.isfinite(np.asarray(out3["image"])).all()


def test_eraft_forward_and_warm_start():
    from v2v_tpu.models.eraft import ERAFT
    model = ERAFT(config={"subtype": "warm_start"}, n_first_channels=5,
                  iters=3)
    b, h, w = 1, 32, 32
    state = model.init_state(b, h, w)
    v1 = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 5))
    v2 = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 5))
    params = model.init(jax.random.PRNGKey(0), v1, v2, state)
    out, state1 = model.apply(params, v1, v2, state)
    assert out["flow"].shape == (b, h, w, 2)
    assert state1.shape == state.shape
    assert np.isfinite(np.asarray(out["flow"])).all()
    # warm start: different carry -> different output
    out2, _ = model.apply(params, v1, v2, state1)
    assert not np.allclose(out["flow"], out2["flow"], atol=1e-6)


def test_eraft_odd_resolution_pads_to_32():
    from v2v_tpu.models.eraft import ERAFT
    model = ERAFT(config={"subtype": "standard"}, n_first_channels=5, iters=2)
    b, h, w = 1, 40, 48
    state = model.init_state(b, h, w)
    v = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, 5))
    params = model.init(jax.random.PRNGKey(0), v, v, state)
    out, _ = model.apply(params, v, v, state)
    assert out["flow"].shape == (b, h, w, 2)


def test_nernet_forward():
    from v2v_tpu.models.nernet import RepresentationRecurrent
    kwargs = dict(num_bins=5, num_encoders=3, base_num_channels=8,
                  num_residual_blocks=1, crop_size=112,
                  mlp_layers=[1, 30, 30, 1], normalize=False,
                  use_cnn_representation=True, combine_voxel=False,
                  recurrent_network="NIAM_STcell_GCB")
    model = RepresentationRecurrent(unet_kwargs=kwargs)
    h, w = 32, 40
    state = model.init_state(1, h, w)
    rng = np.random.RandomState(0)
    n = 500
    evs = np.zeros((640, 5), np.float32)
    evs[:n, 0] = rng.randint(0, w, n)
    evs[:n, 1] = rng.randint(0, h, n)
    evs[:n, 2] = np.sort(rng.rand(n))
    evs[:n, 3] = rng.choice([-1, 1], n)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(evs),
                        jnp.int32(n), state)
    out, state1 = model.apply(params, jnp.asarray(evs), jnp.int32(n), state)
    assert out["image"].shape == (1, h, w, 1)
    assert out["voxel"].shape == (1, h, w, 10)
    assert np.abs(np.asarray(out["voxel"])).sum() > 0
    out2, _ = model.apply(params, jnp.asarray(evs), jnp.int32(n), state1)
    assert not np.allclose(out["image"], out2["image"])


def test_nernet_eval_bucket_sweep_compile_cache():
    """A realistic event-rate sweep through the interface: per-step
    streams crossing >=3 power-of-two buckets must compile once per
    (bucket, resolution) and reuse after, and padding to a bucket must
    not change the result vs a direct un-padded apply."""
    from v2v_tpu.training.interface import ModelInterface

    cfg = {
        "is_nernet": True,
        "loss": {"l1_weight": 1.0},
        "model": {"target": "model.nernet_model.RepresentationRecurrent",
                  "params": {"unet_kwargs": dict(
                      num_bins=5, num_encoders=3, base_num_channels=8,
                      num_residual_blocks=1, crop_size=112,
                      mlp_layers=[1, 30, 30, 1], normalize=False,
                      use_cnn_representation=False, combine_voxel=False,
                      recurrent_network="NIAM_STcell_GCB")}},
    }
    iface = ModelInterface(cfg)
    h, w = 32, 40
    rng = np.random.RandomState(1)

    def stream(n):
        evs = np.zeros((n, 5), np.float64)
        evs[:, 0] = rng.randint(0, w, n)
        evs[:, 1] = rng.randint(0, h, n)
        evs[:, 2] = np.sort(rng.rand(n)) + 1e9   # absolute-stamp regime
        evs[:, 3] = rng.choice([-1, 1], n)
        return evs

    # counts -> buckets: 1024, 1024, 2048, 4096, 2048, 8192
    counts = [500, 900, 1500, 3000, 1100, 5000]
    streams = [stream(n) for n in counts]
    state = iface.model.init_state(1, h, w)       # harness.py nernet init
    dummy = jnp.zeros((1024, 5), jnp.float32)
    params = iface.model.init(jax.random.PRNGKey(0), dummy, jnp.int32(0),
                              state)
    pred, state = iface.forward_sequence_nernet(params, streams, state)
    assert pred.shape == (1, len(counts), h, w, 1)
    assert np.isfinite(np.asarray(pred)).all()
    buckets = {max(1024, 1 << (n - 1).bit_length()) for n in counts}
    assert len(buckets) == 4
    assert set(iface._nernet_cache) == {(b, h, w) for b in buckets}

    # bucket padding is inert: un-padded direct apply agrees at step 0
    s0 = iface.model.init_state(1, h, w)
    evs0 = streams[0].copy()
    evs0[:, 2] -= evs0[0, 2]
    out, _ = iface.model.apply(params, jnp.asarray(evs0, jnp.float32),
                               jnp.int32(len(evs0)), s0)
    np.testing.assert_allclose(np.asarray(pred[:, 0]),
                               np.asarray(out["image"]), atol=1e-5)


def test_nernet_voxelization_matches_reference_semantics():
    """Events in one bin with t=0 contribute t*w(t)=0; last-time events
    land in the last positive bin slot."""
    from v2v_tpu.models.nernet import QuantizationLayerTrail
    q = QuantizationLayerTrail(num_bins=3, height=4, width=4)
    evs = np.zeros((8, 5), np.float32)
    evs[:2, 0] = [1, 2]
    evs[:2, 1] = [1, 2]
    evs[:2, 2] = [0.0, 1.0]
    evs[:2, 3] = [1, 1]
    params = q.init(jax.random.PRNGKey(0), jnp.asarray(evs), jnp.int32(2))
    vox = q.apply(params, jnp.asarray(evs), jnp.int32(2))
    v = np.asarray(vox)[0]                     # (H,W,6)
    # first event: t=0 -> value 0 everywhere. second: t=2 (scaled C-1)
    assert v[1, 1].sum() == 0
    assert np.abs(v[2, 2]).sum() > 0


def test_nernet_row_scatter_matches_per_bin_oracle():
    """The fast row-scatter voxelization (one (E,C)-row scatter) must
    reproduce the reference-shaped per-bin scalar scatters on shared
    params — including padded tails, both polarities, and normalize
    on/off."""
    from v2v_tpu.models.nernet import QuantizationLayerTrail
    rng = np.random.RandomState(0)
    e, h, w, c = 600, 12, 16, 5
    evs = np.zeros((e, 5), np.float32)
    evs[:, 0] = rng.randint(0, w, e)
    evs[:, 1] = rng.randint(0, h, e)
    evs[:, 2] = np.sort(rng.rand(e).astype(np.float32))
    evs[:, 3] = rng.choice([-1.0, 1.0], e)
    for normalize in (False, True):
        for n_valid in (e, 431):
            fast = QuantizationLayerTrail(num_bins=c, height=h, width=w,
                                          normalize=normalize)
            slow = QuantizationLayerTrail(num_bins=c, height=h, width=w,
                                          normalize=normalize,
                                          row_scatter=False)
            params = fast.init(jax.random.PRNGKey(1), jnp.asarray(evs),
                               jnp.int32(n_valid))
            vf = fast.apply(params, jnp.asarray(evs), jnp.int32(n_valid))
            vs = slow.apply(params, jnp.asarray(evs), jnp.int32(n_valid))
            np.testing.assert_allclose(np.asarray(vf), np.asarray(vs),
                                       atol=1e-5)
            assert float(jnp.abs(vf).sum()) > 0


def test_eitr_chunked_attention_matches_dense():
    from v2v_tpu.models.eitr import MultiheadAttention
    d, heads, n = 64, 4, 300
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (1, n, d))
    dense = MultiheadAttention(d, heads, chunk_threshold=10 ** 9)
    params = dense.init(jax.random.PRNGKey(1), q, q, q)
    out_dense = dense.apply(params, q, q, q)
    chunked = MultiheadAttention(d, heads, chunk_threshold=128)
    out_chunked = chunked.apply(params, q, q, q)
    np.testing.assert_allclose(np.asarray(out_dense),
                               np.asarray(out_chunked), atol=2e-5)

def test_lookup_pyramid_matmul_matches_gather():
    """The separable-matmul window lookup must equal the per-corner
    bilinear gather (grid_sample zero-padding semantics), including
    far out-of-range coords."""
    import jax.numpy as jnp
    from v2v_tpu.models.eraft import lookup_pyramid, _bilinear_gather
    rng = np.random.RandomState(0)
    b, h, w, r = 2, 6, 8, 3
    pyr, (hh, ww) = [], (h, w)
    for _ in range(3):
        pyr.append(jnp.asarray(rng.rand(b * h * w, hh, ww, 1)
                               .astype(np.float32)))
        hh, ww = max(hh // 2, 1), max(ww // 2, 1)
    coords = jnp.asarray((rng.rand(b, h, w, 2) * 24 - 8).astype(np.float32))
    got = np.asarray(lookup_pyramid(pyr, coords, radius=r))

    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    off_x, off_y = dy.reshape(1, -1), dx.reshape(1, -1)
    flat = coords.reshape(b * h * w, 2)
    ref = []
    for i, corr in enumerate(pyr):
        cx = flat[:, 0:1] / (2 ** i) + off_x
        cy = flat[:, 1:2] / (2 ** i) + off_y
        ref.append(np.asarray(_bilinear_gather(corr, cx, cy))
                   .reshape(b, h, w, -1))
    np.testing.assert_allclose(got, np.concatenate(ref, -1), atol=1e-5)


def test_forward_interpolate_matmul_matches_scatter():
    """The tent-weight-einsum warm-start splat must equal the
    scatter-add form (reference forward_interpolate_pytorch semantics),
    including integer coordinates (double-counted corner cancels in the
    ratio), far out-of-range splats, and empty cells."""
    import jax.numpy as jnp
    from v2v_tpu.models.eraft import (forward_interpolate,
                                      forward_interpolate_scatter)
    rng = np.random.RandomState(7)
    for h, w, scale in [(16, 16, 3.0), (33, 44, 8.0), (5, 7, 0.5),
                        (16, 16, 40.0)]:
        flow = jnp.asarray(rng.randn(3, h, w, 2).astype(np.float32)
                           * scale)
        a = np.asarray(forward_interpolate_scatter(flow))
        b = np.asarray(forward_interpolate(flow))
        np.testing.assert_allclose(a, b, atol=1e-4)
    flow = jnp.asarray(np.round(rng.randn(2, 16, 16, 2) * 3)
                       .astype(np.float32))
    np.testing.assert_allclose(np.asarray(forward_interpolate_scatter(flow)),
                               np.asarray(forward_interpolate(flow)),
                               atol=1e-5)


def test_eitr_chunked_eval_attention_under_stream_vmap():
    """The big-token eval branch (chunked query blocks off-TPU, Pallas
    flash on-TPU) must keep working under the tri-stream nn.vmap fusion
    — vmap batches the attention internals over the stacked (3,) stream
    axis. Forcing chunk_threshold below the token count must reproduce
    the einsum path bit-for-bit."""
    import v2v_tpu.models.eitr as eitr_mod

    m = eitr_mod.EITR(eitr_kwargs={"num_bins": 5, "norm": None})
    h, w = 64, 64
    x = jnp.asarray(np.random.RandomState(0).randn(1, h, w, 5) * 0.3,
                    jnp.float32)
    state = m.init_state(1, h, w)
    params = m.init(jax.random.PRNGKey(0), x, state)
    out1, _ = m.apply(params, x, state)
    old = eitr_mod.MultiheadAttention.chunk_threshold
    try:
        eitr_mod.MultiheadAttention.chunk_threshold = 16
        out2, _ = m.apply(params, x, state)
    finally:
        eitr_mod.MultiheadAttention.chunk_threshold = old
    np.testing.assert_allclose(np.asarray(out1["image"]),
                               np.asarray(out2["image"]), atol=2e-5)


def test_dynamic_conv_reorder_matches_unfold_einsum_oracle():
    """Round-4 DynamicConv reordering (models/hyper.py): applying the 1x1
    compositional contraction BEFORE the atom-weighted shift-sum must
    equal the reference's unfold-patches -> atom einsum -> 1x1 conv order
    (hyper_dynamic.py:60-92) — the channel contraction commutes with
    spatial shifts. Oracle implemented here verbatim from the old code."""
    from v2v_tpu.models.hyper import DynamicConv

    k, m, cin, cout = 5, 6, 16, 8
    b, h, w = 2, 12, 20
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    atoms = jnp.asarray(rng.randn(b, h, w, m, k * k), jnp.float32)

    mod = DynamicConv(cin, cout, k, m)
    params = mod.init(jax.random.PRNGKey(0), x, atoms)
    got = mod.apply(params, x, atoms)

    # oracle: torch-unfold patches + einsum + 1x1 composition conv
    kernel = params["params"]["compositional_coefficients"]
    bias = params["params"]["bias"]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    patches = jnp.stack(
        [xp[:, i:i + h, j:j + w, :] for i in range(k) for j in range(k)],
        axis=-1)                                       # (B,H,W,C,k*k)
    inter = jnp.einsum("bhwml,bhwcl->bhwcm", atoms, patches)
    inter = inter.reshape(b, h, w, cin * m)
    want = jax.lax.conv_general_dilated(
        inter, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
