"""End-to-end train step tests: fused simulation + scan forward + loss +
optimizer, single device and 8-device data-parallel mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from v2v_tpu.ops.voxel import SimConfig
from v2v_tpu.training.interface import ModelInterface, aggregate_per_source
from v2v_tpu.training.optim import Adam
from v2v_tpu.training.steps import make_train_step, synthesize_batch
from v2v_tpu.parallel.mesh import make_mesh, replicate, shard_batch

MODULE_CFG = {
    "loss": {"l1_weight": 1.0},
    "model": {
        "target": "model.model.E2VIDRecurrent",
        "params": {"unet_kwargs": {
            "num_bins": 5, "skip_type": "sum",
            "recurrent_block_type": "convlstm", "num_encoders": 3,
            "base_num_channels": 4, "num_residual_blocks": 1,
            "use_upsample_conv": True, "final_activation": "",
            "norm": "none"}},
    },
}


def _video_batch(b=2, seq_len=3, num_bins=5, h=32, w=32, seed=0):
    n = seq_len * num_bins + 1
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (b, 1, h, w)).astype(np.float32)
    drift = np.cumsum(rng.randn(b, n, h, w) * 4, axis=1)
    video = np.clip(base + drift, 0, 255).astype(np.uint8)
    return {"video": jnp.asarray(video),
            "data_source_idx": jnp.full((b,), 11, jnp.int32)}


def test_synthesize_batch_shapes():
    batch = _video_batch()
    events, gt = synthesize_batch(batch["video"],
                                  jax.random.split(jax.random.PRNGKey(0), 2),
                                  SimConfig(), 5, 1)
    assert events.shape == (2, 3, 32, 32, 5)
    assert gt.shape == (2, 3, 32, 32, 1)
    assert float(gt.max()) <= 1.0


def test_train_step_learns():
    iface = ModelInterface(MODULE_CFG)
    params, _ = iface.init(jax.random.PRNGKey(0), 2, 32, 32)
    opt = Adam(lr=1e-3).make()
    opt_state = opt.init(params)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(), donate=False)
    batch = _video_batch()
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        params, opt_state, loss, aux = step(params, opt_state, batch,
                                            jax.random.fold_in(key, i % 2))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    logs = aggregate_per_source(
        {k: np.asarray(v) for k, v in aux.items() if np.ndim(v) > 0},
        np.asarray(batch["data_source_idx"]))
    assert "l1_loss/webvid" in logs


def test_train_step_with_tc_loss_zeros_flow():
    cfg = dict(MODULE_CFG)
    cfg["loss"] = {"l1_weight": 1.0, "temporal_consistency_weight": 1.0,
                   "temporal_consistency_L0": 1,
                   "optical_flow_source": "zeros"}
    iface = ModelInterface(cfg)
    params, _ = iface.init(jax.random.PRNGKey(0), 2, 32, 32)
    opt = Adam(lr=1e-4).make()
    opt_state = opt.init(params)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(), donate=False)
    params, opt_state, loss, aux = step(params, opt_state, _video_batch(),
                                        jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert "temporal_consistency_loss" in aux


def test_train_step_data_parallel_mesh():
    """The multi-chip path: batch sharded over an 8-device mesh, params
    replicated; XLA inserts the gradient all-reduce."""
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    iface = ModelInterface(MODULE_CFG)
    params, _ = iface.init(jax.random.PRNGKey(0), 8, 32, 32)
    opt = Adam(lr=1e-3).make()
    opt_state = opt.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    batch = shard_batch(_video_batch(b=8), mesh)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(), donate=False)
    params2, opt_state2, loss, _ = step(params, opt_state, batch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # grads synchronized -> params stay replicated (all shards equal)
    leaf = jax.tree.leaves(params2)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    np.testing.assert_array_equal(shards[0], shards[-1])


def test_train_step_sharded_matches_single_device():
    """Sharding must not change the numbers: the same batch + PRNG key
    through the 8-device data-parallel step and through the unsharded
    step give the same loss and the same updated params (the all-reduce
    mean equals the single-device batch mean; only summation order may
    differ -> tight tolerances, not exact equality)."""
    assert jax.device_count() >= 8
    iface = ModelInterface(MODULE_CFG)
    params, _ = iface.init(jax.random.PRNGKey(0), 8, 32, 32)
    opt = Adam(lr=1e-3).make()
    opt_state = opt.init(params)
    batch = _video_batch(b=8)
    key = jax.random.PRNGKey(1)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(), donate=False)

    p1, _, loss1, _ = step(params, opt_state, batch, key)

    mesh = make_mesh(8)
    pr = replicate(params, mesh)
    osr = replicate(opt_state, mesh)
    p8, _, loss8, _ = step(pr, osr, shard_batch(batch, mesh), key)

    assert np.isclose(float(loss1), float(loss8), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)


def test_train_step_deterministic():
    """Identical inputs -> bitwise identical loss and params (the whole
    step, simulator RNG included, is a pure function of (params, batch,
    key))."""
    iface = ModelInterface(MODULE_CFG)
    params, _ = iface.init(jax.random.PRNGKey(0), 2, 32, 32)
    opt = Adam(lr=1e-3).make()
    opt_state = opt.init(params)
    batch = _video_batch()
    key = jax.random.PRNGKey(7)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(), donate=False)
    pa, _, la, _ = step(params, opt_state, batch, key)
    pb, _, lb, _ = step(params, opt_state, batch, key)
    assert float(la) == float(lb)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flow_train_step_data_parallel_mesh():
    """Flow task (ERAFT, video mode) over the 8-device mesh: sim +
    pseudo-GT fill + warm-start carry + update, params stay replicated."""
    from v2v_tpu.training.flow_interface import FlowModelInterface
    mesh = make_mesh(8)
    cfg = {
        "loss": {"l1_weight": 1.0, "optical_flow_source": "zeros"},
        "forward_type": "eraft",
        "model": {"target": "model.eraft.eraft.ERAFT",
                  "params": {"config": {"subtype": "warm_start"},
                             "n_first_channels": 5, "iters": 1}},
    }
    iface = FlowModelInterface(cfg)
    b, L, bins, h, w = 8, 1, 5, 32, 32
    n = (L + 1) * bins + 1
    params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
    opt = Adam(lr=1e-4).make()
    opt_state = opt.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    rng = np.random.RandomState(0)
    batch = shard_batch({
        "video": jnp.asarray(rng.randint(0, 255, (b, n, h, w))
                             .astype(np.uint8)),
        "data_source_idx": jnp.full((b,), 11, jnp.int32),
    }, mesh)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(),
                           num_bins=bins, extra_frame=True, extra_evs=True,
                           donate=False)
    params2, _, loss, _ = step(params, opt_state, batch,
                               jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    leaf = jax.tree.leaves(params2)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    np.testing.assert_array_equal(shards[0], shards[-1])


def test_shard_batch_process_local_path():
    """Multi-host batch assembly: the make_array_from_process_local_data
    path (forced via process_count>1) must produce the same global array
    and sharding as the single-process device_put path (in a 1-process
    run the local shard IS the global batch)."""
    mesh = make_mesh(8)
    batch = _video_batch(b=8)
    host_batch = {k: np.asarray(v) for k, v in batch.items()}
    single = shard_batch(batch, mesh)
    multi = shard_batch(host_batch, mesh, process_count=8)
    for k in batch:
        assert multi[k].sharding == single[k].sharding, k
        np.testing.assert_array_equal(np.asarray(multi[k]),
                                      np.asarray(single[k]))
        assert len(multi[k].addressable_shards) == 8


def test_per_host_index_sharding_math():
    """DistributedSampler-replacement invariants (reference
    train.py:54-58): per-host index sets are disjoint, cover the
    dataset, and agree on the shuffle permutation across hosts."""
    from v2v_tpu.data.interface import DataLoader

    class _Fake:
        def __len__(self):
            return 103

        def __getitem__(self, i):
            return {"x": np.zeros(1)}

    loaders = [DataLoader(_Fake(), batch_size=4, shuffle=True, seed=7,
                          process_index=p, process_count=4)
               for p in range(4)]
    for epoch in (0, 1):
        for ld in loaders:
            ld.set_epoch(epoch)
        shards = [ld._indices() for ld in loaders]
        all_idx = np.concatenate(shards)
        assert len(all_idx) == 103
        assert len(np.unique(all_idx)) == 103
        # same permutation on every host: interleaving reconstructs it
        perm = np.empty(103, np.int64)
        for p, s in enumerate(shards):
            perm[p::4] = s
        rng = np.random.RandomState(7 + epoch)
        expect = np.arange(103)
        rng.shuffle(expect)
        np.testing.assert_array_equal(perm, expect)


def test_eval_forward_state_streaming():
    """State carried across chunks must equal one long forward
    (streaming eval contract, test_e2vid.py:53-67)."""
    iface = ModelInterface(MODULE_CFG)
    params, _ = iface.init(jax.random.PRNGKey(0), 1, 32, 32)
    events = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 32, 32, 5))
    s0 = iface.init_state(1, 32, 32)
    full, _ = iface.forward_sequence(params, events, s0)
    first, s_mid = iface.forward_sequence(params, events[:, :3], s0)
    second, _ = iface.forward_sequence(params, events[:, 3:], s_mid)
    np.testing.assert_allclose(np.asarray(full),
                               np.concatenate([first, second], axis=1),
                               atol=1e-5)


def test_forward_split_matches_full_scan():
    """The forward-split path (spine-only scan + T-batched pre/tail,
    interface._forward_split) must match the full-body scan: same math,
    reassociated. Values, final state, and grads, f32, for all three
    recurrent UNet families."""
    targets = ["model.model.E2VIDRecurrent", "model.model.FlowNet",
               "model.model.WFlowNet"]
    events = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 24, 24, 5))
    for target in targets:
        cfg = {"loss": {"l1_weight": 1.0},
               "model": {"target": target, "params": {"unet_kwargs": {
                   "num_bins": 5, "skip_type": "sum",
                   "recurrent_block_type": "convlstm", "num_encoders": 3,
                   "base_num_channels": 4, "num_residual_blocks": 1,
                   "use_upsample_conv": True, "final_activation": "",
                   "norm": "none"}}}}
        iface_on = ModelInterface(dict(cfg, scan_split=True))
        iface_off = ModelInterface(dict(cfg, scan_split=False))
        params, _ = iface_on.init(jax.random.PRNGKey(0), 2, 24, 24)
        s0 = iface_on.init_state(2, 24, 24)

        def loss_on(p):
            pred, st = iface_on.forward_sequence(p, events, s0, train=True)
            return jnp.sum(pred ** 2), (pred, st)

        def loss_off(p):
            pred, st = iface_off.forward_sequence(p, events, s0, train=True)
            return jnp.sum(pred ** 2), (pred, st)

        (l_on, (pred_on, st_on)), g_on = jax.value_and_grad(
            loss_on, has_aux=True)(params)
        (l_off, (pred_off, st_off)), g_off = jax.value_and_grad(
            loss_off, has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(pred_on),
                                   np.asarray(pred_off), atol=1e-5,
                                   err_msg=target)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5), st_on, st_off)
        np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4,
            rtol=1e-3, err_msg=target), g_on, g_off)


def test_forward_split_matches_full_scan_eitr():
    """ETNet's split path hoists the ENTIRE transformer pyramid +
    decoder out of the scan — same math reassociated (dropout: 0 so
    both paths are deterministic; the production 0.1 dropout draws an
    iid mask either way)."""
    cfg = {"loss": {"l1_weight": 1.0},
           "model": {"target": "model.eitr.eitr.EITR",
                     "params": {"eitr_kwargs": {
                         "num_bins": 5, "norm": "none", "dropout": 0.0}}}}
    iface_on = ModelInterface(dict(cfg, scan_split=True))
    iface_off = ModelInterface(dict(cfg, scan_split=False))
    events = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 16, 16, 5))
    params, _ = iface_on.init(jax.random.PRNGKey(0), 2, 16, 16)
    s0 = iface_on.init_state(2, 16, 16)

    def make_loss(iface):
        def fn(p):
            pred, st = iface.forward_sequence(p, events, s0, train=True)
            return jnp.sum(pred ** 2), (pred, st)
        return fn

    (l_on, (pred_on, st_on)), g_on = jax.value_and_grad(
        make_loss(iface_on), has_aux=True)(params)
    (l_off, (pred_off, st_off)), g_off = jax.value_and_grad(
        make_loss(iface_off), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(pred_on), np.asarray(pred_off),
                               atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), st_on, st_off)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=3e-4, rtol=2e-3), g_on, g_off)


def test_train_step_bf16_compute():
    """Mixed-precision option: bf16 forward/backward, f32 master params."""
    cfg = dict(MODULE_CFG)
    cfg["compute_dtype"] = "bfloat16"
    iface = ModelInterface(cfg)
    params, _ = iface.init(jax.random.PRNGKey(0), 2, 32, 32)
    opt = Adam(lr=1e-3).make()
    opt_state = opt.init(params)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(), donate=False)
    batch = _video_batch()
    losses = []
    for i in range(4):
        params, opt_state, loss, _ = step(params, opt_state, batch,
                                          jax.random.fold_in(
                                              jax.random.PRNGKey(1), i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # master params stayed f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(params)
               if jnp.issubdtype(p.dtype, jnp.floating))
    # buffers (batch_stats) are masked out of the optimizer: no opt_state
    # leaf may live under a batch_stats path (see test_batchnorm.py's
    # dedicated mask test for the BN-model case)
    import jax.tree_util as jtu
    assert not [jtu.keystr(p)
                for p, _ in jtu.tree_flatten_with_path(opt_state)[0]
                if "batch_stats" in jtu.keystr(p)]


def test_train_step_eitr_with_dropout():
    """ETNet in the training path: dropout rngs threaded through the
    scan (each timestep gets a fresh key)."""
    cfg = {
        "loss": {"l1_weight": 1.0},
        "model": {"target": "model.eitr.eitr.EITR",
                  "params": {"eitr_kwargs": {"num_bins": 5, "norm": None}}},
    }
    iface = ModelInterface(cfg)
    params, _ = iface.init(jax.random.PRNGKey(0), 1, 32, 32)
    opt = Adam(lr=1e-4).make()
    opt_state = opt.init(params)
    step = make_train_step(iface, opt, sim_cfg=SimConfig(), donate=False)
    batch = _video_batch(b=1, seq_len=2)
    params, opt_state, loss, _ = step(params, opt_state, batch,
                                      jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_train_step_esim_dataset_path():
    """Pre-voxelized (ESIM cache) batches train without the simulator."""
    iface = ModelInterface(MODULE_CFG)
    params, _ = iface.init(jax.random.PRNGKey(0), 2, 32, 32)
    opt = Adam(lr=1e-3).make()
    opt_state = opt.init(params)
    step = make_train_step(iface, opt, sim_cfg=None, donate=False)
    rng = np.random.RandomState(0)
    batch = {
        "events": jnp.asarray(rng.randn(2, 3, 32, 32, 5).astype(np.float32)),
        "frame": jnp.asarray(rng.rand(2, 3, 32, 32, 1).astype(np.float32)),
        "flow": jnp.zeros((2, 3, 32, 32, 2)),
        "data_source_idx": jnp.zeros((2,), jnp.int32),
    }
    params, opt_state, loss, _ = step(params, opt_state, batch,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_remat_policy_variants_match_full():
    """remat_policy changes memory/speed, never math: one step under
    'gates' and 'convs' must reproduce the 'full' loss exactly (same
    program modulo which tensors the backward recomputes)."""
    losses = {}
    for policy in ("full", "gates", "convs"):
        cfg = dict(MODULE_CFG)
        cfg["remat_policy"] = policy
        iface = ModelInterface(cfg)
        params, _ = iface.init(jax.random.PRNGKey(0), 2, 32, 32)
        opt = Adam(lr=1e-3).make()
        opt_state = opt.init(params)
        step = make_train_step(iface, opt, sim_cfg=SimConfig(),
                               donate=False)
        params, opt_state, loss, _ = step(params, opt_state,
                                          _video_batch(),
                                          jax.random.PRNGKey(1))
        params, opt_state, loss, _ = step(params, opt_state,
                                          _video_batch(),
                                          jax.random.PRNGKey(2))
        losses[policy] = float(loss)
    assert np.allclose(losses["full"], losses["gates"], rtol=1e-6)
    assert np.allclose(losses["full"], losses["convs"], rtol=1e-6)


def test_bf16_train_grads_trace_for_all_families():
    """compute_dtype=bfloat16 is shipped in the e2vid-task train configs;
    tracing the grad (eval_shape — no compile) catches dtype mismatches
    like the HyperE2VID DynamicConv f32-einsum/bf16-kernel clash."""
    families = {
        "e2vid": ({"target": "model.model.E2VIDRecurrent",
                   "params": {"unet_kwargs": {
                       "num_bins": 5, "base_num_channels": 4,
                       "num_encoders": 3, "num_residual_blocks": 1}}}, {}),
        "eitr": ({"target": "model.eitr.eitr.EITR",
                  "params": {"eitr_kwargs": {"num_bins": 5,
                                             "norm": "none"}}}, {}),
        "hyper": ({"target": "model.hyper_model.HyperE2VID",
                   "params": {"unet_kwargs": {
                       "num_bins": 5, "base_num_channels": 4,
                       "num_encoders": 3, "num_residual_blocks": 1}}},
                  {"hyper_epochs": 4}),
    }
    for name, (model_cfg, extra) in families.items():
        cfg = {"loss": {"l1_weight": 1.0}, "compute_dtype": "bfloat16",
               "model": model_cfg}
        cfg.update(extra)
        iface = ModelInterface(cfg)
        b, t, h, w = 1, 2, 32, 32
        params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
        events = jnp.zeros((b, t, h, w, 5))
        frames = jnp.zeros((b, t, h, w, 1))
        state0 = iface.init_state(b, h, w)

        def loss_fn(p):
            kwargs = {}
            if iface.hyper_epochs:
                kwargs = {"gt_frames": frames, "hyper_beta": jnp.float32(0.5)}
            pred, _ = iface.forward_sequence(p, events, state0, train=True,
                                             dropout_rng=jax.random.PRNGKey(1),
                                             **kwargs)
            return iface.calc_loss(pred, {"frame": frames})[0]

        out = jax.eval_shape(jax.grad(loss_fn), params)  # trace only
        assert jax.tree.structure(out) == jax.tree.structure(params), name


def test_synthesize_batch_flow_variants_and_fixed_thresholds():
    """Flow-task synthesis semantics (dataset voxel-path parity,
    data/webvid.py:348-365): extra_evs only shifts which GT frames are
    picked (the simulator always consumes the whole video), extra_frame
    yields T+1 frames at i*fpi, and fixed per-video thresholds override
    the sampled ones."""
    L, bins = 2, 5
    fpi = bins
    b, h, w = 1, 16, 16
    n = (L + 1) * fpi + 1            # eraft-style video: one extra group
    rng = np.random.RandomState(0)
    video = jnp.asarray(np.cumsum(rng.randint(0, 20, (b, n, h, w)), axis=1)
                        .clip(0, 255).astype(np.uint8))
    cfg = SimConfig(base_noise_std_range=(0.0, 0.0),
                    hot_pixel_fraction_range=(0.0, 0.0),
                    hot_pixel_std_range=(0.0, 0.0))
    keys = jax.random.split(jax.random.PRNGKey(3), b)

    ev_plain, gt_plain = synthesize_batch(video, keys, cfg, bins, 1)
    ev_flow, gt_flow = synthesize_batch(video, keys, cfg, bins, 1,
                                        extra_frame=True, extra_evs=True)
    # events identical — the flags only change GT frame indexing
    assert ev_plain.shape == (b, L + 1, h, w, bins)
    np.testing.assert_array_equal(np.asarray(ev_plain), np.asarray(ev_flow))
    # eraft frames: T+1 at fpi + i*fpi (T = L groups after the extra)
    assert gt_flow.shape == (b, L + 1, h, w, 1)
    for i in range(L + 1):
        np.testing.assert_allclose(
            np.asarray(gt_flow[:, i, ..., 0]),
            np.asarray(video[:, fpi + i * fpi]).astype(np.float32) / 255.0)
    # default frames: L+1 groups -> frames at (i+1)*fpi
    for i in range(L + 1):
        np.testing.assert_allclose(
            np.asarray(gt_plain[:, i, ..., 0]),
            np.asarray(video[:, (i + 1) * fpi]).astype(np.float32) / 255.0)
    # evflow: extra frame only
    n2 = L * fpi + 1
    video2 = video[:, :n2]
    ev2, gt2 = synthesize_batch(video2, keys, cfg, bins, 1,
                                extra_frame=True)
    assert ev2.shape == (b, L, h, w, bins)
    assert gt2.shape == (b, L + 1, h, w, 1)
    np.testing.assert_allclose(np.asarray(gt2[:, 0, ..., 0]),
                               np.asarray(video2[:, 0]).astype(np.float32)
                               / 255.0)
    # fixed thresholds: impossibly high -> zero events
    big = jnp.full((b,), 1e6, jnp.float32)
    ev_fixed, _ = synthesize_batch(video, keys, cfg, bins, 1,
                                   fixed_pos=big, fixed_neg=big)
    assert float(jnp.abs(ev_fixed).sum()) == 0.0
    assert float(jnp.abs(ev_plain).sum()) > 0.0


def test_eraft_video_mode_train_traces():
    """ERAFT training from raw video (sim + extra leading event group +
    zeros pseudo-GT): trace the grad (eval_shape, no compile) to pin
    shapes end-to-end."""
    from v2v_tpu.training.flow_interface import FlowModelInterface
    cfg = {
        "loss": {"l1_weight": 1.0, "optical_flow_source": "zeros"},
        "forward_type": "eraft",
        "model": {"target": "model.eraft.eraft.ERAFT",
                  "params": {"config": {"subtype": "warm_start"},
                             "n_first_channels": 5, "iters": 2}},
    }
    iface = FlowModelInterface(cfg)
    b, L, bins, h, w = 1, 2, 5, 32, 32
    n = (L + 1) * bins + 1                    # one extra leading group
    params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
    video = jnp.zeros((b, n, h, w), jnp.uint8)
    keys = jax.random.split(jax.random.PRNGKey(1), b)

    def loss_fn(p):
        events, gt = synthesize_batch(video, keys, SimConfig(), bins, 1,
                                      extra_frame=True, extra_evs=True)
        batch = iface.prepare_flow({"events": events, "frame": gt})
        assert batch["events"].shape == (b, L + 1, h, w, bins)
        assert batch["frame"].shape == (b, L + 1, h, w, 1)
        assert batch["flow"].shape == (b, L, h, w, 2)
        state0 = iface.init_state(b, h, w)
        pred, _, _ = iface.forward_sequence(p, batch["events"], state0,
                                            train=True, return_updates=True)
        assert pred.shape == (b, L, h, w, 2)   # pairs -> T_out = groups-1
        return iface.calc_loss(pred, batch)[0]

    out = jax.eval_shape(jax.grad(loss_fn), params)
    assert jax.tree.structure(out) == jax.tree.structure(params)


def test_flow_train_step_bf16_compute():
    """Flow-task mixed precision: the roofline dtype census caught both
    flow forwards silently running f32 (eraft 95.7% / evflow 91.4% f32
    FLOPs — docs/PERF.md). Pins the bf16 path: finite losses, f32
    master params, and a first-step loss matching the f32 run."""
    from v2v_tpu.training.flow_interface import FlowModelInterface
    # both production configs ship output_additional_frame (T+1 GT
    # frames for the teacher's pairs); eraft adds the leading group
    cases = (
        ("evflow", {"target": "model.model.EVFlowNet",
                    "params": {"unet_kwargs": {"num_bins": 5}}},
         dict(extra_frame=True, extra_evs=False)),
        ("eraft", {"target": "model.eraft.eraft.ERAFT",
                   "params": {"config": {"subtype": "warm_start"},
                              "n_first_channels": 5, "iters": 2}},
         dict(extra_frame=True, extra_evs=True)),
    )
    for ftype, model, extra in cases:
        losses = {}
        for dtype in (None, "bfloat16"):
            cfg = {"loss": {"l1_weight": 1.0,
                            "optical_flow_source": "zeros"},
                   "forward_type": ftype, "model": model}
            if dtype:
                cfg["compute_dtype"] = dtype
            iface = FlowModelInterface(cfg)
            # eraft consumes voxel PAIRS: L + extra_evs groups -> L flows
            b, L, bins, h, w = 2, (1 if ftype == "eraft" else 2), 5, 32, 32
            n = (L + (1 if extra["extra_evs"] else 0)) * bins + 1
            params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
            opt = Adam(lr=1e-3).make()
            opt_state = opt.init(params)
            rng = np.random.RandomState(0)
            batch = {"video": jnp.asarray(
                         rng.randint(0, 255, (b, n, h, w)).astype(np.uint8)),
                     "data_source_idx": jnp.full((b,), 11, jnp.int32)}
            step = make_train_step(iface, opt, sim_cfg=SimConfig(),
                                   num_bins=bins, donate=False, **extra)
            ls = []
            for i in range(3):
                params, opt_state, loss, _ = step(
                    params, opt_state, batch,
                    jax.random.fold_in(jax.random.PRNGKey(1), i))
                ls.append(float(loss))
            assert np.isfinite(ls).all(), (ftype, dtype, ls)
            assert all(p.dtype == jnp.float32
                       for p in jax.tree.leaves(params)
                       if jnp.issubdtype(p.dtype, jnp.floating)), \
                (ftype, dtype)
            losses[dtype] = ls
        f32_0, bf16_0 = losses[None][0], losses["bfloat16"][0]
        assert abs(f32_0 - bf16_0) < 0.05 * abs(f32_0) + 1e-3, \
            (ftype, f32_0, bf16_0)
