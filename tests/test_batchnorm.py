"""BatchNorm training semantics.

The reference trains BN layers live (train.py:72 calls model.train() and
never freeze_bn): normalization uses the current batch's statistics and
running stats update with momentum 0.1 (torch nn.BatchNorm2d defaults,
unbiased variance in the running update). These tests pin TorchBatchNorm
against torch and verify the running stats actually move through the
scan + train step (ERAFT cnet, HyperE2VID atom generator, ConvLayer BN).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from v2v_tpu.models.submodules import TorchBatchNorm


def _init_bn(features):
    bn = TorchBatchNorm(features)
    x = jnp.zeros((2, 4, 4, features))
    variables = bn.init(jax.random.PRNGKey(0), x)
    return bn, variables


def test_torch_batchnorm_matches_torch():
    torch = pytest.importorskip("torch")
    f = 3
    bn, variables = _init_bn(f)
    tbn = torch.nn.BatchNorm2d(f)
    tbn.train()

    rng = np.random.RandomState(0)
    variables = dict(variables)
    for step in range(3):
        x = rng.randn(2, 5, 6, f).astype(np.float32) * (step + 1) + step
        y, mut = bn.apply(variables, jnp.asarray(x),
                          use_running_average=False,
                          mutable=["batch_stats"])
        variables["batch_stats"] = mut["batch_stats"]
        with torch.no_grad():
            yt = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(y),
                                   yt.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        tbn.running_var.numpy(), atol=1e-5)

    # eval mode: normalize with the stored statistics
    tbn.eval()
    x = rng.randn(2, 5, 6, f).astype(np.float32)
    y = bn.apply(variables, jnp.asarray(x), use_running_average=True)
    with torch.no_grad():
        yt = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y),
                               yt.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_batchnorm_no_update_without_mutable():
    bn, variables = _init_bn(2)
    x = jnp.ones((1, 3, 3, 2)) * 5
    # eval path needs no mutable and leaves stats untouched
    y = bn.apply(variables, x, use_running_average=True)
    assert np.isfinite(np.asarray(y)).all()
    # train-mode apply without mutable normalizes with batch stats but
    # cannot (and does not try to) update the running buffers
    y2 = bn.apply(variables, x, use_running_average=False)
    assert np.allclose(np.asarray(y2), np.asarray(y2)[0, 0, 0])


def test_degenerate_shapes_raise_like_torch():
    """torch refuses to train-normalize with one value per channel
    (BatchNorm2d) / one spatial element (InstanceNorm2d); a silent
    biased running-var update would let a shape bug train quietly."""
    from v2v_tpu.models.submodules import TorchInstanceNorm

    bn, variables = _init_bn(2)
    with pytest.raises(ValueError, match="value"):
        bn.apply(variables, jnp.ones((1, 1, 1, 2)),
                 use_running_average=False, mutable=["batch_stats"])

    inorm = TorchInstanceNorm(2)
    x = jnp.ones((2, 1, 1, 2))
    ivars = inorm.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="spatial"):
        inorm.apply(ivars, x, use_running_average=False,
                    mutable=["batch_stats"])


def _bn_leaves(tree):
    return np.concatenate([np.ravel(np.asarray(x))
                           for x in jax.tree.leaves(tree)])


def test_eraft_train_step_updates_running_stats():
    from v2v_tpu.training.flow_interface import FlowModelInterface
    from v2v_tpu.training.optim import Adam
    from v2v_tpu.training.steps import make_train_step

    cfg = {
        "loss": {"l1_weight": 1.0, "optical_flow_source": "gt"},
        "forward_type": "eraft",
        "model": {"target": "model.eraft.eraft.ERAFT",
                  "params": {"config": {"subtype": "warm_start"},
                             "n_first_channels": 5, "iters": 2}},
    }
    iface = FlowModelInterface(cfg)
    b, t, h, w = 1, 3, 32, 32
    params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
    assert "batch_stats" in params
    bs0 = _bn_leaves(params["batch_stats"])

    opt = Adam(lr=1e-4).make()
    opt_state = opt.init(params)
    step = make_train_step(iface, opt, sim_cfg=None, donate=False)
    batch = {
        "events": jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, 5)),
        "frame": jnp.zeros((b, t, h, w, 1)),
        "flow": jnp.zeros((b, t - 1, h, w, 2)),
    }
    params, opt_state, loss, _ = step(params, opt_state, batch,
                                      jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    bs1 = _bn_leaves(params["batch_stats"])
    assert np.isfinite(bs1).all()
    assert not np.allclose(bs0, bs1), "running stats did not move"
    # another step keeps integrating (momentum EMA, not overwrite)
    params, opt_state, loss, _ = step(params, opt_state, batch,
                                      jax.random.PRNGKey(3))
    bs2 = _bn_leaves(params["batch_stats"])
    assert not np.allclose(bs1, bs2)
    # eval forward with the learned stats stays finite
    state = iface.init_state(b, h, w)
    pred, _ = iface.forward_sequence(params, batch["events"], state)
    assert np.isfinite(np.asarray(pred)).all()


def test_convlayer_bn_model_trains_and_updates_stats():
    from v2v_tpu.training.interface import ModelInterface
    from v2v_tpu.training.optim import Adam
    from v2v_tpu.training.steps import make_train_step

    cfg = {
        "loss": {"l1_weight": 1.0},
        "model": {"target": "model.model.E2VIDRecurrent",
                  "params": {"unet_kwargs": {
                      "num_bins": 5, "base_num_channels": 4,
                      "num_encoders": 2, "num_residual_blocks": 1,
                      "norm": "BN", "kernel_size": 3}}},
    }
    iface = ModelInterface(cfg)
    b, t, h, w = 2, 3, 16, 16
    params, _ = iface.init(jax.random.PRNGKey(0), b, h, w)
    assert "batch_stats" in params
    bs0 = _bn_leaves(params["batch_stats"])

    opt = Adam(lr=1e-4).make()
    opt_state = opt.init(params)
    step = make_train_step(iface, opt, sim_cfg=None, donate=False)
    batch = {
        "events": jax.random.normal(jax.random.PRNGKey(1), (b, t, h, w, 5)),
        "frame": jnp.full((b, t, h, w, 1), 0.5),
    }
    params, opt_state, loss, _ = step(params, opt_state, batch,
                                      jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    bs1 = _bn_leaves(params["batch_stats"])
    assert np.isfinite(bs1).all()
    assert not np.allclose(bs0, bs1)


def test_optimizer_masks_batch_stats():
    """BN buffers are masked OUT of the optimizer (optax.masked in
    training/optim.py): the opt_state must carry no Adam moments for
    batch_stats leaves, and AdamW's decoupled weight decay must never
    touch them (reference semantics: torch buffers are invisible to the
    optimizer, train.py:238-239)."""
    import jax.tree_util as jtu
    from v2v_tpu.training.interface import ModelInterface
    from v2v_tpu.training.optim import AdamW

    cfg = {
        "loss": {"l1_weight": 1.0},
        "model": {"target": "model.model.E2VIDRecurrent",
                  "params": {"unet_kwargs": {
                      "num_bins": 5, "base_num_channels": 4,
                      "num_encoders": 2, "num_residual_blocks": 1,
                      "norm": "BN", "kernel_size": 3}}},
    }
    iface = ModelInterface(cfg)
    params, _ = iface.init(jax.random.PRNGKey(0), 1, 16, 16)
    assert "batch_stats" in params
    opt = AdamW(lr=1e-3, weight_decay=0.01).make()
    opt_state = opt.init(params)
    flat = jtu.tree_flatten_with_path(opt_state)[0]
    bad = [jtu.keystr(p) for p, _ in flat if "batch_stats" in jtu.keystr(p)]
    assert not bad, f"opt_state carries moments for buffers: {bad[:4]}"
    # decoupled weight decay: zero grads -> zero updates on buffers,
    # nonzero (decay) updates on real parameters
    zgrads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = opt.update(zgrads, opt_state, params)
    assert all(float(jnp.abs(u).max()) == 0.0
               for u in jax.tree.leaves(updates["batch_stats"]))
    assert any(float(jnp.abs(u).max()) > 0.0
               for u in jax.tree.leaves(updates["params"]))


def test_hyper_atom_generator_bn_updates_in_train():
    from v2v_tpu.models.hyper import DynamicAtomGeneration

    mod = DynamicAtomGeneration(kernel_size=5)
    ctx = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 32))
    variables = mod.init(jax.random.PRNGKey(1), ctx)
    out_eval = mod.apply(variables, ctx, train=False)
    out_train, mut = mod.apply(variables, ctx, train=True,
                               mutable=["batch_stats"])
    assert out_eval.shape == out_train.shape
    before = _bn_leaves(variables["batch_stats"])
    after = _bn_leaves(mut["batch_stats"])
    assert not np.allclose(before, after)


def test_batch_stats_survive_checkpoint_roundtrip(tmp_path):
    """Trained BN running stats are part of the checkpoint tree and must
    restore exactly (resume parity for from-scratch ERAFT training)."""
    from v2v_tpu.training.checkpoint import load_checkpoint, save_checkpoint
    from v2v_tpu.models.submodules import TorchBatchNorm

    bn = TorchBatchNorm(3)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3),
                    jnp.float32)
    variables = dict(bn.init(jax.random.PRNGKey(0), x))
    _, mut = bn.apply(variables, x, use_running_average=False,
                      mutable=["batch_stats"])
    variables["batch_stats"] = mut["batch_stats"]

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, jax.tree.map(np.asarray, variables), {"o": 1}, 3)
    template = jax.tree.map(np.zeros_like, variables)
    restored, _, meta = load_checkpoint(path, template, {"o": 0})
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(
        np.asarray(restored["batch_stats"]["mean"]),
        np.asarray(variables["batch_stats"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(restored["batch_stats"]["var"]),
        np.asarray(variables["batch_stats"]["var"]))
    assert float(np.abs(np.asarray(
        restored["batch_stats"]["mean"])).sum()) > 0
