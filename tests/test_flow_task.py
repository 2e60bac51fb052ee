"""Flow task tests: interface forward, metrics, end-to-end flow harness."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from test_data import make_hqf_h5
from v2v_tpu.training.flow_interface import (FlowModelInterface, flow2rgb_np,
                                             flow_metrics)

FLOW_CFG = {
    "loss": {"l1_weight": 1.0, "optical_flow_source": "gt"},
    "forward_type": "evflow",
    "model": {"target": "model.model.EVFlowNet",
              "params": {"unet_kwargs": {"num_bins": 5}}},
}


def test_flow_forward_and_loss():
    iface = FlowModelInterface(FLOW_CFG)
    params, _ = iface.init(jax.random.PRNGKey(0), 2, 32, 32)
    events = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32, 5))
    state = iface.init_state(2, 32, 32)
    pred, _ = iface.forward_sequence(params, events, state)
    assert pred.shape == (2, 3, 32, 32, 2)
    loss, aux = iface.calc_loss(pred, {
        "flow": jnp.zeros((2, 3, 32, 32, 2)),
        "data_source_idx": jnp.zeros((2,), jnp.int32)})
    assert np.isfinite(float(loss))
    assert "l1_loss" in aux


def test_evflow_flat_batch_matches_scan():
    """The non-recurrent flat-batch path (B*T batched forward) must
    match the per-step scan: values and grads, f32."""
    iface_on = FlowModelInterface(dict(FLOW_CFG, scan_split=True))
    iface_off = FlowModelInterface(dict(FLOW_CFG, scan_split=False))
    params, _ = iface_on.init(jax.random.PRNGKey(0), 2, 32, 32)
    events = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32, 5))
    state = iface_on.init_state(2, 32, 32)

    def loss(iface):
        def fn(p):
            pred, _ = iface.forward_sequence(p, events, state, train=True)
            return jnp.sum(pred ** 2)
        return jax.value_and_grad(fn)(params)

    l_on, g_on = loss(iface_on)
    l_off, g_off = loss(iface_off)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3), g_on, g_off)


def test_flow_metrics_masks():
    h, w = 8, 8
    pred = np.zeros((1, 1, h, w, 2))
    gt = np.ones((1, 1, h, w, 2))
    gt[0, 0, 0, 0] = np.nan          # invalid pixel
    gt[0, 0, 1, 1] = 0.0             # both-zero -> invalid
    events = np.zeros((1, 1, h, w, 5))
    events[0, 0, :4] = 1.0           # events only in top rows
    m = flow_metrics(pred, gt, events, "MVSEC/test")
    epe = m["MVSEC/test/dense_EPE"][0]
    # |pred-gt| = sqrt(2) on the 62 valid pixels
    assert abs(epe - np.sqrt(2)) < 1e-6
    assert m["MVSEC/test/dense_1PE"][0] == 1.0
    assert m["MVSEC/test/dense_3PE"][0] == 0.0
    s_epe = m["MVSEC/test/sparse_EPE"][0]
    assert abs(s_epe - np.sqrt(2)) < 1e-6


def test_flow2rgb():
    h, w = 16, 16
    fx = np.ones((h, w))
    fy = np.zeros((h, w))
    rgb = flow2rgb_np(fx, fy)
    assert rgb.shape == (h, w, 3) and rgb.dtype == np.uint8
    # pure +x flow maps to hue 0.5 (cyan-ish); magnitude saturates v=1
    assert rgb.max() == 255
    # zero flow -> black
    assert flow2rgb_np(np.zeros((4, 4)), np.zeros((4, 4))).max() == 0


def test_flow2rgb_matches_reference():
    """Bit-exact vs the reference flow2rgb_np (extracted by ast — the
    containing module imports torchvision/skimage, absent here)."""
    import ast
    ref_path = "/root/reference/model/train_flow_utils.py"
    if not os.path.exists(ref_path):
        import pytest
        pytest.skip("reference repo not mounted")
    tree = ast.parse(open(ref_path).read())
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "flow2rgb_np")
    ns = {"np": np}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), ref_path,
                 "exec"), ns)
    rng = np.random.RandomState(0)
    for max_mag in (None, 3.0):
        fx = rng.randn(20, 24) * 4
        fy = rng.randn(20, 24) * 4
        want = ns["flow2rgb_np"](fx, fy, max_mag)
        got = flow2rgb_np(fx, fy, max_mag)
        np.testing.assert_array_equal(got, want)
    # degenerate: all-zero flow
    z = np.zeros((8, 8))
    np.testing.assert_array_equal(flow2rgb_np(z, z),
                                  ns["flow2rgb_np"](z, z))


def test_flow_harness_end_to_end(tmp_path):
    """Both flow-test data routes (reference test_flow.py +
    train_flow_utils.py:305-326): a flow h5 scores against its stored
    GT; a reconstruction h5 (no flow key) scores against RAFT pseudo-GT
    predicted from the T+1 GT frames."""
    from v2v_tpu.eval.flow_harness import run_single_test
    from v2v_tpu.training.raft import seed_random_teacher
    h5 = make_hqf_h5(str(tmp_path / "indoor_flying1.h5"), n_frames=7,
                     with_flow=True)
    (tmp_path / "flow_test.txt").write_text(h5 + "\n")
    recon = make_hqf_h5(str(tmp_path / "outdoor_day1.h5"), n_frames=7)
    (tmp_path / "recon_test.txt").write_text(recon + "\n")
    seed_random_teacher("raft_small", 2)
    cfg = {
        "experiment_name": "flow_smoke", "task": "flow",
        "test_output_dir": "results/flow_smoke", "save_npy": True,
        "module": dict(FLOW_CFG,
                       loss={"l1_weight": 1.0,
                             "optical_flow_source": "raft_small",
                             "raft_num_flow_updates": 2}),
        "test_stage": {"test_num_workers": 1, "test": [
            {"data_file": str(tmp_path / "flow_test.txt"),
             "class_name": "data.testh5.TestH5FlowDataset",
             "dataset_name": "mvsec", "num_bins": 5,
             "sequence_length": 5},
            {"data_file": str(tmp_path / "recon_test.txt"),
             "class_name": "data.testh5.TestH5Dataset",
             "dataset_name": "mvsec", "num_bins": 5,
             "sequence_length": 5, "output_additional_frame": True,
             "image_range": 1}]},
    }
    result = run_single_test(None, cfg, root=str(tmp_path))
    assert "MVSEC/indoor_flying1/dense_EPE" in result
    # pseudo-GT route: metrics exist and are not the all-invalid 0.0
    # that a zeros target would produce
    assert np.isfinite(result["MVSEC/outdoor_day1/dense_EPE"])
    assert result["MVSEC/outdoor_day1/dense_EPE"] > 0
    dump = os.path.join(str(tmp_path), "results/flow_smoke/MVSEC/"
                        "indoor_flying1")
    files = os.listdir(dump)
    assert any(f.endswith("_flow.png") for f in files)
    assert any(f.endswith(".npy") for f in files)


def test_prepare_flow_gating():
    """Reference gating (train_flow_utils.py:307-326): stored GT is
    used for source 'gt' or at TEST time; otherwise the source fills —
    OVERWRITING stored flow at train/val."""
    iface = FlowModelInterface(dict(FLOW_CFG, loss={
        "l1_weight": 1.0, "optical_flow_source": "zeros"}))
    frames = jnp.ones((1, 4, 8, 8, 1))
    stored = jnp.full((1, 3, 8, 8, 2), 7.0)
    # test + stored flow -> GT kept
    out = iface.prepare_flow({"frame": frames, "flow": stored}, test=True)
    assert float(jnp.abs(out["flow"]).max()) == 7.0
    # train/val -> source overwrites stored flow
    out = iface.prepare_flow({"frame": frames, "flow": stored})
    assert float(jnp.abs(out["flow"]).max()) == 0.0
    assert out["flow"].shape == (1, 3, 8, 8, 2)
    # gt source without flow -> loud failure
    iface_gt = FlowModelInterface(dict(FLOW_CFG, loss={
        "l1_weight": 1.0, "optical_flow_source": "gt"}))
    import pytest
    with pytest.raises(KeyError):
        iface_gt.prepare_flow({"frame": frames})


def test_eraft_hoisted_fnet_matches_pairwise_calls():
    """_forward_eraft encodes fnet once per voxel outside the pair scan;
    it must equal the naive per-pair __call__ loop (fnet is per-sample
    instance norm, so hoisting changes nothing semantically; the fused
    path concatenates voxel1||voxel2 into one trunk batch, so float
    reassociation leaves ~3e-5 noise after 12 GRU iterations), in both
    eval and train (live cnet BN) modes."""
    from v2v_tpu.training.flow_interface import FlowModelInterface
    cfg = {
        "loss": {"l1_weight": 1.0, "optical_flow_source": "gt"},
        "forward_type": "eraft",
        "model": {"target": "model.eraft.eraft.ERAFT",
                  "params": {"config": {"subtype": "warm_start"},
                             "n_first_channels": 5}},
    }
    iface = FlowModelInterface(cfg)
    b, tp1, h, w = 2, 4, 30, 44       # non-x32: exercises _pad32
    params, state0 = iface.init(jax.random.PRNGKey(0), b, h, w)
    events = jax.random.normal(jax.random.PRNGKey(1), (b, tp1, h, w, 5))

    for train in (False, True):
        got, got_state = iface.forward_sequence(
            params, events, state0, train=train)
        state = state0
        refs = []
        for t in range(tp1 - 1):
            if train:
                (out, state), _ = iface.model.apply(
                    params, events[:, t], events[:, t + 1], state,
                    train=True, mutable=["batch_stats"])
            else:
                out, state = iface.model.apply(
                    params, events[:, t], events[:, t + 1], state)
            refs.append(out["flow"])
        ref = jnp.stack(refs, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=5e-4)
        # the warm-start splat's weight-ratio division amplifies the
        # upstream reassociation noise on near-empty cells
        np.testing.assert_allclose(np.asarray(got_state),
                                   np.asarray(state), rtol=5e-3, atol=1e-3)
