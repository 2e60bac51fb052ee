"""Tests for losses, warp, normalization, padding, and metrics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from v2v_tpu.losses import losses as L
from v2v_tpu.losses.lpips import LPIPS
from v2v_tpu.ops.warp import warp_by_flow
from v2v_tpu.ops.pad import CropParameters, crop_from_multiple, pad_to_multiple
from v2v_tpu.ops.normalize import normalize_batch_voxel, normalize_nobias
from v2v_tpu.eval.metrics import mse, ssim


def test_l1_l2_reduce_modes():
    pred = jnp.asarray(np.random.RandomState(0).rand(3, 8, 8, 1))
    tgt = jnp.zeros_like(pred)
    per_b = L.l1_loss(pred, tgt, weight=2.0, reduce_batch=False)
    assert per_b.shape == (3,)
    np.testing.assert_allclose(L.l1_loss(pred, tgt, 2.0), per_b.mean(), rtol=1e-6)
    np.testing.assert_allclose(
        L.l2_loss(pred, tgt), float((np.asarray(pred) ** 2).mean()), rtol=1e-6)


def test_warp_identity_and_shift():
    x = jnp.asarray(np.random.rand(2, 10, 12, 3).astype(np.float32))
    assert np.allclose(warp_by_flow(x, jnp.zeros((2, 10, 12, 2))), x)
    flow = jnp.broadcast_to(jnp.asarray([1.0, 0.0]), (2, 10, 12, 2))
    w = np.asarray(warp_by_flow(x, flow))
    np.testing.assert_allclose(w[:, :, :-1], np.asarray(x)[:, :, 1:], atol=1e-6)
    # out-of-range -> zero padding
    assert np.allclose(w[:, :, -1], 0)


def test_temporal_consistency_zero_when_static():
    img = jnp.asarray(np.random.rand(1, 16, 16, 1).astype(np.float32))
    tc = L.temporal_consistency_loss(img, img, img, img,
                                     jnp.zeros((1, 16, 16, 2)))
    assert float(tc) < 1e-6


def test_temporal_consistency_clamp_blocks_exploit():
    """Predicting +inf must not zero the loss (utils/loss.py:45-46)."""
    img = jnp.asarray(np.random.rand(1, 16, 16, 1).astype(np.float32))
    huge = jnp.full((1, 16, 16, 1), 1e9)
    tc = L.temporal_consistency_loss(img, img, huge, huge,
                                     jnp.zeros((1, 16, 16, 2)))
    assert float(tc) < 1.0 and np.isfinite(float(tc))


def test_warp_losses_match_reference_torch():
    """warping_flow_loss and voxel_warping_flow_loss pinned against the
    reference torch originals (utils/loss.py:72-159): the reference's
    channel-swap + un-transposed-meshgrid + [y,x]-stack quirks cancel to
    a standard x=ch0/y=ch1 warp with align_corners=False sampling —
    square inputs only (its meshgrid broadcast requires W == H)."""
    import os
    import sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    import torch
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        ref = importlib.import_module("utils.loss")
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.RandomState(0)
    h = w = 24
    img0 = rng.rand(2, 1, h, w).astype(np.float32)
    img1 = rng.rand(2, 1, h, w).astype(np.float32)
    flow = (rng.randn(2, 2, h, w) * 2).astype(np.float32)

    want = float(ref.warping_flow_loss(torch.tensor(img0),
                                       torch.tensor(img1),
                                       torch.tensor(flow)))
    got = float(L.warping_flow_loss(
        jnp.asarray(img0.transpose(0, 2, 3, 1)),
        jnp.asarray(img1.transpose(0, 2, 3, 1)),
        jnp.asarray(flow.transpose(0, 2, 3, 1))))
    assert abs(want - got) < 1e-5, (want, got)

    voxel = rng.randn(2, 5, h, w).astype(np.float32)
    want_v = float(ref.voxel_warping_flow_loss(torch.tensor(voxel),
                                               torch.tensor(flow)))
    got_v = float(L.voxel_warping_flow_loss(
        jnp.asarray(voxel.transpose(0, 2, 3, 1)),
        jnp.asarray(flow.transpose(0, 2, 3, 1))))
    assert abs(want_v - got_v) < 1e-4 * max(1.0, abs(want_v)), \
        (want_v, got_v)


def test_temporal_consistency_matches_reference_torch():
    """The production TC loss (the one in every reconstruction train
    config) pinned against the reference utils/loss.py:6-69 directly,
    per-batch and reduced, on random images/flows."""
    import os
    import sys
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not mounted")
    import torch
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        ref = importlib.import_module("utils.loss")
    finally:
        sys.path.remove("/root/reference")

    rng = np.random.RandomState(1)
    b, h, w = 3, 20, 28
    i0 = rng.rand(b, 1, h, w).astype(np.float32)
    i1 = rng.rand(b, 1, h, w).astype(np.float32)
    p0 = (rng.rand(b, 1, h, w) * 2 - 0.5).astype(np.float32)
    p1 = (rng.rand(b, 1, h, w) * 2 - 0.5).astype(np.float32)
    flow = (rng.randn(b, 2, h, w) * 3).astype(np.float32)

    for reduce_batch in (True, False):
        want = ref.temporal_consistency_loss(
            torch.tensor(i0), torch.tensor(i1), torch.tensor(p0),
            torch.tensor(p1), torch.tensor(flow),
            reduce_batch=reduce_batch)
        got = L.temporal_consistency_loss(
            *(jnp.asarray(x.transpose(0, 2, 3, 1))
              for x in (i0, i1, p0, p1, flow)),
            reduce_batch=reduce_batch)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=2e-5)


def test_lpips_basic_properties():
    d = LPIPS("alex")
    a = jnp.asarray(np.random.rand(2, 64, 64, 1).astype(np.float32))
    b = jnp.asarray(np.random.rand(2, 64, 64, 1).astype(np.float32))
    dab = np.asarray(d(a, b))
    assert dab.shape == (2,) and (dab > 0).all()
    assert np.allclose(np.asarray(d(a, a)), 0.0, atol=1e-6)


def test_ssim_matches_torchmetrics_uniform():
    """Cross-check our skimage-compatible SSIM against torchmetrics with a
    uniform 7x7 kernel (same algorithm family)."""
    tm = pytest.importorskip("torchmetrics")
    import torch
    x = np.random.RandomState(0).rand(60, 80)
    y = np.clip(x + 0.1 * np.random.RandomState(1).randn(60, 80), 0, 1)
    ours = ssim(x, y, data_range=2)
    m = tm.image.StructuralSimilarityIndexMeasure(
        gaussian_kernel=False, kernel_size=7, data_range=2.0)
    theirs = float(m(torch.tensor(x)[None, None].float(),
                     torch.tensor(y)[None, None].float()))
    assert abs(ours - theirs) < 2e-3, (ours, theirs)
    assert abs(ssim(x, x) - 1.0) < 1e-9


def test_pad_to_multiple_and_crop():
    x = jnp.ones((2, 180, 240, 5))
    padded, hw = pad_to_multiple(x, 16)
    assert padded.shape == (2, 192, 240, 5)
    assert crop_from_multiple(padded, hw).shape == x.shape


def test_crop_parameters_roundtrip():
    cp = CropParameters(width=240, height=180, num_encoders=3)
    x = jnp.asarray(np.random.rand(1, 180, 240, 1))
    padded = cp.pad(x)
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    np.testing.assert_allclose(cp.crop(padded), x)


def test_normalize_batch_voxel():
    rng = np.random.RandomState(0)
    v = rng.randn(2, 4, 8, 8, 5) * 10
    out = np.asarray(normalize_batch_voxel(jnp.asarray(v)))
    assert out.shape == v.shape
    # strictly positive entries scaled down by >= the 99th percentile
    assert np.abs(out).max() <= np.abs(v).max()
    # tiny voxels (max < 1) are left unscaled (clamp to 1)
    small = jnp.asarray(rng.rand(1, 2, 4, 4, 5) * 0.5)
    np.testing.assert_allclose(normalize_batch_voxel(small), small, atol=1e-6)


def test_normalize_nobias_range():
    v = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8) * 3)
    out = np.asarray(normalize_nobias(v))
    assert out.min() >= 0 and out.max() <= 1


def test_mse():
    a, b = np.zeros((4, 4)), np.ones((4, 4))
    assert mse(a, b) == 1.0


def test_calc_loss_lpips_chunking_matches_direct():
    """The chunked/rematted LPIPS term must equal the direct per-frame
    computation (ordering check for the (T/chunk, chunk*B) fold)."""
    from v2v_tpu.training.interface import ModelInterface
    cfg = {
        "loss": {"lpips_weight": 1.0, "lpips_type": "alex"},
        "model": {"target": "model.model.E2VIDRecurrent",
                  "params": {"unet_kwargs": {
                      "num_bins": 5, "skip_type": "sum",
                      "recurrent_block_type": "convlstm",
                      "num_encoders": 3, "base_num_channels": 4,
                      "num_residual_blocks": 1, "use_upsample_conv": True,
                      "final_activation": "", "norm": "none"}}},
    }
    iface = ModelInterface(cfg)
    rng = np.random.RandomState(0)
    b, t = 2, 4
    pred = jnp.asarray(rng.rand(b, t, 64, 64, 1).astype(np.float32))
    frames = jnp.asarray(rng.rand(b, t, 64, 64, 1).astype(np.float32))
    _, aux = iface.calc_loss(pred, {"frame": frames,
                                    "data_source_idx": jnp.zeros((b,),
                                                                 jnp.int32)})
    got = np.asarray(aux["perceptual_loss"])
    want = np.zeros(b)
    for bi in range(b):
        for ti in range(t):
            want[bi] += float(iface.lpips_train(
                pred[bi:bi + 1, ti], frames[bi:bi + 1, ti], True)[0])
    want /= t
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_warp_by_flow_mxu_matches_gather():
    """The matmul warp must equal the gather warp (grid_sample
    align_corners=True + zero padding), including far OOB flow."""
    from v2v_tpu.ops.warp import warp_by_flow_mxu
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(3, 11, 14, 2).astype(np.float32))
    flow = jnp.asarray((rng.rand(3, 11, 14, 2) * 40 - 20).astype(np.float32))
    a = np.asarray(warp_by_flow(img, flow))
    b = np.asarray(warp_by_flow_mxu(img, flow))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
def test_lpips_feature_split_matches_joint(net):
    """features() + dist_from_features() == __call__ (the train loss
    precomputes GT features outside the remat region this way) — for
    every trunk the reference's lpips_type config accepts."""
    from v2v_tpu.losses.lpips import LPIPS
    lp = LPIPS(net)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    b = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    joint = np.asarray(lp._dist(a, b, True))
    split = np.asarray(lp._dist_from_feats(lp._features(a, True),
                                           lp._features(b, True)))
    np.testing.assert_allclose(joint, split, atol=1e-6)


def test_calc_loss_lpips_matches_per_frame():
    from v2v_tpu.training.interface import ModelInterface
    cfg = {"loss": {"lpips_weight": 1.0, "lpips_type": "alex"},
           "model": {"target": "model.model.E2VIDRecurrent",
                     "params": {"unet_kwargs": {
                         "num_bins": 5, "base_num_channels": 4,
                         "num_encoders": 2, "num_residual_blocks": 1,
                         "kernel_size": 3}}}}
    iface = ModelInterface(cfg)
    rng = np.random.RandomState(1)
    pred = jnp.asarray(rng.rand(2, 4, 64, 64, 1), jnp.float32)
    batch = {"frame": jnp.asarray(rng.rand(2, 4, 64, 64, 1), jnp.float32)}
    _, aux = iface.calc_loss(pred, batch)
    lp = iface.lpips_train
    ref = np.stack([np.asarray(lp._dist(pred[:, ti], batch["frame"][:, ti],
                                        True)) for ti in range(4)], 1).mean(1)
    np.testing.assert_allclose(np.asarray(aux["perceptual_loss"]), ref,
                               atol=1e-5)
    g = jax.grad(lambda p: iface.calc_loss(p, batch)[0])(pred)
    assert float(jnp.abs(g).sum()) > 0
