"""Side-by-side parity of the h5 test dataset vs the REFERENCE
data/testh5.py TestH5Dataset on identical files: window/warm-up math,
event_idx slicing, voxel binning (incl. the native builder), image
normalization, and the additional-frame/evs modes are all pinned at the
DATASET level (the voxelizer-level twins are pinned separately in
tests/test_voxel.py)."""
import os
import sys

import numpy as np
import pytest

from conftest import ref_import
from test_data import make_hqf_h5

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


def _ref_testh5():
    return ref_import("data.testh5")


CONFIG_SWEEP = [
    {"sequence_length": 5, "num_bins": 5},
    {"sequence_length": 6, "num_bins": 5, "warm_up_length": 2},
    {"sequence_length": 4, "num_bins": 3, "interpolate_bins": True},
    {"sequence_length": 5, "num_bins": 5, "image_range": 1},
    {"sequence_length": 4, "num_bins": 5, "output_additional_frame": True,
     "output_additional_evs": True},
    {"sequence_length": 5, "num_bins": 5, "max_samples": 1},
]


@pytest.mark.parametrize("cfg", CONFIG_SWEEP)
def test_testh5_dataset_matches_reference(tmp_path, cfg):
    from v2v_tpu.data.h5 import TestH5Dataset

    ref_mod = _ref_testh5()
    h5 = make_hqf_h5(str(tmp_path / "seq.h5"), n_frames=12)

    ours = TestH5Dataset(h5, dict(cfg))
    theirs = ref_mod.TestH5Dataset(h5, dict(cfg))
    assert len(ours) == len(theirs)

    for idx in range(len(ours)):
        a = ours[idx]
        b = theirs[idx]
        # same key set — notably NO "flow" (the reference drops its
        # per-item zeros flow; absence routes the flow harness to
        # pseudo-GT)
        assert set(a.keys()) == set(b.keys())
        # reference: frame (T,1,H,W) torch, events (T,bins,H,W) torch;
        # ours: channels-last numpy
        np.testing.assert_array_equal(
            a["frame"][..., 0], b["frame"].numpy()[:, 0])
        np.testing.assert_allclose(
            a["events"].transpose(0, 3, 1, 2), b["events"].numpy(),
            atol=1e-6)
        assert int(a["data_source_idx"]) == int(b["data_source_idx"])
        np.testing.assert_array_equal(a["real_begin_idx"],
                                      b["real_begin_idx"].numpy())
        np.testing.assert_array_equal(a["frame_idx"],
                                      b["frame_idx"].numpy())
        assert a["sequence_name"] == b["sequence_name"][0]


def _ref_event_utils():
    return ref_import("utils.event_utils")


def test_event_kernels_match_reference_module():
    """Direct parity with the reference utils/event_utils.py torch
    kernels (not just our internal spec twins): scatter image (both
    interpolations), temporal-bilinear and discrete voxels, the
    polarity split, and the Zhu'19 timestamp images."""
    import torch
    import jax.numpy as jnp
    from v2v_tpu.ops import events as EV

    ref = _ref_event_utils()
    rng = np.random.RandomState(3)
    h, w, n = 14, 18, 300
    xs = (rng.rand(n) * (w - 1)).astype(np.float32)
    ys = (rng.rand(n) * (h - 1)).astype(np.float32)
    ts = np.sort(rng.rand(n)).astype(np.float32)
    ps = rng.choice([-1.0, 1.0], n).astype(np.float32)
    txs, tys, tts, tps = map(torch.tensor, (xs, ys, ts, ps))
    nev = jnp.int32(n)

    # scatter image, integer coords, no interpolation
    want = ref.events_to_image_torch(
        txs.long(), tys.long(), tps, sensor_size=(h, w),
        clip_out_of_range=False).numpy()
    got = EV.events_to_image(jnp.asarray(np.floor(xs)),
                             jnp.asarray(np.floor(ys)),
                             jnp.asarray(ps), nev, sensor_size=(h, w))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # bilinear splat with the reference's padding=True layout
    want = ref.events_to_image_torch(
        txs, tys, tps, sensor_size=(h, w), clip_out_of_range=False,
        interpolation="bilinear", padding=True).numpy()
    got = EV.events_to_image(jnp.asarray(xs), jnp.asarray(ys),
                             jnp.asarray(ps), nev, sensor_size=(h, w),
                             interpolation="bilinear", padding=True)
    np.testing.assert_allclose(got, want, atol=1e-4)

    # voxel grids, both temporal modes (reference uses integer coords
    # on the discrete path)
    for bilinear in (True, False):
        want = ref.events_to_voxel_torch(
            txs.long() if not bilinear else txs,
            tys.long() if not bilinear else tys, tts, tps, 5,
            sensor_size=(h, w), temporal_bilinear=bilinear).numpy()
        got = EV.events_to_voxel_bilinear(
            jnp.asarray(np.floor(xs) if not bilinear else xs),
            jnp.asarray(np.floor(ys) if not bilinear else ys),
            jnp.asarray(ts), jnp.asarray(ps), nev, num_bins=5,
            sensor_size=(h, w), temporal_bilinear=bilinear)
        np.testing.assert_allclose(got, want, atol=1e-4)

    # polarity split
    wp, wn = ref.events_to_neg_pos_voxel_torch(
        txs, tys, tts, tps, 5, sensor_size=(h, w))
    gp, gn = EV.events_to_neg_pos_voxel(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts),
        jnp.asarray(ps), nev, num_bins=5, sensor_size=(h, w))
    np.testing.assert_allclose(gp, wp.numpy(), atol=1e-4)
    np.testing.assert_allclose(gn, wn.numpy(), atol=1e-4)

    # Zhu'19 timestamp images (reference takes numpy, returns numpy)
    wp, wn = ref.events_to_timestamp_image(
        xs, ys, ts.astype(np.float64), ps, sensor_size=(h, w))
    gp, gn = EV.events_to_timestamp_image(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(ts),
        jnp.asarray(ps), nev, sensor_size=(h, w))
    np.testing.assert_allclose(gp, wp, atol=1e-4)
    np.testing.assert_allclose(gn, wn, atol=1e-4)


def _ref_augmentation():
    return ref_import("utils.data_augmentation")


def test_augmentation_matches_reference_seed_for_seed():
    """Seed-synchronized parity with the reference transforms: the SAME
    `random.seed` must yield the same crops/flips/rotations (identical
    draw order — a dataset re-seeds before each tensor of a sequence,
    so draw-count mismatches would desynchronize frame/voxel/flow)."""
    import random
    import torch
    from v2v_tpu.data import augmentation as A

    ref = _ref_augmentation()
    rng = np.random.RandomState(0)
    img = rng.rand(3, 20, 26).astype(np.float32)        # (C,H,W) ref layout
    flow = (rng.randn(2, 20, 26) * 2).astype(np.float32)
    ours_img = img.transpose(1, 2, 0)
    ours_flow = flow.transpose(1, 2, 0)

    # RandomCrop incl. the equal-dimension draw-consumption quirk
    for size in ((12, 16), (20, 16), (12, 26), (20, 26)):
        for seed in (0, 7):
            random.seed(seed)
            want = ref.RandomCrop(size)(torch.tensor(img)).numpy()
            marker_ref = random.random()    # stream must stay aligned
            random.seed(seed)
            got = A.RandomCrop(size)(ours_img)
            marker_ours = random.random()
            np.testing.assert_array_equal(got.transpose(2, 0, 1), want)
            assert marker_ref == marker_ours, (size, seed)

    # RandomFlip on image and flow (component sign flips)
    for seed in range(6):
        random.seed(seed)
        want = ref.RandomFlip()(torch.tensor(flow), is_flow=True).numpy()
        random.seed(seed)
        got = A.RandomFlip()(ours_flow, is_flow=True)
        np.testing.assert_array_equal(got.transpose(2, 0, 1), want)

    # RandomRotationFlip: affine_grid/grid_sample vs our numpy warp
    for seed in range(4):
        random.seed(seed)
        want = ref.RandomRotationFlip((-20, 20))(torch.tensor(img)).numpy()
        random.seed(seed)
        got = A.RandomRotationFlip((-20, 20))(ours_img)
        np.testing.assert_allclose(got.transpose(2, 0, 1), want,
                                   atol=2e-5)
        random.seed(seed)
        want_f = ref.RandomRotationFlip((-20, 20))(
            torch.tensor(flow), is_flow=True).numpy()
        random.seed(seed)
        got_f = A.RandomRotationFlip((-20, 20))(ours_flow, is_flow=True)
        np.testing.assert_allclose(got_f.transpose(2, 0, 1), want_f,
                                   atol=2e-5)

    # CenterCrop (deterministic)
    want = ref.CenterCrop((12, 16))(torch.tensor(img)).numpy()
    got = A.CenterCrop((12, 16))(ours_img)
    np.testing.assert_array_equal(got.transpose(2, 0, 1), want)


def test_norms_match_reference():
    """The voxel normalizations pinned against the reference sources:
    normalize_batch_voxel / normalize_nobias (model/train_utils.py,
    extracted by ast — the module imports torchvision) and
    RobustNorm / LegacyNorm (utils/data_augmentation.py)."""
    import ast
    import torch
    import jax.numpy as jnp
    from v2v_tpu.ops.normalize import normalize_batch_voxel, normalize_nobias
    from v2v_tpu.data import augmentation as A

    src = open(os.path.join(REFERENCE, "model/train_utils.py")).read()
    tree = ast.parse(src)
    ns = {"torch": torch}
    for name in ("normalize_batch_voxel", "normalize_nobias"):
        fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
                  and n.name == name)
        exec(compile(ast.Module(body=[fn], type_ignores=[]), "ref", "exec"),
             ns)

    rng = np.random.RandomState(0)
    vox = (rng.randn(2, 3, 5, 12, 16) * 4).astype(np.float32)  # (B,T,C,H,W)
    want = ns["normalize_batch_voxel"](torch.tensor(vox)).numpy()
    got = np.asarray(normalize_batch_voxel(jnp.asarray(vox)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    x = (rng.randn(5, 12, 16) * 3).astype(np.float32)
    want = ns["normalize_nobias"](torch.tensor(x)).numpy()
    got = np.asarray(normalize_nobias(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    ref_aug = _ref_augmentation()
    y = (rng.randn(5, 10, 14) * 2).astype(np.float32)
    y[rng.rand(*y.shape) < 0.6] = 0.0           # sparse, like voxels
    np.testing.assert_allclose(
        A.RobustNorm(0, 95)(y), ref_aug.RobustNorm(0, 95)(
            torch.tensor(y)).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        A.LegacyNorm()(y), ref_aug.LegacyNorm()(
            torch.tensor(y)).numpy(), atol=1e-5)
    # RobustNorm all-zero early-out
    z = np.zeros((2, 4, 4), np.float32)
    np.testing.assert_array_equal(A.RobustNorm()(z), z)


def test_flow_metrics_match_reference():
    """dense/sparse EPE/1PE/3PE pinned against the reference
    FlowModelInterface.compute_metrics (ast-extracted — its module
    imports skimage/torchvision, absent here), including NaN and
    zero-flow invalidity, the event mask, and empty-mask branches."""
    import ast
    from collections import defaultdict
    import torch
    from v2v_tpu.eval.flow_harness import flow_metrics

    src = open(os.path.join(REFERENCE, "model/train_flow_utils.py")).read()
    cls = next(n for n in ast.parse(src).body
               if isinstance(n, ast.ClassDef)
               and n.name == "FlowModelInterface")
    fn = next(n for n in cls.body if isinstance(n, ast.FunctionDef)
              and n.name == "compute_metrics")
    data_sources = ref_import("utils.data").data_sources
    ns = {"torch": torch, "defaultdict": defaultdict,
          "data_sources": data_sources}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "ref", "exec"), ns)

    class _Self:
        device = "cpu"

    rng = np.random.RandomState(2)
    t, h, w, bins = 3, 10, 12, 5
    pred = rng.randn(1, t, 2, h, w).astype(np.float32) * 2
    gt = rng.randn(1, t, 2, h, w).astype(np.float32) * 2
    gt[0, 0, :, :3, :3] = np.nan                # invalid: NaN
    gt[0, 1, :, 4:6, :] = 0.0                   # invalid: both-zero
    gt[0, 2] = np.nan                           # empty dense mask branch
    events = (rng.rand(1, t, bins, h, w) < 0.2).astype(np.float32)

    batch = {"sequence_name": [["indoor_flying1"]],
             "data_source_idx": torch.tensor([2]),       # mvsec
             "frame": torch.zeros(1, t + 1, 1, h, w),
             "flow": torch.tensor(gt),
             "events": torch.tensor(events)}
    want = ns["compute_metrics"](_Self(), torch.tensor(pred), batch)

    got = flow_metrics(pred.transpose(0, 1, 3, 4, 2),
                       gt.transpose(0, 1, 3, 4, 2),
                       events.transpose(0, 1, 3, 4, 2),
                       "MVSEC/indoor_flying1")
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-5, err_msg=k)


def test_esim_noise_and_webvid_helpers_match_reference():
    """Seed-matched parity for the ESIM-cache noise injectors (gaussian
    and integer Poisson*±1, voxel and persistent hot-pixel variants) and
    the WebVid helpers (log_uniform threshold sampling, BT.601
    bgr_to_gray) vs the reference modules on shared RNG state."""
    import random
    import torch  # noqa: F401 (reference module imports it)
    from v2v_tpu.data import esim as E
    from v2v_tpu.data import webvid as WV

    ref_esim = ref_import("data.esim_dataset")
    ref_wv = ref_import("data.v2v_datasets")

    rng = np.random.RandomState(0)
    vox_ref = rng.randn(3, 5, 8, 10)              # (T,C,H,W) ref layout
    vox_ours = vox_ref.transpose(0, 2, 3, 1)      # (T,H,W,C)

    for integer_noise in (False, True):
        for frac in (1.0, 0.4):
            np.random.seed(11)
            want = ref_esim.add_noise_to_voxel(
                vox_ref.copy(), noise_std=1.5, noise_fraction=frac,
                integer_noise=integer_noise)
            np.random.seed(11)
            got = E.add_noise_to_voxel(
                vox_ref.copy(), noise_std=1.5, noise_fraction=frac,
                integer_noise=integer_noise)
            np.testing.assert_array_equal(got, want)

    # hot pixels: gaussian branch is draw-for-draw identical. The
    # reference's integer branch is NOT compared: it rebinds the row
    # coordinates to the Poisson magnitudes (data/esim_dataset.py:20-22,
    # a shadowing bug on a path no shipped config enables) — ours
    # scatters at the drawn coordinates (documented divergence).
    np.random.seed(5)
    random.seed(5)
    want = ref_esim.add_hot_pixels_to_voxels(
        vox_ref.copy(), hot_pixel_std=2.0,
        max_hot_pixel_fraction=0.5, integer_noise=False)
    np.random.seed(5)
    random.seed(5)
    got = E.add_hot_pixels_to_voxels(
        vox_ours.copy(), hot_pixel_std=2.0,
        max_hot_pixel_fraction=0.5, integer_noise=False)
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)

    # our integer hot-pixel branch: noise lands at the drawn (y, x)
    # and is constant across T and C
    np.random.seed(9)
    random.seed(9)
    got = E.add_hot_pixels_to_voxels(
        vox_ours.copy(), hot_pixel_std=3.0,
        max_hot_pixel_fraction=0.5, integer_noise=True)
    noise = got - vox_ours
    np.testing.assert_allclose(                     # persistent over T, C
        noise, np.broadcast_to(noise[:1, :, :, :1], noise.shape),
        atol=1e-12)
    np.testing.assert_allclose(noise, np.round(noise),
                               atol=1e-12)          # integer-valued

    for seed in range(4):
        np.random.seed(seed)
        want = ref_wv.log_uniform(0.05, 2.0)
        np.random.seed(seed)
        assert WV.log_uniform(0.05, 2.0) == want

    imgs = rng.randint(0, 256, (2, 6, 7, 3)).astype(np.float64)
    np.testing.assert_array_equal(WV.bgr_to_gray(imgs),
                                  ref_wv.bgr_to_gray(imgs))


def test_crop_parameters_match_reference():
    """CropParameters / CropSize / CropSize3D padding and crop windows
    pinned against the reference model/model_util.py on odd and even
    sizes (centered pad with the reference's ceil/floor split)."""
    import torch
    from v2v_tpu.ops import pad as P

    ref = ref_import("model.model_util")

    rng = np.random.RandomState(0)
    for h, w, enc in ((180, 240, 3), (37, 53, 3), (33, 47, 2),
                      (64, 64, 3), (260, 346, 4)):
        r = ref.CropParameters(w, h, enc)
        o = P.CropParameters(w, h, enc)
        x = rng.rand(1, 2, h, w).astype(np.float32)
        want_pad = r.pad(torch.tensor(x)).numpy()
        got_pad_hwc = np.asarray(o.pad(x.transpose(0, 2, 3, 1)))
        np.testing.assert_array_equal(
            got_pad_hwc.transpose(0, 3, 1, 2), want_pad)
        want = r.crop(torch.tensor(want_pad)).numpy()
        got = np.asarray(o.crop(got_pad_hwc))
        np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)

    for size, factor in ((37, 3), (64, 4), (129, 5)):
        assert (P.optimal_crop_size(size, factor)
                == ref.optimal_crop_size(size, factor))


def test_webvid_pipeline_matches_reference_seed_for_seed(tmp_path):
    """THE pipeline parity test: our CPU WebVid voxel path vs the
    reference WebvidDatasetV2 on the same mp4, config, and global
    np.random state — decode/crop/flip, pause chains, per-video
    threshold + noise-strength sampling, and the full ESIM emulation
    must be draw-for-draw identical."""
    import torch  # noqa: F401
    from test_data import _write_video
    from v2v_tpu.data.webvid import WebvidDataset

    ref_mod = ref_import("data.v2v_datasets")

    root = tmp_path / "webvid"
    root.mkdir()
    n = _write_video(str(root / "v0.mp4"), n=60)
    # the reference's lists always carry stamped thresholds (4 fields)
    # and its parser requires them
    (tmp_path / "videos.txt").write_text(f"v0.mp4 {n} 0.652 0.549\n")

    cfg = {"video_list_file": str(tmp_path / "videos.txt"),
           "data_source_name": "webvid", "sequence_length": 3,
           "crop_size": 32, "num_bins": 5, "min_resize_scale": 1,
           "max_resize_scale": 1, "max_samples_per_shot": 4,
           "threshold_range": [0.05, 2], "base_noise_std_range": [0, 0.1],
           "hot_pixel_std_range": [0, 10], "video_reader": "opencv"}

    theirs = ref_mod.WebvidDatasetV2(str(root), dict(cfg))
    ours = WebvidDataset(str(root), dict(cfg, output="voxel"))
    assert len(ours) == len(theirs)

    def compare(theirs, ours, idx, seed):
        np.random.seed(seed)
        b = theirs[idx]
        np.random.seed(seed)
        a = ours[idx]
        np.testing.assert_allclose(
            a["frame"].transpose(0, 3, 1, 2), b["frame"].numpy(),
            atol=1e-6)
        np.testing.assert_allclose(
            a["events"].transpose(0, 3, 1, 2), b["events"].numpy(),
            atol=1e-4)
        assert int(a["data_source_idx"]) == int(b["data_source_idx"])

    for idx in range(min(3, len(ours))):
        compare(theirs, ours, idx, 100 + idx)

    # variants: fixed per-video thresholds (the ablation), each degrade
    # mode, and the flow-task additional-events layout
    variants = [{"use_fixed_thresholds": True},
                {"output_additional_evs": True,
                 "output_additional_frame": True}]
    variants += [{"video_degrade": m, "degrade_ratio": 1.0}
                 for m in ("subtitles", "dirtyshotcut", "hdr", "ldr")]
    for extra in variants:
        t2 = ref_mod.WebvidDatasetV2(str(root), dict(cfg, **extra))
        o2 = WebvidDataset(str(root), dict(cfg, output="voxel", **extra))
        compare(t2, o2, 0, 17)


def test_event_dataset_matches_reference(tmp_path):
    """TestH5EventDataset (raw NerNet event streams): per-frame (N,5)
    [x,y,t,p,b] float64 tensors, polarity remap, empty-window
    placeholder, and frame bookkeeping equal to the reference."""
    ref_mod = _ref_testh5()
    from v2v_tpu.data.h5 import TestH5EventDataset
    h5 = make_hqf_h5(str(tmp_path / "seq.h5"), n_frames=9)
    cfg = {"sequence_length": 4, "dataset_name": "hqf"}
    ours = TestH5EventDataset(h5, dict(cfg))
    theirs = ref_mod.TestH5EventDataset(h5, dict(cfg))
    assert len(ours) == len(theirs)
    for idx in range(len(ours)):
        a, b = ours[idx], theirs[idx]
        np.testing.assert_array_equal(a["frame"][..., 0],
                                      b["frame"].numpy()[:, 0])
        assert len(a["events"]) == len(b["events"])
        for ea, eb in zip(a["events"], b["events"]):
            np.testing.assert_array_equal(ea, eb.numpy())


def test_esim_h5_dataset_matches_reference(tmp_path):
    """ESIMH5Dataset: seed-matched crop/flip/pause-chain/noise on the
    same cached-voxel file (gaussian noise; the integer hot-pixel
    branch diverges deliberately — see add_hot_pixels_to_voxels)."""
    import random
    import torch  # noqa: F401
    from test_aux import make_esim_cache
    from v2v_tpu.data.esim import ESIMH5Dataset

    ref_mod = ref_import("data.esim_dataset")

    path = make_esim_cache(str(tmp_path / "esim.h5"))
    cfg = {"sequence_length": 8, "random_crop_size": 32,
           "noise_std": 0.3, "noise_fraction": 0.5, "hot_pixel_std": 1.0,
           "max_hot_pixel_fraction": 0.01}
    ours = ESIMH5Dataset(path, dict(cfg))
    theirs = ref_mod.ESIMH5Dataset(path, dict(cfg))
    assert len(ours) == len(theirs)
    for idx in range(len(ours)):
        random.seed(31 + idx)
        np.random.seed(31 + idx)
        b = theirs[idx]
        random.seed(31 + idx)
        np.random.seed(31 + idx)
        a = ours[idx]
        for k, ch in (("frame", 1), ("flow", 2), ("events", 5)):
            np.testing.assert_allclose(
                a[k].transpose(0, 3, 1, 2), b[k].numpy(), atol=1e-6,
                err_msg=k)
        assert int(a["data_source_idx"]) == int(b["data_source_idx"])


def test_cache_dataset_matches_reference(tmp_path):
    """TestH5CacheDataset over a cache built by our converter script:
    the reference reader and ours must return identical items."""
    import subprocess
    ref_mod = _ref_testh5()
    from subproc_env import cpu_env
    from v2v_tpu.data.h5 import TestH5CacheDataset
    src = make_hqf_h5(str(tmp_path / "seq.h5"), n_frames=9)
    (tmp_path / "list.txt").write_text(src + "\n")
    out_dir = str(tmp_path / "cache")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable,
         os.path.join(repo, "scripts", "testh5_to_voxel_cache.py"),
         str(tmp_path / "list.txt"), out_dir, "--num-bins", "5"],
        capture_output=True, text=True, env=cpu_env(), cwd=repo)
    assert r.returncode == 0, r.stderr[-1500:]
    cache = os.path.join(out_dir, "seq.h5")
    cfg = {"sequence_length": 4, "num_bins": 5, "dataset_name": "hqf"}
    ours = TestH5CacheDataset(cache, dict(cfg))
    theirs = ref_mod.TestH5CacheDataset(cache, dict(cfg))
    assert len(ours) == len(theirs)
    for idx in range(len(ours)):
        a, b = ours[idx], theirs[idx]
        # the reference returns the cache's raw (T,H,W) frames and
        # (T,bins,H,W) voxels; ours adds the channels-last layout
        np.testing.assert_allclose(a["frame"][..., 0],
                                   b["frame"].numpy(), atol=1e-6)
        np.testing.assert_allclose(a["events"].transpose(0, 3, 1, 2),
                                   b["events"].numpy(), atol=1e-6)


def test_fps_dataset_matches_reference(tmp_path):
    """FPS_H5Dataset (events-only h5 sliced at a synthetic FPS):
    border timestamps, event slicing, and voxels equal."""
    import h5py
    ref_mod = _ref_testh5()
    from v2v_tpu.data.h5 import FPSH5Dataset

    rng = np.random.RandomState(4)
    n_ev, h, w = 5000, 18, 24
    path = str(tmp_path / "evbird_seq.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("events/ts", data=np.sort(rng.rand(n_ev)) * 0.8)
        f.create_dataset("events/xs",
                         data=rng.randint(0, w, n_ev).astype(np.uint16))
        f.create_dataset("events/ys",
                         data=rng.randint(0, h, n_ev).astype(np.uint16))
        f.create_dataset("events/ps",
                         data=rng.randint(0, 2, n_ev).astype(np.uint8))

    cfg = {"FPS": 25, "sequence_length": 4, "num_bins": 5,
           "H": h, "W": w, "dataset_name": "evbird"}
    ours = FPSH5Dataset(path, dict(cfg))
    theirs = ref_mod.FPS_H5Dataset(path, dict(cfg))
    assert len(ours.samples) == len(theirs.samples)
    np.testing.assert_array_equal(ours.event_idx, theirs.event_idx)
    for idx in range(len(ours.samples)):
        a, b = ours[idx], theirs[idx]
        np.testing.assert_allclose(a["events"].transpose(0, 3, 1, 2),
                                   b["events"].numpy(), atol=1e-6)
        assert int(a["data_source_idx"]) == int(b["data_source_idx"])


def test_legacy_dynamic_h5_matches_reference(tmp_path):
    """Legacy DynamicH5Dataset (Monash format): all three voxel methods
    (between_frames / k_events / t_seconds), combined and split
    polarity channels, flow rate->displacement scaling, and the
    seed-synced transform path, vs the reference data/dataset.py."""
    import torch  # noqa: F401
    from test_legacy_scripts import make_monash_h5
    from v2v_tpu.data.legacy import DynamicH5Dataset

    ref_mod = ref_import("data.dataset")

    h5 = make_monash_h5(str(tmp_path / "seq.h5"))

    def compare(kwargs, tol=1e-5, last=None):
        ours = DynamicH5Dataset(h5, **kwargs)
        theirs = ref_mod.DynamicH5Dataset(h5, **kwargs)
        assert len(ours) == len(theirs)
        for idx in range(len(ours) if last is None else last):
            a = ours.__getitem__(idx, seed=123 + idx)
            b = theirs.__getitem__(idx, seed=123 + idx)
            ev_b = b["events"].numpy()
            np.testing.assert_allclose(
                np.moveaxis(a["events"], -1, 0), ev_b, atol=tol,
                err_msg=str(kwargs))
            assert np.isclose(float(a["dt"]), float(b["dt"]))
            if "frame" in b:
                np.testing.assert_allclose(
                    a["frame"][..., 0], b["frame"].numpy()[0], atol=tol)
                np.testing.assert_allclose(
                    np.moveaxis(a["flow"], -1, 0), b["flow"].numpy(),
                    atol=tol)

    compare({})                                        # between_frames
    compare({"combined_voxel_channels": False})
    compare({"voxel_method": {"method": "t_seconds", "t": 0.2,
                              "sliding_window_t": 0.1}})
    compare({"transforms": {"RandomCrop": {"size": 16}}})
    compare({"temporal_bilinear": True})

    # k_events with a sliding window: the reference's own trailing
    # windows index past num_events and raise at __getitem__
    # (dataset.py:261-272,297-304: length=num_events/(k-w) but
    # idx1=idx0+k); we clamp via h5 slicing instead. Compare the
    # windows the reference can serve, pin its overflow behavior.
    kw = {"voxel_method": {"method": "k_events", "k": 120,
                           "sliding_window_w": 60}}
    compare(kw, last=18)                   # (1200-120)/60 = 18 valid
    import pytest
    with pytest.raises(Exception, match="out of bounds"):
        ref_mod.DynamicH5Dataset(h5, **kw).__getitem__(19, seed=0)
    DynamicH5Dataset(h5, **kw).__getitem__(19, seed=0)   # ours clamps


def test_legacy_sequence_dataset_matches_reference(tmp_path):
    """Legacy SequenceDataset: pause chains, one shared transform seed
    across all items of a sequence, zeroed events/flow during pauses —
    vs the reference (noise/hot-pixel kwargs excluded: the reference
    draws those from torch's RNG, ours from numpy — statistically
    matched, not seed-matchable)."""
    import random
    import torch  # noqa: F401
    from test_legacy_scripts import make_monash_h5
    from v2v_tpu.data.legacy import SequenceDataset

    ref_mod = ref_import("data.dataset")

    h5 = make_monash_h5(str(tmp_path / "seq.h5"))
    kwargs = dict(sequence_length=3, dataset_type="DynamicH5Dataset",
                  proba_pause_when_running=0.4,
                  proba_pause_when_paused=0.8,
                  dataset_kwargs={"transforms": {"RandomCrop": {"size": 16}}})
    ours = SequenceDataset(h5, **kwargs)
    theirs = ref_mod.SequenceDataset(h5, **kwargs)
    assert len(ours) == len(theirs)
    for idx in range(len(ours)):
        random.seed(77 + idx)
        np.random.seed(77 + idx)
        b = theirs[idx]
        random.seed(77 + idx)
        np.random.seed(77 + idx)
        a = ours[idx]
        assert len(a) == len(b)
        for ia, ib in zip(a, b):
            np.testing.assert_allclose(
                np.moveaxis(ia["events"], -1, 0), ib["events"].numpy(),
                atol=1e-5)
            np.testing.assert_allclose(
                ia["frame"][..., 0], ib["frame"].numpy()[0], atol=1e-5)
            np.testing.assert_allclose(
                np.moveaxis(ia["flow"], -1, 0), ib["flow"].numpy(),
                atol=1e-5)


def test_legacy_memmap_dataset_matches_reference(tmp_path):
    """Legacy MemMapDataset (RPG memmap dirs) vs the reference."""
    import torch  # noqa: F401
    from v2v_tpu.data.legacy import MemMapDataset

    ref_mod = ref_import("data.dataset")

    rng = np.random.RandomState(0)
    root = tmp_path / "memmap"
    root.mkdir()
    n_ev, n_img, h, w = 600, 5, 16, 16
    np.save(root / "t.npy", np.sort(rng.rand(n_ev)))
    np.save(root / "xy.npy", rng.randint(0, 16, (n_ev, 2)))
    np.save(root / "p.npy", rng.randint(0, 2, n_ev))
    np.save(root / "images.npy", rng.randint(0, 255, (n_img, h, w, 1),
                                             dtype=np.uint8))
    np.save(root / "timestamps.npy", np.linspace(0, 1, n_img))

    ours = MemMapDataset(str(root))
    theirs = ref_mod.MemMapDataset(str(root))
    assert len(ours) == len(theirs)
    for idx in range(len(ours)):
        a = ours.__getitem__(idx, seed=5)
        b = theirs.__getitem__(idx, seed=5)
        np.testing.assert_allclose(np.moveaxis(a["events"], -1, 0),
                                   b["events"].numpy(), atol=1e-5)
        np.testing.assert_allclose(a["frame"][..., 0],
                                   b["frame"].numpy()[0], atol=1e-5)
        assert np.isclose(float(a["dt"]), float(b["dt"]))


def test_testh5_flow_dataset_matches_reference(tmp_path):
    from v2v_tpu.data.h5 import TestH5FlowDataset

    ref_mod = _ref_testh5()
    h5 = make_hqf_h5(str(tmp_path / "indoor.h5"), n_frames=10,
                     with_flow=True)
    cfg = {"sequence_length": 4, "num_bins": 5}
    ours = TestH5FlowDataset(h5, dict(cfg))
    theirs = ref_mod.TestH5FlowDataset(h5, dict(cfg))
    assert len(ours) == len(theirs)
    for idx in range(len(ours)):
        a = ours[idx]
        b = theirs[idx]
        np.testing.assert_allclose(
            a["events"].transpose(0, 3, 1, 2), b["events"].numpy(),
            atol=1e-6)
        np.testing.assert_allclose(
            a["flow"].transpose(0, 3, 1, 2), b["flow"].numpy(), atol=1e-6)
