"""Side-by-side parity of the h5 test dataset vs the REFERENCE
data/testh5.py TestH5Dataset on identical files: window/warm-up math,
event_idx slicing, voxel binning (incl. the native builder), image
normalization, and the additional-frame/evs modes are all pinned at the
DATASET level (the voxelizer-level twins are pinned separately in
tests/test_voxel.py)."""
import os
import sys
import types

import numpy as np
import pytest

from test_data import make_hqf_h5

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")


def _ref_testh5():
    # the reference imports event_voxel_builder (a compiled pip package
    # it never calls — SURVEY.md §2.10); stub it
    if "event_voxel_builder" not in sys.modules:
        stub = types.ModuleType("event_voxel_builder")
        stub.EventVoxelBuilder = object
        sys.modules["event_voxel_builder"] = stub
    sys.path.insert(0, REFERENCE)
    try:
        import importlib
        return importlib.import_module("data.testh5")
    finally:
        sys.path.remove(REFERENCE)


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
