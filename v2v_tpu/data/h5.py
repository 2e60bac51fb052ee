"""Unified h5 test datasets (HQF format), torch-free.

Numpy re-implementations of the reference test data layer
(data/testh5.py): HQF-style h5 files with `images/imageNNNNNNNNN`
datasets (attrs["event_idx"] pointing into `events/{ts,xs,ys,ps}`), cut
into fixed-length streaming samples. Voxelization uses
`events_to_voxel_np` — bit-identical to the reference's make_voxel.

Batch dicts are channels-last: frame (T,H,W,C), events (T,H,W,bins),
flow (T,H,W,2). (The reference emits channels-first torch tensors;
the layout change is the only intentional difference.)
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import h5py
import numpy as np

from ..ops.voxel import events_to_voxel_np
from .sources import DATA_SOURCES


class TestH5Dataset:
    """Per-frame voxels + GT frames from an HQF-format h5
    (reference data/testh5.py:14-173)."""

    def __init__(self, h5_path: str, configs: Dict[str, Any]):
        self.h5_path = h5_path
        self.sequence_name = os.path.basename(h5_path).split(".")[0]
        self.configs = configs
        self.dataset_name = configs.get("dataset_name", "hqf")
        self.sequence_length = configs.get("sequence_length", 40)
        self.warm_up_length = configs.get("warm_up_length", 0)
        self.max_samples = configs.get("max_samples", None)
        self.num_bins = configs.get("num_bins", 5)
        self.interpolate_bins = configs.get("interpolate_bins", False)
        self.image_range = configs.get("image_range", 255)
        assert self.image_range in (255, 1)
        self.output_additional_frame = configs.get("output_additional_frame", False)
        self.output_additional_evs = configs.get("output_additional_evs", False)
        self.use_native = configs.get("use_native_voxel_builder", True)

        with h5py.File(h5_path, "r") as f:
            self.img_keys = sorted(f["images"].keys())
            self.total_frame_cnt = len(self.img_keys)
            self.H, self.W = f["images"][self.img_keys[0]].shape[:2]

        # samples = (begin, real_start_offset, end): windows of
        # sequence_length inputs stepping by (L - warm_up)
        # (data/testh5.py:41-49)
        self.samples: List[Tuple[int, int, int]] = []
        step = self.sequence_length - self.warm_up_length
        for i in range(0, self.total_frame_cnt - 1, step):
            begin = max(0, i - self.warm_up_length)
            end = min(self.total_frame_cnt - 1, begin + self.sequence_length)
            self.samples.append((begin, i - begin, end))
        if self.max_samples is not None:
            self.samples = self.samples[:self.max_samples]

    def __len__(self) -> int:
        return len(self.samples)

    def make_voxel(self, ts, xs, ys, ps) -> np.ndarray:
        if self.use_native:
            from .native import events_to_voxel_native
            return events_to_voxel_native(
                ts, xs, ys, ps, num_bins=self.num_bins, height=self.H,
                width=self.W, interpolate_bins=self.interpolate_bins)
        return events_to_voxel_np(
            ts, xs, ys, ps, num_bins=self.num_bins, height=self.H,
            width=self.W, interpolate_bins=self.interpolate_bins)

    def _slice_events(self, f, i0: int, i1: int):
        return (f["events/ts"][i0:i1], f["events/xs"][i0:i1],
                f["events/ys"][i0:i1], f["events/ps"][i0:i1])

    def _event_range(self, f, img_idx: int) -> Tuple[int, int]:
        return (f["images"][self.img_keys[img_idx]].attrs["event_idx"],
                f["images"][self.img_keys[img_idx + 1]].attrs["event_idx"])

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        begin, real_begin, end = self.samples[idx]
        frames, voxels, frame_idxs = [], [], []
        with h5py.File(self.h5_path, "r") as f:
            for img_idx in range(begin, end):
                img = f["images"][self.img_keys[img_idx + 1]][()]
                frames.append(np.asarray(img, np.float32))
                i0, i1 = self._event_range(f, img_idx)
                voxels.append(self.make_voxel(*self._slice_events(f, i0, i1)))
                frame_idxs.append(img_idx)
            if self.output_additional_frame:
                first = np.asarray(f["images"][self.img_keys[begin]][()],
                                   np.float32)
                frames.insert(0, first)
            if self.output_additional_evs:
                pre = max(0, begin - 1)
                i0 = f["images"][self.img_keys[pre]].attrs["event_idx"]
                i1 = f["images"][self.img_keys[begin]].attrs["event_idx"]
                voxels.insert(0, self.make_voxel(*self._slice_events(f, i0, i1)))

        all_frames = np.stack(frames)[..., None]          # (T,H,W,1)
        if self.image_range == 1:
            all_frames = all_frames / 255.0
        all_events = np.stack(voxels).transpose(0, 2, 3, 1).astype(np.float32)
        t = len(frame_idxs)
        # NO "flow" key: the reference builds a per-item zeros flow but
        # drops it from the returned dict (testh5.py:122,166-173); its
        # absence is what routes the flow harness to RAFT pseudo-GT at
        # test time (train_flow_utils.py:307-316). TestH5FlowDataset
        # overrides with real GT flow.
        return {
            "frame": all_frames.astype(np.float32),
            "events": all_events,                         # (T,H,W,bins)
            "data_source_idx": np.int64(DATA_SOURCES.index(
                self.dataset_name.lower())),
            "sequence_name": self.sequence_name,
            "real_begin_idx": np.full((t,), real_begin, np.int64),
            "frame_idx": np.asarray(frame_idxs, np.int64),
        }


class TestH5FlowDataset(TestH5Dataset):
    """MVSEC-style flow h5: flow keys drive sampling; events are sliced
    between flow timestamps (reference data/testh5.py:175-303)."""

    def __init__(self, h5_path: str, configs: Dict[str, Any]):
        self.h5_path = h5_path
        self.sequence_name = os.path.basename(h5_path).split(".")[0]
        self.configs = configs
        self.dataset_name = configs.get("dataset_name", "mvsec")
        self.sequence_length = configs.get("sequence_length", 40)
        self.max_samples = configs.get("max_samples", None)
        self.num_bins = configs.get("num_bins", 5)
        self.interpolate_bins = configs.get("interpolate_bins", False)
        self.image_range = configs.get("image_range", 255)
        self.output_additional_frame = configs.get("output_additional_frame", False)
        self.output_additional_evs = configs.get("output_additional_evs", False)
        self.use_native = configs.get("use_native_voxel_builder", True)

        with h5py.File(h5_path, "r") as f:
            self.img_keys = sorted(f["images"].keys())
            self.flow_keys = sorted(f["flow"].keys())
            self.total_frame_cnt = len(self.flow_keys)
            self.H, self.W = f["images"][self.img_keys[0]].shape[:2]
        self.samples = []
        for i in range(0, self.total_frame_cnt - 1, self.sequence_length):
            end = min(self.total_frame_cnt - 1, i + self.sequence_length)
            self.samples.append((i, end))
        if self.max_samples is not None:
            self.samples = self.samples[:self.max_samples]

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        begin, end = self.samples[idx]
        frames, voxels, flows, frame_idxs = [], [], [], []
        with h5py.File(self.h5_path, "r") as f:
            for flow_idx in range(begin, end):
                flow_item = f["flow"][self.flow_keys[flow_idx + 1]]
                prev_item = f["flow"][self.flow_keys[flow_idx]]
                img_idx = min(int(flow_item.attrs["image_idx"]),
                              len(self.img_keys) - 1)
                frames.append(np.asarray(
                    f["images"][self.img_keys[img_idx]][()], np.float32))
                i0 = prev_item.attrs["event_idx"]
                i1 = flow_item.attrs["event_idx"]
                voxels.append(self.make_voxel(*self._slice_events(f, i0, i1)))
                flows.append(np.asarray(flow_item[()], np.float32))
                frame_idxs.append(img_idx)
            if self.output_additional_frame:
                first_idx = int(f["flow"][self.flow_keys[begin]].attrs["image_idx"])
                frames.insert(0, np.asarray(
                    f["images"][self.img_keys[first_idx]][()], np.float32))
            if self.output_additional_evs:
                pre = max(0, begin - 1)
                i0 = f["flow"][self.flow_keys[pre]].attrs["event_idx"]
                i1 = f["flow"][self.flow_keys[begin]].attrs["event_idx"]
                voxels.insert(0, self.make_voxel(*self._slice_events(f, i0, i1)))

        all_frames = np.stack(frames)[..., None]
        if self.image_range == 1:
            all_frames = all_frames / 255.0
        # reference flow tensors are (2,H,W); convert to (H,W,2)
        all_flow = np.stack(flows)
        if all_flow.shape[1] == 2:
            all_flow = all_flow.transpose(0, 2, 3, 1)
        return {
            "frame": all_frames.astype(np.float32),
            "events": np.stack(voxels).transpose(0, 2, 3, 1).astype(np.float32),
            "flow": all_flow.astype(np.float32),
            "data_source_idx": np.int64(DATA_SOURCES.index(
                self.dataset_name.lower())),
            "sequence_name": self.sequence_name,
            "frame_idx": np.asarray(frame_idxs, np.int64),
        }


class TestH5EventDataset(TestH5Dataset):
    """Raw (N,5) [x,y,t,p,b] float64 event streams per frame window, for
    NerNet which voxelizes inside the model
    (reference data/testh5.py:305-380)."""

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        begin, real_begin, end = self.samples[idx]
        frames, events, frame_idxs = [], [], []
        with h5py.File(self.h5_path, "r") as f:
            for img_idx in range(begin, end):
                img = f["images"][self.img_keys[img_idx + 1]][()]
                frames.append(np.asarray(img, np.float32))
                i0, i1 = self._event_range(f, img_idx)
                ts, xs, ys, ps = self._slice_events(f, i0, i1)
                # float64 — float32 destroys timestamp precision
                # (data/testh5.py:329-334)
                evs = np.stack([
                    xs.astype(np.float64), ys.astype(np.float64),
                    ts.astype(np.float64),
                    ps.astype(np.float64) * 2 - 1,
                    np.zeros(len(ts), np.float64)], axis=1)
                if evs.shape[0] == 0:
                    evs = np.zeros((1, 5), np.float64)
                events.append(evs)
                frame_idxs.append(img_idx)
            if self.output_additional_frame:
                frames.insert(0, np.asarray(
                    f["images"][self.img_keys[begin]][()], np.float32))
        all_frames = np.stack(frames)[..., None]
        if self.image_range == 1:
            all_frames = all_frames / 255.0
        t = len(frame_idxs)
        return {
            "frame": all_frames.astype(np.float32),
            "events": events,                          # list of (N,5)
            "data_source_idx": np.int64(DATA_SOURCES.index(
                self.dataset_name.lower())),
            "sequence_name": self.sequence_name,
            "real_begin_idx": np.full((t,), real_begin, np.int64),
            "frame_idx": np.asarray(frame_idxs, np.int64),
        }


class TestH5CacheDataset:
    """Pre-stacked voxel caches (reference data/testh5.py:383-446)."""

    def __init__(self, h5_path: str, configs: Dict[str, Any]):
        self.h5_path = h5_path
        self.sequence_name = os.path.basename(h5_path).split(".")[0]
        self.dataset_name = configs.get("dataset_name", "hqf")
        self.sequence_length = configs.get("sequence_length", 40)
        self.num_bins = configs.get("num_bins", 5)
        self.interpolate_bins = configs.get("interpolate_bins", False)
        with h5py.File(h5_path, "r") as f:
            assert self.num_bins == f.attrs["num_bins"]
            assert self.interpolate_bins == f.attrs["interpolate_bins"]
            self.total_frame_cnt = f["frames"].shape[0]
            self.H, self.W = f["frames"].shape[1:3]
        self.samples = []
        for i in range(0, self.total_frame_cnt, self.sequence_length):
            self.samples.append((i, min(self.total_frame_cnt,
                                        i + self.sequence_length)))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        begin, end = self.samples[idx]
        with h5py.File(self.h5_path, "r") as f:
            frames = np.asarray(f["frames"][begin:end], np.float32)
            events = np.asarray(f["events"][begin:end], np.float32)
        if frames.ndim == 3:
            frames = frames[..., None]
        if events.shape[1] == self.num_bins:     # stored channels-first
            events = events.transpose(0, 2, 3, 1)
        t = end - begin
        return {
            "frame": frames,
            "events": events,
            "data_source_idx": np.int64(DATA_SOURCES.index(
                self.dataset_name.lower())),
            "sequence_name": self.sequence_name,
            "frame_idx": np.arange(begin, end, dtype=np.int64),
        }


class FPSH5Dataset(TestH5Dataset):
    """Events-only h5 sliced at a synthetic FPS (real DAVIS captures,
    EvBird; reference data/testh5.py:448-519)."""

    def __init__(self, h5_path: str, configs: Dict[str, Any]):
        self.h5_path = h5_path
        self.sequence_name = os.path.basename(h5_path).split(".")[0]
        self.configs = configs
        self.dataset_name = configs.get("dataset_name", "hqf")
        self.sequence_length = configs.get("sequence_length", 40)
        self.num_bins = configs.get("num_bins", 5)
        self.interpolate_bins = configs.get("interpolate_bins", False)
        self.FPS = configs.get("FPS", 100)
        self.H = configs.get("H", 260)
        self.W = configs.get("W", 346)
        self.use_native = configs.get("use_native_voxel_builder", True)
        with h5py.File(h5_path, "r") as f:
            min_t, max_t = f["events/ts"][0], f["events/ts"][-1]
            self.total_frame_cnt = int((max_t - min_t) * self.FPS)
            borders = np.linspace(min_t, max_t, self.total_frame_cnt + 1)
            self.event_idx = np.searchsorted(f["events/ts"][:], borders)
        self.samples = []
        for i in range(0, self.total_frame_cnt - 1, self.sequence_length):
            self.samples.append(
                (i, min(self.total_frame_cnt - 1, i + self.sequence_length)))

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        begin, end = self.samples[idx]
        voxels = []
        with h5py.File(self.h5_path, "r") as f:
            for i in range(begin, end):
                i0, i1 = self.event_idx[i], self.event_idx[i + 1]
                voxels.append(self.make_voxel(*self._slice_events(f, i0, i1)))
        return {
            "events": np.stack(voxels).transpose(0, 2, 3, 1).astype(np.float32),
            "data_source_idx": np.int64(DATA_SOURCES.index(
                self.dataset_name.lower())),
            "sequence_name": self.sequence_name,
        }
