"""WebVid online training dataset.

Host-side half of the V2V pipeline (reference
data/v2v_datasets.py:24-486): video list parsing, per-shot sample
enumeration, OpenCV decode, watermark-avoidance crop
(keep_top_percentile), random resize/crop/h-flip, camera-shake synthesis,
Markov pause chains, and the degradation ablations.

Two output modes:
  * output="video" (default, the TPU path): emits the raw uint8 frame
    stack; voxel synthesis runs fused on device in the train step
    (v2v_tpu/training/steps.py). This is the design inversion — the
    reference simulates in numpy here, in the dataloader worker.
  * output="voxel" (parity/CPU fallback): runs the numpy ESIM emulator
    exactly like the reference (imgs_to_voxels,
    data/v2v_datasets.py:363-410) and emits voxels + frames.
"""
from __future__ import annotations

import os
import threading
from typing import Any, Dict, List, Tuple

import cv2
import numpy as np

from .sources import DATA_SOURCES

# serializes fixed_seed items across loader threads (global np.random)
_GLOBAL_RNG_LOCK = threading.Lock()


def log_uniform(minval: float, maxval: float) -> float:
    """(reference data/v2v_datasets.py:12-17)"""
    eps = 1e-3
    logval = np.random.uniform(np.log(minval + eps), np.log(maxval + eps))
    return float(np.exp(logval) - eps)


def bgr_to_gray(img_stack: np.ndarray) -> np.ndarray:
    """(N,H,W,3) BGR -> (N,H,W) gray, BT.601 with the reference's channel
    order (data/v2v_datasets.py:19-22)."""
    gray = np.dot(img_stack[..., :3], [0.5870, 0.1140, 0.2989])
    return gray.astype(np.uint8)


class WebvidDataset:
    """Reference WebvidDatasetV2 (data/v2v_datasets.py:95-361)."""

    def __init__(self, dataset_path: str, configs: Dict[str, Any]):
        self.dataset_path = dataset_path
        c = configs
        self.L = c.get("sequence_length", 40)
        self.proba_pause_when_running = c.get("proba_pause_when_running", 0.01)
        self.proba_pause_when_paused = c.get("proba_pause_when_paused", 0.98)
        self.fixed_seed = c.get("fixed_seed", None)
        self.crop_size = c.get("crop_size", None)
        self.fixed_crop = c.get("fixed_crop", False)
        self.random_flip = c.get("random_flip", True)
        self.num_bins = c.get("num_bins", 5)
        self.frames_per_bin = c.get("frames_per_bin", 1)
        self.frames_per_img = self.num_bins * self.frames_per_bin
        self.frames_per_seq = self.frames_per_img * self.L
        step_size = c.get("step_size", None)
        self.step_size = step_size if step_size is not None else self.frames_per_seq
        self.min_resize_scale = c.get("min_resize_scale", 0)
        self.max_resize_scale = c.get("max_resize_scale", 1.3)
        self.shake_frames = c.get("shake_frames", 0)
        self.shake_std = c.get("shake_std", 0)
        self.threshold_range = c.get("threshold_range", [0.05, 2])
        self.max_thres_pos_neg_gap = c.get("max_thres_pos_neg_gap", 1.5)
        self.base_noise_std_range = c.get("base_noise_std_range", [0, 0.2])
        self.hot_pixel_fraction_range = c.get("hot_pixel_fraction_range", [0, 0.001])
        self.hot_pixel_std_range = c.get("hot_pixel_std_range", [0, 0.2])
        self.put_noise_external = c.get("put_noise_external", False)
        self.scale_noise_strength = c.get("scale_noise_strength", False)
        self.max_samples_per_shot = c.get("max_samples_per_shot", 1)
        self.subsample_ratio = c.get("subsample_ratio", 1)
        self.keep_top_percentile = c.get("keep_top_percentile", 0.54)
        self.use_fixed_thresholds = c.get("use_fixed_thresholds", False)
        self.data_source_name = c.get("data_source_name", "reds")
        self.data_source_idx = DATA_SOURCES.index(self.data_source_name)
        self.color_mode = c.get("color_mode", "gray")
        assert self.color_mode in ("gray", "gray_in_bgr_out")
        self.output_additional_frame = c.get("output_additional_frame", False)
        self.output_additional_evs = c.get("output_additional_evs", False)
        if self.output_additional_evs:
            self.frames_per_seq += self.frames_per_img
        self.video_degrade = c.get("video_degrade", None)
        assert self.video_degrade in (None, "subtitles", "dirtyshotcut",
                                      "hdr", "ldr")
        self.degrade_ratio = c.get("degrade_ratio", 0)
        self.output = c.get("output", "video")
        assert self.output in ("video", "voxel")

        # video list: `subpath framecount [pos_thres neg_thres]`
        # (data/v2v_datasets.py:99-109)
        video_list_file = c["video_list_file"]
        names, counts, pos_t, neg_t = [], [], [], []
        with open(video_list_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                names.append(parts[0])
                counts.append(int(parts[1]))
                pos_t.append(float(parts[2]) if len(parts) > 2 else 0.0)
                neg_t.append(float(parts[3]) if len(parts) > 3 else 0.0)

        self.sample_video_name: List[str] = []
        self.sample_begin_idx: List[int] = []
        self.sample_pos_thres: List[float] = []
        self.sample_neg_thres: List[float] = []
        for vi, (name, cnt) in enumerate(zip(names, counts)):
            shot_samples = 0
            for i in range(0, cnt - self.frames_per_seq - 1, self.step_size):
                self.sample_video_name.append(name)
                self.sample_begin_idx.append(i)
                self.sample_pos_thres.append(pos_t[vi])
                self.sample_neg_thres.append(neg_t[vi])
                shot_samples += 1
                if shot_samples >= self.max_samples_per_shot:
                    break
        keep = int(len(self.sample_video_name) * self.subsample_ratio)
        self.sample_video_name = self.sample_video_name[:keep]
        self.sample_begin_idx = self.sample_begin_idx[:keep]
        self.sample_pos_thres = self.sample_pos_thres[:keep]
        self.sample_neg_thres = self.sample_neg_thres[:keep]

    def __len__(self) -> int:
        return len(self.sample_video_name)

    # -- decode ---------------------------------------------------------
    def read_video(self, video_path, start_frame, end_frame,
                   crop_size_before_resize, min_i, min_j, flip):
        """OpenCV decode + crop + resize + flip + shake
        (data/v2v_datasets.py:145-225)."""
        all_di = [0] * (end_frame - start_frame)
        all_dj = [0] * (end_frame - start_frame)
        if self.shake_frames > 0:
            vi = vj = di = dj = 0
            for i in range(min(self.shake_frames,
                               end_frame - start_frame) - 1, -1, -1):
                vi += int(np.random.normal(0, self.shake_std))
                vj += int(np.random.normal(0, self.shake_std))
                di += vi
                dj += vj
                all_di[i] = di
                all_dj[i] = dj
        extra_h = max(all_di) - min(all_di)
        extra_w = max(all_dj) - min(all_dj)
        need_h = self.crop_size + extra_h
        need_w = self.crop_size + extra_w

        cap = cv2.VideoCapture(video_path)
        cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
        imgs = []
        for _ in range(start_frame, end_frame):
            ret, frame = cap.read()
            if not ret:
                break
            if self.color_mode == "gray":
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            frame = frame[min_i:min_i + crop_size_before_resize,
                          min_j:min_j + crop_size_before_resize, ...]
            frame = cv2.resize(frame, (need_w, need_h),
                               interpolation=cv2.INTER_LINEAR)
            if flip:
                frame = cv2.flip(frame, 1)
            if frame.ndim == 2:
                frame = frame[..., None]
            imgs.append(frame)
        cap.release()

        di = np.array(all_di) - min(all_di)
        dj = np.array(all_dj) - min(all_dj)
        return [img[di[i]:di[i] + self.crop_size,
                    dj[i]:dj[i] + self.crop_size, :]
                for i, img in enumerate(imgs)]

    # -- augmentation ---------------------------------------------------
    def pause_chain(self, total_inputs: int) -> Tuple[List[int], int]:
        """Markov pause process over frame indices
        (data/v2v_datasets.py:285-301). Returns (img_idxes, read_count);
        read_count is the reference's `idx + 1` AFTER the final
        state update — usually one more frame than img_idxes uses. The
        extra decoded frame is invisible except to `dirtyshotcut`,
        whose reordering pulls it into the sequence (parity-pinned in
        tests/test_dataset_parity.py)."""
        img_idxes, idx, is_pause = [], 0, False
        for _ in range(total_inputs):
            img_idxes.append(idx)
            if is_pause and np.random.rand() > self.proba_pause_when_paused:
                is_pause = False
            elif not is_pause and np.random.rand() < self.proba_pause_when_running:
                is_pause = True
            if not is_pause:
                idx += 1
        return img_idxes, idx + 1

    def degrade_video(self, imgs: List[np.ndarray]) -> List[np.ndarray]:
        """Quality-degradation ablations (data/v2v_datasets.py:413-486)."""
        t = len(imgs)
        if self.video_degrade == "subtitles":
            fonts = [cv2.FONT_HERSHEY_SIMPLEX, cv2.FONT_HERSHEY_PLAIN,
                     cv2.FONT_HERSHEY_DUPLEX, cv2.FONT_HERSHEY_COMPLEX,
                     cv2.FONT_HERSHEY_TRIPLEX, cv2.FONT_HERSHEY_COMPLEX_SMALL,
                     cv2.FONT_HERSHEY_SCRIPT_SIMPLEX,
                     cv2.FONT_HERSHEY_SCRIPT_COMPLEX]
            font = int(np.random.choice(fonts))
            scale = np.random.uniform(0.5, 1.5)
            color = tuple(int(np.random.randint(0, 256)) for _ in range(3))
            thickness = int(np.random.randint(1, 3))
            chars = list("abcdefghijklmnopqrstuvwxyz"
                         "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ")
            text = "".join(np.random.choice(chars,
                                            np.random.randint(5, 16)))
            h, w = imgs[0].shape[:2]
            (tw, th), baseline = cv2.getTextSize(text, font, scale, thickness)
            org = (int(np.random.randint(0, max(1, w - tw))),
                   int(np.random.randint(th, max(th + 1, h - baseline))))
            for i in range(t):
                img = imgs[i].copy()
                gray_in = img.shape[2] == 1
                if gray_in:
                    img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
                cv2.putText(img, text, org, font, scale, color, thickness,
                            cv2.LINE_AA)
                if gray_in:
                    img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)[..., None]
                imgs[i] = img
            return imgs
        if self.video_degrade == "dirtyshotcut":
            if t < 3:
                return imgs
            c = imgs[0].shape[2]
            cut = int(np.random.randint(1, t - 1))
            flip_first = np.random.rand() > 0.5
            seg = slice(0, cut) if flip_first else slice(cut, t)
            flipped = [cv2.flip(img, 1) for img in imgs[seg]]
            flipped = [f[..., None] if f.ndim == 2 else f for f in flipped]
            imgs[seg] = flipped
            return imgs[cut:] + imgs[:cut]
        if self.video_degrade in ("hdr", "ldr"):
            scale = (np.random.uniform(1, 3) if self.video_degrade == "hdr"
                     else np.random.uniform(0.3, 1))
            return [np.clip((img.astype(np.float32) - 127.5) * scale + 127.5,
                            0, 255).astype(np.uint8) for img in imgs]
        raise NotImplementedError(self.video_degrade)

    # -- main -----------------------------------------------------------
    def __getitem__(self, sample_idx: int) -> Dict[str, Any]:
        if self.fixed_seed is not None:
            # seed -> sample -> restore must be atomic: the dataset uses
            # the global np.random (reference semantics, fork-worker
            # model); with thread workers concurrent items would clobber
            # the seeded state (tests/test_data.py pins this).
            # (The reference's own fixed_seed branch reads `idx` before
            # assignment — v2v_datasets.py:239, UnboundLocalError — so
            # no shipped config uses it; `sample_idx` is what was meant.)
            with _GLOBAL_RNG_LOCK:
                old_state = np.random.get_state()
                np.random.seed(self.fixed_seed + sample_idx)
                try:
                    return self._getitem(sample_idx)
                finally:
                    np.random.set_state(old_state)
        return self._getitem(sample_idx)

    def _getitem(self, sample_idx: int) -> Dict[str, Any]:
        video_name = self.sample_video_name[sample_idx]
        start_frame = self.sample_begin_idx[sample_idx]
        video_path = os.path.join(self.dataset_path, video_name)

        cap = cv2.VideoCapture(video_path)
        vid_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        vid_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        cap.release()

        if self.crop_size is None:
            raise NotImplementedError("crop_size must be provided")
        min_scale = max(self.min_resize_scale,
                        self.crop_size / int(vid_h * self.keep_top_percentile),
                        self.crop_size / vid_w)
        max_scale = max(self.max_resize_scale, min_scale)
        resize_scale = np.random.uniform(min_scale, max_scale)
        crop_before = int(self.crop_size / resize_scale)

        if self.fixed_crop:
            min_i = min_j = 0
        else:
            min_i = np.random.randint(
                0, int(vid_h * self.keep_top_percentile) - crop_before + 1)
            min_j = np.random.randint(0, vid_w - crop_before + 1)
        flip = self.random_flip and np.random.rand() > 0.5

        additional = self.frames_per_img if self.output_additional_evs else 0
        total_inputs = self.L * self.frames_per_img + 1 + additional
        img_idxes, true_img_cnt = self.pause_chain(total_inputs)
        raw = self.read_video(video_path, start_frame,
                              start_frame + true_img_cnt, crop_before,
                              min_i, min_j, flip)
        if self.video_degrade is not None and np.random.rand() < self.degrade_ratio:
            raw = self.degrade_video(raw)
        all_imgs = np.stack([raw[i] for i in img_idxes])     # (N,H,W,C)

        if self.color_mode == "gray":
            gray = all_imgs[..., 0]
        else:
            gray = bgr_to_gray(all_imgs)

        item: Dict[str, Any] = {
            "data_source_idx": np.int64(self.data_source_idx),
        }
        if self.use_fixed_thresholds:
            item["pos_thres"] = np.float32(self.sample_pos_thres[sample_idx])
            item["neg_thres"] = np.float32(self.sample_neg_thres[sample_idx])

        if self.output == "video":
            # device path: ship raw frames; simulation happens in the
            # train step (training/steps.py). Frames include the leading
            # anchor frame (consumed by the simulator diff).
            item["video"] = gray.astype(np.uint8)
            if self.color_mode == "gray_in_bgr_out":
                item["video_bgr"] = all_imgs.astype(np.uint8)
            return item

        # CPU parity path: numpy emulator (reference imgs_to_voxels)
        from ..ops.voxel import esim_video_to_voxel_np
        if self.use_fixed_thresholds:
            pos_thres = self.sample_pos_thres[sample_idx]
            neg_thres = self.sample_neg_thres[sample_idx]
        else:
            thres_1 = np.random.uniform(*self.threshold_range)
            gap = np.random.uniform(1, self.max_thres_pos_neg_gap)
            thres_2 = thres_1 * gap
            if np.random.rand() > 0.5:
                pos_thres, neg_thres = thres_1, thres_2
            else:
                pos_thres, neg_thres = thres_2, thres_1
        base_noise_std = np.random.uniform(*self.base_noise_std_range)
        hot_pixel_fraction = np.random.uniform(*self.hot_pixel_fraction_range)
        hot_pixel_std = np.random.uniform(*self.hot_pixel_std_range)
        if self.scale_noise_strength and not self.put_noise_external:
            base_noise_std *= pos_thres
            hot_pixel_std *= pos_thres

        counts = esim_video_to_voxel_np(
            gray.astype(np.float32), pos_thres, neg_thres, base_noise_std,
            hot_pixel_fraction, hot_pixel_std, self.put_noise_external)
        h, w = gray.shape[1:]
        n_counts = counts.shape[0] // self.frames_per_img
        voxels = counts.reshape(n_counts, self.num_bins, self.frames_per_bin,
                                h, w).sum(axis=2)

        img_cnt = self.L
        use_imgs = all_imgs[self.frames_per_img:] if self.output_additional_evs \
            else all_imgs
        if not self.output_additional_frame:
            frames = np.stack([use_imgs[(i + 1) * self.frames_per_img]
                               for i in range(img_cnt)])
        else:
            frames = np.stack([use_imgs[i * self.frames_per_img]
                               for i in range(img_cnt + 1)])
        n_vox = img_cnt + (1 if self.output_additional_evs else 0)
        item["frame"] = frames.astype(np.float32) / 255.0     # (T,H,W,C)
        item["events"] = voxels[:n_vox].transpose(0, 2, 3, 1).astype(np.float32)
        item["v2e_params"] = {
            "pos_thres": pos_thres, "neg_thres": neg_thres,
            "base_noise_std": base_noise_std,
            "hot_pixel_fraction": hot_pixel_fraction,
            "hot_pixel_std": hot_pixel_std,
        }
        return item
