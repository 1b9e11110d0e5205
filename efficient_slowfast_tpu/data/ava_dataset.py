"""AVA keyframe detection dataset (reference: slowfast/datasets/ava_dataset.py).

Host side: loads the NUM_FRAMES×SAMPLING_RATE window of jpg frames around each
labeled keyframe (PIL, short-side resized into the fixed canvas), scales the
normalized person boxes to canvas pixels, and pads boxes/labels to a STATIC
``MAX_BOXES`` per sample (TPU-first: detection batches keep static shapes; a
validity mask drives the loss and the evaluator).

Train-time augmentation (scale-jitter, random crop, flip — with joint box
co-transform — plus color/PCA jitter) runs ON DEVICE in
``data/preprocess.py::make_detection_train_preprocess`` (the reference does
all of it per-sample on host with cv2 — cv2_transform.py); the host only
builds the canvas and pixel-space boxes.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..utils.logging import get_logger
from .build import DATASET_REGISTRY
from . import ava_helper
from .datasets import _DecodeMemo, fit_canvas

logger = get_logger(__name__)

MAX_BOXES = 32


@DATASET_REGISTRY.register()
class Ava:
    def __init__(self, cfg, split: str):
        self.cfg = cfg
        self._split = split
        self._sample_rate = cfg.DATA.SAMPLING_RATE
        self._video_length = cfg.DATA.NUM_FRAMES
        self._seq_len = self._video_length * self._sample_rate
        self._num_classes = cfg.MODEL.NUM_CLASSES
        # Eval keyframes are enumerated video-major at 1 Hz while each
        # window spans seq_len raw frames (~2 s at the flagship 32×2), so
        # adjacent items RE-decode ~half their jpgs (17/32 shared at 32×2 +
        # 1 Hz); a shared single-flight frame memo serves those reads once
        # (measured 1.5× on the val/test frame-load stage — PERF.md r5).
        # Train shuffles keyframes globally (no locality) and stays
        # uncached.
        self._frame_memo = (_DecodeMemo(capacity=192, max_bytes=256 << 20)
                            if split != "train" else None)
        self._load_data(cfg)

    def _load_data(self, cfg):
        self._image_paths, self._video_idx_to_name = ava_helper.load_image_lists(
            cfg, is_train=(self._split == "train")
        )
        boxes_and_labels = ava_helper.load_boxes_and_labels(
            cfg, mode=self._split
        )
        boxes_and_labels = {
            name: boxes_and_labels.get(name, {})
            for name in self._video_idx_to_name
        }
        # keyframe extraction expects name-keyed dict ordered like videos
        ordered = {}
        for name in sorted(boxes_and_labels.keys()):
            ordered[name] = boxes_and_labels[name]
        # re-map to match video idx order
        self._keyframe_indices, self._keyframe_boxes_and_labels = (
            self._keyframes_in_video_order(boxes_and_labels)
        )
        self._num_boxes_used = ava_helper.get_num_boxes_used(
            self._keyframe_indices, self._keyframe_boxes_and_labels
        )
        logger.info("AVA %s: %d keyframes, %d boxes", self._split,
                    len(self._keyframe_indices), self._num_boxes_used)

    def _keyframes_in_video_order(self, boxes_and_labels):
        keyframe_indices = []
        keyframe_boxes = []
        for video_idx, name in enumerate(self._video_idx_to_name):
            per_video = []
            sec_idx = 0
            for sec in sorted(boxes_and_labels.get(name, {}).keys()):
                if sec not in ava_helper.AVA_VALID_FRAMES:
                    continue
                entries = boxes_and_labels[name][sec]
                if entries:
                    keyframe_indices.append(
                        (video_idx, sec_idx, sec, ava_helper.frame_sec_to_idx(sec))
                    )
                    per_video.append(entries)
                    sec_idx += 1
            keyframe_boxes.append(per_video)
        return keyframe_indices, keyframe_boxes

    def __len__(self):
        return len(self._keyframe_indices)

    def _frame_window(self, video_idx: int, center_idx: int) -> List[int]:
        """reference datasets/utils.py get_sequence (:50-72)."""
        half = self._seq_len // 2
        seq = list(range(center_idx - half, center_idx + half, self._sample_rate))
        n = len(self._image_paths[video_idx])
        return [min(max(i, 0), n - 1) for i in seq]

    def _load_frames(self, video_idx: int, frame_indices) -> np.ndarray:
        from PIL import Image

        def read(path):
            with Image.open(path) as im:
                return np.asarray(im.convert("RGB"), np.uint8)

        frames = []
        for idx in frame_indices:
            path = self._image_paths[video_idx][idx]
            if self._frame_memo is not None:
                # memo entries are read-only; np.stack below copies
                frames.append(self._frame_memo.get_or_compute(
                    (video_idx, idx), lambda p=path: read(p)))
            else:
                frames.append(read(path))
        out = np.stack(frames)
        if self.cfg.AVA.BGR:
            # feed channels in BGR order, for checkpoints trained on BGR
            # inputs (reference: ava_dataset.py:33 _use_bgr — cv2 decodes
            # BGR and skips the to-RGB flip when set; our decode is
            # RGB-native, so BGR means reversing the channel axis)
            out = out[..., ::-1]
        return out

    def __getitem__(self, index: int):
        cfg = self.cfg
        video_idx, sec_idx, sec, center_idx = self._keyframe_indices[index]
        entries = self._keyframe_boxes_and_labels[video_idx][sec_idx]

        frames = self._load_frames(
            video_idx, self._frame_window(video_idx, center_idx)
        )
        t, orig_h, orig_w, _ = frames.shape
        short = (int(cfg.DATA.TRAIN_JITTER_SCALES[0])
                 if self._split == "train" else int(cfg.DATA.TEST_CROP_SIZE))
        # keep_portrait=False: boxes are in canvas pixel coordinates and the
        # detection preprocess has no crop/transpose stage (AVA media is
        # landscape; a transposed canvas would invalidate the box coords)
        canvas, width, _ = fit_canvas(frames, short)

        boxes = np.array([e[0] for e in entries], np.float32).reshape(-1, 4)
        ori_boxes = boxes.copy()
        # normalized → canvas pixel coords (content region is width × short)
        px = boxes.copy()
        px[:, [0, 2]] *= width
        px[:, [1, 3]] *= short

        if self._split != "train" and cfg.AVA.TEST_FORCE_FLIP:
            # force-flip eval imgs+boxes, for checkpoints trained on
            # flipped data (reference: ava_dataset.py:154-171 test branch,
            # cv2_transform.horizontal_flip_list with boxes)
            canvas[:, :, :width] = canvas[:, :, :width][:, :, ::-1]
            x1 = width - 1.0 - px[:, 2]
            x2 = width - 1.0 - px[:, 0]
            px[:, 0], px[:, 2] = x1, x2

        # train-time flip / scale-jitter / crop happen on DEVICE with joint
        # box co-transform (data/preprocess.py make_detection_train_preprocess)
        labels = np.zeros((MAX_BOXES, self._num_classes), np.float32)
        boxes_out = np.zeros((MAX_BOXES, 4), np.float32)
        mask = np.zeros((MAX_BOXES,), np.float32)
        ori_out = np.zeros((MAX_BOXES, 4), np.float32)
        n = min(len(entries), MAX_BOXES)
        for i in range(n):
            boxes_out[i] = px[i]
            ori_out[i] = ori_boxes[i]
            mask[i] = 1.0
            for label in entries[i][1]:
                if label == -1:
                    continue
                assert 1 <= label <= 80, f"AVA label {label} out of range"
                labels[i][label - 1] = 1.0

        return {
            "frames": canvas,
            "width": np.int32(width),
            "boxes": boxes_out,
            "ori_boxes": ori_out,
            "box_labels": labels,
            "box_mask": mask,
            "metadata": np.array([video_idx, sec], np.int64),
            "index": np.int64(index),
            "label": np.int64(0),
            "spatial_idx": np.int32(1),
            "temporal_idx": np.int32(0),
        }
