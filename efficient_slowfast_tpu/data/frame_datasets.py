"""Frame-list datasets: Something-Something V2 and Charades.

Reference: slowfast/datasets/ssv2.py:21-263 and charades.py:19-237 (both
fvcore-frame-list based), plus the shared helpers in datasets/utils.py
(load_image_lists, retry_load_images, aggregate_labels).

Host contract identical to ClipDataset: each sample is a fixed-canvas uint8
frame stack + width + label(s); spatial work happens on device.
"""

from __future__ import annotations

import json
import os
import random
from collections import defaultdict
from itertools import chain
from typing import Dict, List

import numpy as np

from ..utils.logging import get_logger
from .build import DATASET_REGISTRY
from .datasets import fit_canvas

logger = get_logger(__name__)


def load_image_lists(frame_list_file: str, prefix: str = "",
                     return_list: bool = False):
    """Parse fvcore-style frame lists:
    ``original_vido_id video_id frame_id path labels`` (header + rows).
    Returns (paths, labels) keyed by video name (or as lists)."""
    image_paths = defaultdict(list)
    labels = defaultdict(list)
    with open(frame_list_file, "r") as f:
        assert f.readline().startswith("original_vido_id")
        for line in f:
            row = line.split()
            if len(row) != 5:
                continue
            video_name = row[0]
            path = os.path.join(prefix, row[3])
            image_paths[video_name].append(path)
            frame_labels = row[-1].replace('"', "")
            if frame_labels != "":
                labels[video_name].append(
                    [int(x) for x in frame_labels.split(",")]
                )
            else:
                labels[video_name].append([])
    if return_list:
        keys = list(image_paths.keys())
        return [image_paths[k] for k in keys], [labels[k] for k in keys]
    return dict(image_paths), dict(labels)


def retry_load_images(image_paths: List[str], retry: int = 10) -> np.ndarray:
    """PIL frame loading with retries (reference: datasets/utils.py:19-49)."""
    from PIL import Image

    for r in range(retry):
        try:
            imgs = []
            for p in image_paths:
                with Image.open(p) as im:
                    imgs.append(np.asarray(im.convert("RGB"), np.uint8))
            return np.stack(imgs)
        except Exception:
            logger.warning("Reading failed (attempt %d). Retry.", r)
    raise RuntimeError(f"Failed to load images {image_paths}")


def aggregate_labels(label_list) -> List[int]:
    """Union of frame-level label lists (reference: datasets/utils.py)."""
    all_labels = []
    for labels in label_list:
        all_labels.extend(labels)
    return sorted(set(all_labels))


def as_binary_vector(labels, num_classes: int) -> np.ndarray:
    vec = np.zeros(num_classes, np.float32)
    for l in labels:
        vec[int(l)] = 1.0
    return vec


class _FrameListDataset:
    """Shared machinery: canvas fitting + test-view replication."""

    def __init__(self, cfg, mode: str):
        assert mode in ("train", "val", "test")
        self.cfg = cfg
        self.mode = mode
        self._num_clips = (
            1 if mode in ("train", "val")
            else cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        )
        # multi-view test: eval-mode temporal sampling is deterministic, so
        # the NUM_SPATIAL_CROPS items of a view (all num_clips items for
        # SSv2, whose eval sampling ignores the view index) read identical
        # jpg frames — share one read (see datasets._DecodeMemo)
        from .datasets import _DecodeMemo

        self._test_decode_memo = _DecodeMemo() if mode == "test" else None

    def _load_frames_shared(self, index: int, temporal_idx: int, loader_fn):
        """Test mode: serve all spatial crops of one (video, view) from a
        single frame read; train/val (random sampling) bypass the memo.
        Exceptions from ``loader_fn`` propagate uncached (retry stays real).
        """
        if self._test_decode_memo is None:
            return loader_fn()
        return self._test_decode_memo.get_or_compute(
            (index // self._num_clips, temporal_idx), loader_fn)

    def _short_side(self) -> int:
        if self.mode in ("train", "val"):
            return int(self.cfg.DATA.TRAIN_JITTER_SCALES[1])
        return int(self.cfg.DATA.TEST_CROP_SIZE)

    def _sample(self, frames: np.ndarray, index: int, label,
                spatial_idx: int, temporal_idx: int) -> Dict[str, np.ndarray]:
        # train/val: host-sampled long-axis crop position, shared with the
        # device crop so it spans the full resized long axis on >2:1 media
        # (see datasets.fit_canvas_into window_u)
        crop_u = (random.random() if self.mode in ("train", "val") else None)
        canvas, width, portrait = fit_canvas(
            frames, self._short_side(), keep_portrait=True,
            long_view=int(spatial_idx), window_u=crop_u)
        out = {
            "frames": canvas,
            "width": np.int32(width),
            "portrait": np.int32(portrait),
            "label": label,
            "index": np.int64(index // self._num_clips
                              if self.mode == "test" else index),
            "spatial_idx": np.int32(spatial_idx),
            "temporal_idx": np.int32(temporal_idx),
        }
        if crop_u is not None:
            out["crop_u"] = np.float32(crop_u)
        return out


@DATASET_REGISTRY.register()
class Ssv2(_FrameListDataset):
    """Something-Something V2 (reference: ssv2.py): label jsons + frame lists;
    segment-based temporal sampling (train: random within segment; eval:
    segment centers)."""

    def __init__(self, cfg, mode: str, num_retries: int = 10):
        super().__init__(cfg, mode)
        self._num_retries = num_retries
        d = cfg.DATA.PATH_TO_DATA_DIR
        with open(os.path.join(d, "something-something-v2-labels.json")) as f:
            label_dict = json.load(f)
        split = "train" if mode == "train" else "validation"
        with open(os.path.join(d, f"something-something-v2-{split}.json")) as f:
            label_json = json.load(f)
        video_names, labels = [], []
        for video in label_json:
            template = video["template"].replace("[", "").replace("]", "")
            video_names.append(video["id"])
            labels.append(int(label_dict[template]))

        list_file = os.path.join(
            d, f"{'train' if mode == 'train' else 'val'}.csv"
        )
        paths, _ = load_image_lists(list_file, cfg.DATA.PATH_PREFIX)
        self._path_to_videos = []
        self._labels = []
        for name, label in zip(video_names, labels):
            if name in paths:
                self._path_to_videos.append(paths[name])
                self._labels.append(label)
        self._path_to_videos = list(chain.from_iterable(
            [[x] * self._num_clips for x in self._path_to_videos]
        ))
        self._labels = list(chain.from_iterable(
            [[x] * self._num_clips for x in self._labels]
        ))
        logger.info("Ssv2 %s: %d clips", mode, len(self._path_to_videos))

    def __len__(self):
        return len(self._path_to_videos)

    def __getitem__(self, index: int):
        num_frames = self.cfg.DATA.NUM_FRAMES
        video_length = len(self._path_to_videos[index])
        seg_size = float(video_length - 1) / num_frames
        seq = []
        for i in range(num_frames):
            start = int(np.round(seg_size * i))
            end = int(np.round(seg_size * (i + 1)))
            if self.mode == "train":
                seq.append(random.randint(start, end))
            else:
                seq.append((start + end) // 2)
        frames = self._load_frames_shared(index, 0, lambda: retry_load_images(
            [self._path_to_videos[index][f] for f in seq], self._num_retries
        ))
        spatial_idx = (-1 if self.mode in ("train", "val")
                       else index % self.cfg.TEST.NUM_SPATIAL_CROPS)
        return self._sample(frames, index, np.int64(self._labels[index]),
                            spatial_idx, 0)


@DATASET_REGISTRY.register()
class Charades(_FrameListDataset):
    """Charades multi-label dataset (reference: charades.py): frame lists with
    per-frame labels, clip-level label union, multi-hot targets."""

    def __init__(self, cfg, mode: str, num_retries: int = 10):
        super().__init__(cfg, mode)
        self._num_retries = num_retries
        list_file = os.path.join(
            cfg.DATA.PATH_TO_DATA_DIR,
            f"{'train' if mode == 'train' else 'val'}.csv",
        )
        paths, labels = load_image_lists(
            list_file, cfg.DATA.PATH_PREFIX, return_list=True
        )
        self._path_to_videos = list(chain.from_iterable(
            [[x] * self._num_clips for x in paths]
        ))
        self._labels = list(chain.from_iterable(
            [[x] * self._num_clips for x in labels]
        ))
        logger.info("Charades %s: %d clips", mode, len(self._path_to_videos))

    def __len__(self):
        return len(self._path_to_videos)

    def __getitem__(self, index: int):
        cfg = self.cfg
        num_frames = cfg.DATA.NUM_FRAMES
        sampling = cfg.DATA.SAMPLING_RATE
        video_length = len(self._path_to_videos[index])

        clip_length = (num_frames - 1) * sampling + 1
        if self.mode in ("train", "val"):
            if clip_length > video_length:
                start = random.randint(video_length - clip_length, 0)
            else:
                start = random.randint(0, video_length - clip_length)
            temporal_idx = -1
        else:
            temporal_idx = (index % self._num_clips) // cfg.TEST.NUM_SPATIAL_CROPS
            gap = float(max(video_length - clip_length, 0)) / (
                cfg.TEST.NUM_ENSEMBLE_VIEWS - 1
            ) if cfg.TEST.NUM_ENSEMBLE_VIEWS > 1 else 0
            start = int(round(gap * temporal_idx))
        seq = [max(min(start + i * sampling, video_length - 1), 0)
               for i in range(num_frames)]
        frames = self._load_frames_shared(
            index, max(temporal_idx, 0), lambda: retry_load_images(
                [self._path_to_videos[index][f] for f in seq],
                self._num_retries
            ))
        label = aggregate_labels(
            [self._labels[index][i] for i in range(seq[0], seq[-1] + 1)]
        )
        label_vec = as_binary_vector(label, cfg.MODEL.NUM_CLASSES)
        spatial_idx = (-1 if self.mode in ("train", "val")
                       else index % cfg.TEST.NUM_SPATIAL_CROPS)
        return self._sample(frames, index, label_vec, spatial_idx,
                            max(temporal_idx, 0))
