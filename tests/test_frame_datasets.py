"""SSv2/Charades frame-list dataset tests on synthetic fixtures."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def frames_root(tmp_path):
    from PIL import Image

    root = tmp_path / "frames"
    root.mkdir()
    rows = ["original_vido_id video_id frame_id path labels"]
    for v, name in enumerate(["v0", "v1"]):
        (root / name).mkdir()
        for i in range(40):
            img = Image.fromarray(np.full((48, 64, 3), i * 6, np.uint8))
            rel = f"{name}/{i:05d}.jpg"
            img.save(root / rel)
            lbl = f'"{(i % 3)},{(i % 5)}"' if name == "v0" else '""'
            rows.append(f"{name} {v} {i} {rel} {lbl}")
    return root, rows


def test_ssv2_dataset(frames_root, tmp_path):
    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset

    root, rows = frames_root
    d = tmp_path / "ssv2"
    d.mkdir()
    (d / "something-something-v2-labels.json").write_text(
        json.dumps({"Doing a thing": "0", "Doing another": "1"}))
    (d / "something-something-v2-train.json").write_text(json.dumps([
        {"id": "v0", "template": "Doing a [thing]"},
        {"id": "v1", "template": "Doing another"},
    ]))
    (d / "train.csv").write_text("\n".join(rows) + "\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(d)
    cfg.DATA.PATH_PREFIX = str(root)
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 45]
    cfg.MODEL.NUM_CLASSES = 2
    ds = build_dataset("ssv2", cfg, "train")
    assert len(ds) == 2
    item = ds[0]
    assert item["frames"].shape == (8, 45, 90, 3)
    assert int(item["label"]) == 0
    assert item["width"] == 60  # 64/48 aspect at short 45


def test_charades_dataset_multilabel(frames_root, tmp_path):
    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset

    root, rows = frames_root
    d = tmp_path / "charades"
    d.mkdir()
    (d / "train.csv").write_text("\n".join(rows) + "\n")
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(d)
    cfg.DATA.PATH_PREFIX = str(root)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 45]
    cfg.DATA.MULTI_LABEL = True
    cfg.MODEL.NUM_CLASSES = 5
    ds = build_dataset("charades", cfg, "train")
    assert len(ds) == 2
    item = ds[0]  # v0 has labels
    assert item["label"].shape == (5,)
    assert item["label"].sum() >= 1  # union of frame labels, multi-hot
    assert item["frames"].shape[0] == 4


def test_frame_dataset_test_mode_shares_reads(frames_root, tmp_path,
                                              monkeypatch):
    """Multi-view test mode: eval temporal sampling is deterministic, so
    spatial crops (Charades) — and ALL views for SSv2, whose eval sampling
    ignores the view index — share one jpg read, with identical items."""
    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data import frame_datasets as fd
    from efficient_slowfast_tpu.data.build import build_dataset

    root, rows = frames_root
    d = tmp_path / "charades"
    d.mkdir()
    (d / "val.csv").write_text("\n".join(rows) + "\n")
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(d)
    cfg.DATA.PATH_PREFIX = str(root)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 45]
    cfg.DATA.MULTI_LABEL = True
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3

    calls = []
    real = fd.retry_load_images

    def spy(paths, retries):
        calls.append(tuple(paths))
        return real(paths, retries)

    monkeypatch.setattr(fd, "retry_load_images", spy)

    ds = build_dataset("charades", cfg, "test")
    assert len(ds) == 2 * 6  # 2 videos x (2 views x 3 crops)
    items = [ds[i] for i in range(len(ds))]
    assert len(calls) == 2 * 2  # one read per (video, view), not per crop

    # bit-equality vs the memo-less path
    ds2 = build_dataset("charades", cfg, "test")
    ds2._test_decode_memo = None
    for i, item in enumerate(items):
        ref = ds2[i]
        for k in item:
            np.testing.assert_array_equal(item[k], ref[k])

    # SSv2: eval sampling is view-independent -> ONE read per video
    d2 = tmp_path / "ssv2"
    d2.mkdir()
    (d2 / "something-something-v2-labels.json").write_text(
        json.dumps({"Doing a thing": "0", "Doing another": "1"}))
    (d2 / "something-something-v2-validation.json").write_text(json.dumps([
        {"id": "v0", "template": "Doing a [thing]"},
        {"id": "v1", "template": "Doing another"},
    ]))
    (d2 / "val.csv").write_text("\n".join(rows) + "\n")
    cfg.DATA.PATH_TO_DATA_DIR = str(d2)
    cfg.DATA.NUM_FRAMES = 8
    cfg.MODEL.NUM_CLASSES = 2
    calls.clear()
    ds3 = build_dataset("ssv2", cfg, "test")
    _ = [ds3[i] for i in range(len(ds3))]
    assert len(ds3) == 2 * 6
    assert len(calls) == 2
