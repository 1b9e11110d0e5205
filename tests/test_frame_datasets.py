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
