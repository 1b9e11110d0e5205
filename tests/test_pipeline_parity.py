"""Cross-pipeline 30-view parity harness (VERDICT r3 next #2).

Closes the last unguarded stretch of the north-star path: the COMPOSED
input pipeline. Fixture videos (landscape + portrait) are decoded once by
OUR native decoder; the same decoded frames then flow through

  (a) the reference's composed torch test-time preprocessing —
      tensor_normalize → CTHW permute → spatial_sampling(test: short-side
      resize + uniform_crop) → pack_pathway_output, transcribed at
      tests/torch_golden.py::reference_test_views from
      slowfast/datasets/kinetics.py:122-255 + utils.py:73-203 +
      transform.py:283-468 — into a torch-golden SlowFast, and

  (b) this repo's REAL test engine end-to-end: list-file dataset → host
      canvas paste → device preprocess (normalize + uniform crop +
      pathway pack) → jitted forward, weights loaded from the SAME torch
      checkpoint through utils.torch_ckpt.

Per-view post-softmax scores and the ensembled top-1 must match. Decode
itself is compared separately (tests/test_decoder.py round-trips), so a
failure here isolates preprocessing/crop/pack/forward drift.
"""

import os

import numpy as np
import jax
import pytest
import torch

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.data import decoder

from tests.test_full_model_parity import _base_cfg, _randomize, _resnet_cfg

# composed end-to-end engine runs; minutes each on this 1-core host
pytestmark = pytest.mark.slow

CROP = 48
NUM_FRAMES = 8
VIEWS = 2          # temporal ensemble views
CROPS = 3          # spatial crops
MEAN = [0.45, 0.45, 0.45]
STD = [0.225, 0.225, 0.225]


@pytest.fixture(scope="module")
def fixture_dataset(tmp_path_factory):
    """Three fixture mp4s (2 landscape, 1 portrait) + a Kinetics-style
    test.csv list file. Content varies per video/frame so views are
    distinguishable."""
    d = tmp_path_factory.mktemp("pipeline_parity")
    rs = np.random.RandomState(3)
    specs = [("land0.mp4", 96, 128), ("land1.mp4", 96, 160),
             ("port0.mp4", 160, 96)]
    lines = []
    for vi, (name, h, w) in enumerate(specs):
        n = 64
        frames = rs.randint(0, 255, (n, h, w, 3), np.uint8)
        # smooth gradients: survive encode/decode closely enough that the
        # per-view crops differ meaningfully
        frames[:, :, :, 0] = np.linspace(0, 250, h)[None, :, None]
        frames[:, :, :, 1] = np.linspace(0, 250, w)[None, None, :]
        frames[:, :, :, 2] = (np.arange(n) * 3)[:, None, None]
        decoder.write_test_video(str(d / name), frames, fps=30)
        lines.append(f"{d / name} {vi % 2}")
    (d / "test.csv").write_text("\n".join(lines) + "\n")
    return str(d), [str(d / name) for name, _, _ in specs]


def _cfg(data_dir, ckpt):
    cfg = _resnet_cfg(_base_cfg())
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.DATA.NUM_FRAMES = NUM_FRAMES
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.CROP_SIZE = CROP
    cfg.DATA.TEST_CROP_SIZE = CROP
    cfg.DATA.MEAN = MEAN
    cfg.DATA.STD = STD
    cfg.TEST.DATASET = "kinetics"
    cfg.TEST.ENABLE = True
    cfg.TEST.NUM_ENSEMBLE_VIEWS = VIEWS
    cfg.TEST.NUM_SPATIAL_CROPS = CROPS
    cfg.TEST.BATCH_SIZE = 6
    cfg.TEST.CHECKPOINT_FILE_PATH = ckpt
    cfg.TEST.CHECKPOINT_TYPE = "pytorch"
    cfg.DATA.PATH_TO_DATA_DIR = data_dir
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.LOG_MODEL_INFO = False
    return cfg


def _run_engine_capturing(cfg):
    """engine.test.test with per-clip (clip_id, pred) capture."""
    import importlib

    test_mod = importlib.import_module("efficient_slowfast_tpu.engine.test")
    records = []

    class _Capture(test_mod.TestMeter):
        def update_stats(self, preds, labels, clip_ids):
            records.append((np.asarray(clip_ids).copy(),
                            np.asarray(preds).copy()))
            super().update_stats(preds, labels, clip_ids)

    orig = test_mod.TestMeter
    test_mod.TestMeter = _Capture
    try:
        stats = test_mod.test(cfg)
    finally:
        test_mod.TestMeter = orig
    ids = np.concatenate([r[0] for r in records])
    preds = np.concatenate([r[1] for r in records])
    order = np.argsort(ids)
    assert len(ids) == len(set(ids.tolist())), "duplicate clip ids"
    return stats, preds[order]


def test_composed_pipeline_shufflenetv2_parity(fixture_dataset, tmp_path):
    """The flagship efficient family through the SAME composed harness
    (VERDICT r4 next #3b): list file → host canvas → device preprocess →
    jitted SlowFastShuffleNetV2 forward vs the transcribed reference chain
    into a torch-golden ShuffleNetV2, weights shared via torch_ckpt."""
    from tests.torch_golden import TorchShuffleNetV2, reference_test_views

    data_dir, paths = fixture_dataset
    cfg = _cfg(data_dir, "")
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.SLOWFAST.WIDTH_MULTI = 0.25

    tmodel = _randomize(
        TorchShuffleNetV2(num_classes=6, width_mult=0.25, alpha=4,
                          beta_inv=8), seed=21)
    tmodel.eval()
    ckpt = str(tmp_path / "golden_snv2.pyth")
    torch.save({"model_state": tmodel.state_dict(), "epoch": 0}, ckpt)
    cfg.TEST.CHECKPOINT_FILE_PATH = ckpt

    stats, ours = _run_engine_capturing(cfg)
    assert ours.shape == (len(paths) * VIEWS * CROPS, 6)

    refs = []
    for path in paths:
        for tidx in range(VIEWS):
            frames = decoder.decode_clip(
                path, num_frames=NUM_FRAMES, sampling_rate=2,
                clip_idx=tidx, num_clips=VIEWS, target_fps=30,
                short_side=CROP, random_clip=False)
            assert frames is not None
            for sidx in range(CROPS):
                views = reference_test_views(frames, sidx, CROP, MEAN, STD,
                                             alpha=4)
                with torch.no_grad():
                    refs.append(tmodel(views).numpy()[0])
    refs = np.stack(refs)
    np.testing.assert_allclose(ours, refs, rtol=1e-3, atol=1e-4)
    vid_ref = refs.reshape(len(paths), VIEWS * CROPS, 6).sum(axis=1)
    vid_ours = ours.reshape(len(paths), VIEWS * CROPS, 6).sum(axis=1)
    assert (vid_ref.argmax(-1) == vid_ours.argmax(-1)).all()


def test_composed_pipeline_detection_parity(tmp_path):
    """The AVA detection engine end-to-end (VERDICT r4 next #3a): jpg
    keyframe window → host canvas + pixel boxes → device normalize/pack →
    jitted trunk → RoIAlign head, vs the transcribed torch chain whose RoI
    head runs the reference's OWN compiled ROIAlign_cpu.cpp
    (tests/roialign_oracle.py). Per-box sigmoid scores must match."""
    import pytest as _pytest

    from efficient_slowfast_tpu.data.build import build_dataset
    from tests.roialign_oracle import (build_reference_roialign,
                                       reference_available)
    from tests.test_ava import detection_engine_cfg, make_ava_fixture
    from tests.torch_golden import (TorchSlowFastDetection,
                                    reference_tensor_normalize,
                                    reference_pack_pathway)

    if not reference_available():
        _pytest.skip("reference ROIAlign_cpu.cpp not available")
    roialign = build_reference_roialign(tmp_path / "oracle")

    fx = make_ava_fixture(tmp_path / "ava")
    cfg = detection_engine_cfg(fx, tmp_path / "out")
    cfg.TRAIN.ENABLE = False

    tmodel = _randomize(TorchSlowFastDetection(
        roialign, num_classes=80, width=8, alpha=4, beta_inv=8,
        fusion_ratio=cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
        fusion_kernel=cfg.SLOWFAST.FUSION_KERNEL_SZ,
        num_frames=cfg.DATA.NUM_FRAMES, crop=cfg.DATA.TEST_CROP_SIZE,
        depths=(2, 2, 2, 2),
        resolution=cfg.DETECTION.ROI_XFORM_RESOLUTION,
        scale_factor=cfg.DETECTION.SPATIAL_SCALE_FACTOR,
        aligned=cfg.DETECTION.ALIGNED), seed=31)
    tmodel.eval()
    ckpt = str(tmp_path / "golden_det.pyth")
    torch.save({"model_state": tmodel.state_dict(), "epoch": 0}, ckpt)
    cfg.TEST.CHECKPOINT_FILE_PATH = ckpt
    cfg.TEST.CHECKPOINT_TYPE = "pytorch"

    # --- our REAL detection test engine, capturing per-box predictions ---
    import importlib

    meters_mod = importlib.import_module("efficient_slowfast_tpu.utils.meters")
    test_mod = importlib.import_module("efficient_slowfast_tpu.engine.test")
    records = []

    class _Capture(meters_mod.AVAMeter):
        def update_stats(self, preds, ori_boxes, metadata, loss=None, lr=None):
            records.append((np.asarray(preds).copy(),
                            np.asarray(ori_boxes).copy(),
                            np.asarray(metadata).copy()))
            super().update_stats(preds, ori_boxes, metadata, loss=loss, lr=lr)

    orig = test_mod.AVAMeter if hasattr(test_mod, "AVAMeter") else None
    meters_orig = meters_mod.AVAMeter
    meters_mod.AVAMeter = _Capture
    try:
        stats = test_mod.test(cfg)
    finally:
        meters_mod.AVAMeter = meters_orig
        if orig is not None:
            test_mod.AVAMeter = orig
    assert "map" in stats
    preds = np.concatenate([r[0] for r in records])
    ori = np.concatenate([r[1] for r in records])[:, 1:]  # drop batch col
    meta = np.concatenate([r[2] for r in records])
    ours_by_key = {
        (int(m[0]), int(m[1])) + tuple(round(float(v), 4) for v in o): p
        for p, o, m in zip(preds, ori, meta)
    }

    # --- transcribed reference chain on the SAME dataset items ---
    ds = build_dataset("ava", cfg, "test")
    n_checked = 0
    for i in range(len(ds)):
        item = ds[i]
        n = int(item["box_mask"].sum())
        canvas = torch.from_numpy(np.ascontiguousarray(item["frames"]))
        x = reference_tensor_normalize(canvas, MEAN, STD)
        x = x.permute(3, 0, 1, 2)  # THWC → CTHW
        views = [p.unsqueeze(0) for p in reference_pack_pathway(x, alpha=4)]
        rois = np.concatenate(
            [np.zeros((n, 1), np.float32), item["boxes"][:n]], axis=1)
        with torch.no_grad():
            ref = tmodel(views, rois).numpy()
        for b in range(n):
            key = ((int(item["metadata"][0]), int(item["metadata"][1]))
                   + tuple(round(float(v), 4)
                           for v in item["ori_boxes"][b]))
            assert key in ours_by_key, key
            np.testing.assert_allclose(ours_by_key[key], ref[b],
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"item {i} box {b}")
            n_checked += 1
    assert n_checked == 3  # vidA: 2 boxes, vidB: 1 box


def test_composed_pipeline_30view_parity(fixture_dataset, tmp_path):
    from tests.torch_golden import TorchSlowFast, reference_test_views

    data_dir, paths = fixture_dataset
    cfg0 = _cfg(data_dir, "")

    tmodel = _randomize(TorchSlowFast(
        num_classes=6, width=8, alpha=4, beta_inv=8,
        fusion_ratio=cfg0.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
        fusion_kernel=cfg0.SLOWFAST.FUSION_KERNEL_SZ,
        num_frames=NUM_FRAMES, crop=CROP, depths=(2, 2, 2, 2)), seed=11)
    tmodel.eval()
    ckpt = str(tmp_path / "golden.pyth")
    torch.save({"model_state": tmodel.state_dict(), "epoch": 0}, ckpt)

    # (b) the repo's real engine, end to end
    cfg = _cfg(data_dir, ckpt)
    stats, ours = _run_engine_capturing(cfg)
    assert ours.shape == (len(paths) * VIEWS * CROPS, 6)

    # (a) reference composed chain on the SAME decoded frames
    refs = []
    view_inputs = []
    for path in paths:
        for tidx in range(VIEWS):
            frames = decoder.decode_clip(
                path, num_frames=NUM_FRAMES, sampling_rate=2,
                clip_idx=tidx, num_clips=VIEWS, target_fps=30,
                short_side=CROP, random_clip=False)
            assert frames is not None
            for sidx in range(CROPS):
                views = reference_test_views(frames, sidx, CROP, MEAN, STD,
                                             alpha=4)
                view_inputs.append(views[1].numpy()[0])  # fast pathway
                with torch.no_grad():
                    refs.append(tmodel(views).numpy()[0])
    refs = np.stack(refs)

    # per-view post-softmax scores match through BOTH full pipelines
    np.testing.assert_allclose(ours, refs, rtol=1e-3, atol=1e-4)

    # the VIEW INPUTS are genuinely distinct per video (the harness isn't
    # comparing collapsed duplicate crops — the pre-fix portrait path would
    # fail exactly this) ...
    view_inputs = np.stack(view_inputs).reshape(
        len(paths), VIEWS, CROPS, -1)
    for v in range(len(paths)):
        for t in range(VIEWS):
            spatial = view_inputs[v, t]
            d01 = np.abs(spatial[0] - spatial[1]).max()
            d12 = np.abs(spatial[1] - spatial[2]).max()
            assert min(d01, d12) > 1e-3, (v, t, d01, d12)
    # ... and the reference-side ensemble reproduces the engine's top-1
    vid_ref = refs.reshape(len(paths), VIEWS * CROPS, 6).sum(axis=1)
    vid_ours = ours.reshape(len(paths), VIEWS * CROPS, 6).sum(axis=1)
    assert (vid_ref.argmax(-1) == vid_ours.argmax(-1)).all()
    labels = np.array([0, 1, 0])
    expected_top1 = 100.0 * float((vid_ref.argmax(-1) == labels).mean())
    np.testing.assert_allclose(float(stats["top1_acc"]), expected_top1,
                               atol=1e-6)
