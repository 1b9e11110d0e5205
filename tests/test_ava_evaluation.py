"""Cross-validation of the fresh numpy AVA evaluator (VERDICT #9).

Two layers of evidence:

1. Hand-computed AP on crafted cases — ties, duplicate detections on one
   groundtruth, FP-before-TP orderings, classes without groundtruth.
2. A randomized fixture scored by the REFERENCE's vendored pure-numpy
   object-detection evaluator (slowfast/utils/ava_evaluation/), loaded
   standalone from /root/reference as a test oracle (skipped when the
   reference tree is not mounted). No reference code is imported into the
   package itself.
"""

import os

import numpy as np
import pytest

from efficient_slowfast_tpu.utils.ava_evaluation import (
    PascalDetectionEvaluator, average_precision, box_iou,
)
from efficient_slowfast_tpu.utils.ava_eval_helper import run_evaluation

REF_EVAL_DIR = "/root/reference/SlowFast/slowfast/utils/ava_evaluation"

CATS = [{"id": 1, "name": "stand"}, {"id": 2, "name": "sit"}]


def _map_key(res, iou=0.5):
    return res[f"PascalBoxes_Precision/mAP@{iou}IOU"]


def test_box_iou_basic():
    a = np.array([[0, 0, 2, 2]], float)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], float)
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1 / 7, 1.0, 0.0], atol=1e-12)


def test_perfect_detection_ap_is_one():
    ev = PascalDetectionEvaluator(CATS)
    ev.add_single_ground_truth_image_info(
        "img1", {"boxes": [[0, 0, 1, 1]], "classes": [1]})
    ev.add_single_detected_image_info(
        "img1", {"boxes": [[0, 0, 1, 1]], "classes": [1], "scores": [0.9]})
    res = ev.evaluate()
    assert _map_key(res) == pytest.approx(1.0)
    assert res["PascalBoxes_PerformanceByCategory/AP@0.5IOU/stand"] == (
        pytest.approx(1.0))


def test_fp_before_tp_halves_ap():
    """Higher-scored FP then TP: precision envelope gives AP = 0.5."""
    ev = PascalDetectionEvaluator(CATS)
    ev.add_single_ground_truth_image_info(
        "img1", {"boxes": [[0, 0, 10, 10]], "classes": [1]})
    ev.add_single_detected_image_info("img1", {
        "boxes": [[50, 50, 60, 60], [0, 0, 10, 10]],
        "classes": [1, 1], "scores": [0.9, 0.8]})
    res = ev.evaluate()
    assert _map_key(res) == pytest.approx(0.5)


def test_duplicate_detection_on_one_gt_is_fp():
    """Second detection of an already-matched gt counts as FP, but the
    PR envelope keeps AP at 1.0 (recall saturates on the first)."""
    ev = PascalDetectionEvaluator(CATS)
    ev.add_single_ground_truth_image_info(
        "img1", {"boxes": [[0, 0, 10, 10]], "classes": [1]})
    ev.add_single_detected_image_info("img1", {
        "boxes": [[0, 0, 10, 10], [0, 0, 9.6, 10]],
        "classes": [1, 1], "scores": [0.9, 0.8]})
    res = ev.evaluate()
    assert _map_key(res) == pytest.approx(1.0)
    # reference parity quirk: matching is INSERTION-ordered, so the
    # first-inserted (lower-scored) exact box takes the gt and the
    # higher-scored duplicate becomes the top-ranked FP → AP = 0.5
    # (score-ordered matching would give 1.0; the reference's vendored
    # evaluator dropped the sort — see ava_evaluation.py docstring)
    ev2 = PascalDetectionEvaluator(CATS)
    ev2.add_single_ground_truth_image_info(
        "img1", {"boxes": [[0, 0, 10, 10]], "classes": [1]})
    ev2.add_single_detected_image_info("img1", {
        "boxes": [[0, 0, 10, 10], [0, 0, 9.6, 10]],
        "classes": [1, 1], "scores": [0.8, 0.9]})
    assert _map_key(ev2.evaluate()) == pytest.approx(0.5)


def test_tied_scores_use_insertion_order():
    """Equal scores: stable sort keeps insertion order — TP first gives the
    hand-computed AP for that order (deterministic, documented behavior)."""
    ev = PascalDetectionEvaluator(CATS)
    for img in ("img1", "img2"):
        ev.add_single_ground_truth_image_info(
            img, {"boxes": [[0, 0, 10, 10]], "classes": [1]})
    # TP on img1 and FP on img2, same score, TP added first
    ev.add_single_detected_image_info("img1", {
        "boxes": [[0, 0, 10, 10]], "classes": [1], "scores": [0.5]})
    ev.add_single_detected_image_info("img2", {
        "boxes": [[90, 90, 99, 99]], "classes": [1], "scores": [0.5]})
    # order: [tp, fp] → precision [1, 0.5], recall [0.5, 0.5] → AP = 0.5
    assert _map_key(ev.evaluate()) == pytest.approx(0.5)


def test_class_without_groundtruth_excluded_from_map():
    ev = PascalDetectionEvaluator(CATS)
    ev.add_single_ground_truth_image_info(
        "img1", {"boxes": [[0, 0, 1, 1]], "classes": [1]})
    ev.add_single_detected_image_info("img1", {
        "boxes": [[0, 0, 1, 1], [0, 0, 1, 1]],
        "classes": [1, 2], "scores": [0.9, 0.9]})
    res = ev.evaluate()
    # class 2 has no gt → no AP entry; mAP = AP(class 1) = 1.0
    assert _map_key(res) == pytest.approx(1.0)
    assert not any("sit" in k for k in res)


def test_iou_threshold_boundary():
    """IoU exactly at the threshold counts as a match (>=)."""
    ev = PascalDetectionEvaluator(CATS, iou_threshold=0.5)
    ev.add_single_ground_truth_image_info(
        "img1", {"boxes": [[0, 0, 10, 10]], "classes": [1]})
    # box [0,0,10,5] vs gt: inter 50, union 100 → IoU exactly 0.5
    ev.add_single_detected_image_info("img1", {
        "boxes": [[0, 0, 10, 5]], "classes": [1], "scores": [0.9]})
    assert _map_key(ev.evaluate()) == pytest.approx(1.0)


def test_excluded_keyframes_skipped():
    """run_evaluation drops excluded image keys from gt AND detections
    (reference ava_eval_helper.py:136-207)."""
    gt = (
        {"v1,0900": [[0, 0, 1, 1]], "v1,0901": [[0, 0, 1, 1]]},  # boxes
        {"v1,0900": [1], "v1,0901": [1]},                        # labels
        {"v1,0900": [1.0], "v1,0901": [1.0]},                    # scores
    )
    det = (
        # excluded frame v1,0901 carries a would-be FP that must not count
        {"v1,0900": [[0, 0, 1, 1]], "v1,0901": [[5, 5, 6, 6]]},
        {"v1,0900": [1], "v1,0901": [1]},
        {"v1,0900": [0.9], "v1,0901": [0.95]},
    )
    res_all = run_evaluation(CATS, gt, det, excluded_keys=set())
    res_excl = run_evaluation(CATS, gt, det, excluded_keys={"v1,0901"})
    # without exclusion: order [fp@0.95, tp@0.9] over 2 gt → AP = 0.25
    assert _map_key(res_all) == pytest.approx(0.25)
    assert _map_key(res_excl) == pytest.approx(1.0)  # exclusion removes both


def test_average_precision_formula():
    # single point at precision 1, recall 0.4 → envelope extends to AP 0.4
    assert average_precision(np.array([1.0]), np.array([0.4])) == (
        pytest.approx(0.4))


# ---------------------------------------------------------------------------
# Oracle cross-check vs the reference's vendored pure-numpy evaluator.
# ---------------------------------------------------------------------------


def _load_reference_evaluator():
    import importlib.util
    import sys
    import types

    # the vendored evaluator predates numpy 2.x — restore the removed
    # deprecated aliases it uses (oracle adaptation, test-only)
    for alias, typ in (("float", float), ("int", int), ("bool", bool),
                       ("object", object), ("str", str)):
        if not hasattr(np, alias):
            setattr(np, alias, typ)

    pkg = types.ModuleType("ava_eval_ref")
    pkg.__path__ = [REF_EVAL_DIR]
    sys.modules["ava_eval_ref"] = pkg
    names = ["np_box_ops", "np_box_list", "np_box_list_ops", "metrics",
             "standard_fields", "per_image_evaluation",
             "object_detection_evaluation"]
    for name in names:
        spec = importlib.util.spec_from_file_location(
            f"ava_eval_ref.{name}", os.path.join(REF_EVAL_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ava_eval_ref.{name}"] = mod
        spec.loader.exec_module(mod)
    return (sys.modules["ava_eval_ref.object_detection_evaluation"],
            sys.modules["ava_eval_ref.standard_fields"])


@pytest.mark.skipif(not os.path.isdir(REF_EVAL_DIR),
                    reason="reference tree not mounted")
def test_map_matches_reference_evaluator_on_random_fixture():
    ode, fields = _load_reference_evaluator()

    rs = np.random.RandomState(7)
    cats = [{"id": i, "name": f"act{i}"} for i in range(1, 6)]
    ours = PascalDetectionEvaluator(cats)
    ref = ode.PascalDetectionEvaluator(cats)
    gt_f = fields.InputDataFields
    det_f = fields.DetectionResultFields

    for img in range(12):
        key = f"vid,{900 + img:04d}"
        n_gt = rs.randint(1, 5)
        gt_boxes = np.sort(rs.uniform(0, 1, (n_gt, 4)), axis=1)[:, [0, 1, 2, 3]]
        # ensure valid x1<x2, y1<y2 boxes of reasonable size
        gt_boxes = np.stack([
            gt_boxes[:, 0], gt_boxes[:, 1],
            gt_boxes[:, 0] + 0.1 + gt_boxes[:, 2] * 0.4,
            gt_boxes[:, 1] + 0.1 + gt_boxes[:, 3] * 0.4,
        ], axis=1)
        gt_classes = rs.randint(1, 6, n_gt)
        ours.add_single_ground_truth_image_info(
            key, {"boxes": gt_boxes, "classes": gt_classes})
        ref.add_single_ground_truth_image_info(key, {
            gt_f.groundtruth_boxes: gt_boxes[:, [1, 0, 3, 2]],  # ref is yxyx
            gt_f.groundtruth_classes: gt_classes,
            gt_f.groundtruth_difficult: np.zeros(n_gt, bool),
        })
        # detections: jittered copies of gt + random noise boxes
        n_det = rs.randint(1, 7)
        det_boxes, det_classes, det_scores = [], [], []
        for _ in range(n_det):
            if rs.rand() < 0.6:
                j = rs.randint(n_gt)
                b = gt_boxes[j] + rs.normal(0, 0.03, 4)
                c = gt_classes[j] if rs.rand() < 0.8 else rs.randint(1, 6)
            else:
                b = np.sort(rs.uniform(0, 1, 4))
                c = rs.randint(1, 6)
            det_boxes.append(b)
            det_classes.append(c)
            # distinct scores: the reference's global argsort(scores)[::-1]
            # is unstable on ties, so tie order there is unspecified — our
            # deterministic tie policy is covered separately above
            det_scores.append(float(rs.rand()))
        det_boxes = np.asarray(det_boxes)
        det_classes = np.asarray(det_classes)
        det_scores = np.asarray(det_scores)
        ours.add_single_detected_image_info(
            key, {"boxes": det_boxes, "classes": det_classes,
                  "scores": det_scores})
        ref.add_single_detected_image_info(key, {
            det_f.detection_boxes: det_boxes[:, [1, 0, 3, 2]],
            det_f.detection_classes: det_classes,
            det_f.detection_scores: det_scores,
        })

    ours_res = ours.evaluate()
    ref_res = ref.evaluate()
    ref_map = ref_res["PascalBoxes_Precision/mAP@0.5IOU"]
    assert _map_key(ours_res) == pytest.approx(ref_map, abs=1e-6), (
        ours_res, ref_res)
    for c in cats:
        k = f"PascalBoxes_PerformanceByCategory/AP@0.5IOU/{c['name']}"
        if k in ref_res or k in ours_res:
            assert ours_res.get(k, float("nan")) == pytest.approx(
                ref_res.get(k, float("nan")), abs=1e-6, nan_ok=True), k
