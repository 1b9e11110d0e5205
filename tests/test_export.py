"""AOT serving export: round-trip through jax.export (engine/export.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efficient_slowfast_tpu.config import assert_and_infer_cfg, get_cfg
from efficient_slowfast_tpu.engine.export import export_serving, load_serving
from efficient_slowfast_tpu.engine.state import create_train_state, make_forward
from efficient_slowfast_tpu.models import build_model


def _tiny_cfg():
    cfg = get_cfg()
    cfg.merge_from_file("configs/Synthetic/SHUFFLENETV2_TINY.yaml")
    cfg.TRAIN.ENABLE = False
    return assert_and_infer_cfg(cfg)


def _inputs(cfg, b, seed=0):
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.TEST_CROP_SIZE
    r = np.random.RandomState(seed)
    return [
        jnp.asarray(r.randn(b, t // cfg.SLOWFAST.ALPHA, s, s, 3), jnp.float32),
        jnp.asarray(r.randn(b, t, s, s, 3), jnp.float32),
    ]


def test_export_roundtrip_symbolic_batch(tmp_path):
    """Export → deserialize → serve at two batch sizes; predictions match
    the live forward exactly (same program, baked weights)."""
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))

    path = export_serving(cfg, state, str(tmp_path / "tiny"))
    assert path.endswith(".jaxserving")

    serving = load_serving(path)
    fwd = make_forward(cfg, model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for b in (2, 5):  # symbolic batch: one artifact, any batch size
        x = _inputs(cfg, b, seed=b)
        got = serving(x)
        want = np.asarray(jax.device_get(fwd(variables, x)))
        assert got.shape == (b, cfg.MODEL.NUM_CLASSES)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # eval head output is softmax-then-mean: rows sum to ~1
        np.testing.assert_allclose(got.sum(-1), np.ones(b), rtol=1e-4)


def _det_cfg():
    """Tiny SlowFast R18 detection config (model fields only — export
    needs no dataset paths)."""
    cfg = get_cfg()
    cfg.DETECTION.ENABLE = True
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 80
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
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.CROP_SIZE = 32
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_export_detection_roundtrip_symbolic_batch(tmp_path):
    """Detection artifact: symbolic batch, static max_boxes; per-box scores
    match the live RoI forward at two batch sizes."""
    from efficient_slowfast_tpu.engine.state import make_detection_forward

    cfg = _det_cfg()
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))

    max_boxes = 3
    path = export_serving(cfg, state, str(tmp_path / "det"),
                          max_boxes=max_boxes)
    serving = load_serving(path)
    fwd = make_detection_forward(cfg, model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    s = cfg.DATA.TEST_CROP_SIZE
    for b in (2, 4):
        x = _inputs(cfg, b, seed=b)
        r = np.random.RandomState(10 + b)
        x1y1 = r.uniform(0, s / 2, (b, max_boxes, 2))
        wh = r.uniform(2, s / 2, (b, max_boxes, 2))
        boxes = jnp.asarray(
            np.concatenate([x1y1, x1y1 + wh], axis=-1), jnp.float32)
        got = serving(x, boxes)
        want = np.asarray(jax.device_get(fwd(variables, x, boxes)))
        assert got.shape == (b * max_boxes, cfg.MODEL.NUM_CLASSES)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # sigmoid head: scores in (0, 1)
        assert got.min() > 0.0 and got.max() < 1.0


def test_export_int8_requires_calibration(tmp_path):
    cfg = _tiny_cfg()
    cfg.TPU.INT8_EVAL = True
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    with pytest.raises(AssertionError, match="calibrated"):
        export_serving(cfg, state, str(tmp_path / "tiny_int8"))


def test_export_int8_calibrated_roundtrip(tmp_path):
    """A calibrated int8 serving graph exports and serves; outputs agree
    with the live int8 forward."""
    from efficient_slowfast_tpu.engine.quantize import calibrate_int8

    cfg = _tiny_cfg()
    cfg.TPU.INT8_EVAL = True
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = calibrate_int8(model, variables, [_inputs(cfg, 2)])

    class _S:  # state-like carrier with the quant collection
        params = state.params
        batch_stats = state.batch_stats
        quant = variables["quant"]

    path = export_serving(cfg, _S(), str(tmp_path / "tiny_int8"))
    serving = load_serving(path)
    x = _inputs(cfg, 3, seed=7)
    got = serving(x)
    want = np.asarray(jax.device_get(
        make_forward(cfg, model)(variables, x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_int8_uses_persisted_calibration(tmp_path):
    """The CLI path: export_serving with no quant= picks up the
    calibration persisted by the serving engines (fingerprint-checked)."""
    from efficient_slowfast_tpu.engine.quantize import (calibrate_int8,
                                                        save_calibration)

    cfg = _tiny_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TPU.INT8_EVAL = True
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    variables = calibrate_int8(model, variables, [_inputs(cfg, 2)])
    save_calibration(cfg, variables, variables["quant"])

    path = export_serving(cfg, state, str(tmp_path / "tiny_int8_cli"))
    serving = load_serving(path)
    x = _inputs(cfg, 2, seed=3)
    want = np.asarray(jax.device_get(make_forward(cfg, model)(variables, x)))
    np.testing.assert_allclose(serving(x), want, rtol=1e-5, atol=1e-5)
