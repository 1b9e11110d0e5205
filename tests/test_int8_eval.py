"""TPU.INT8_EVAL: calibrated int8 pointwise-conv serving path
(ops/conv.py::_Int8Conv1x1 + engine/quantize.py). No reference counterpart —
a TPU-native serving addition (the fork serves fp16/fp32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.engine.quantize import calibrate_int8
from efficient_slowfast_tpu.engine.state import create_train_state
from efficient_slowfast_tpu.models import build_model
from efficient_slowfast_tpu.ops.conv import (Conv3d, quant_is_calibrated)
from efficient_slowfast_tpu.ops import options as opt_mod


@pytest.fixture
def int8_options():
    old = opt_mod.options.int8_eval
    opt_mod.options.int8_eval = True
    yield
    opt_mod.options.int8_eval = old


def test_int8_conv1x1_matches_fp_within_quant_error(int8_options):
    """Calibrate then serve: the int8 1x1x1 conv tracks the fp32 conv to
    within the expected 8-bit error, including a spatially-strided
    projection conv (slice + matmul form)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 4, 8, 8, 16), jnp.float32)

    for stride in ((1, 1, 1), (1, 2, 2)):
        m = Conv3d(features=32, kernel_size=(1, 1, 1), stride=stride,
                   padding=(0, 0, 0), use_bias=True, dtype=jnp.float32)
        v = m.init(rng, x)
        assert "quant" in v  # the collection exists from init
        # fp reference from the SAME params with int8 dispatch off
        opt_mod.options.int8_eval = False
        m_fp = Conv3d(features=32, kernel_size=(1, 1, 1), stride=stride,
                      padding=(0, 0, 0), use_bias=True, dtype=jnp.float32)
        v_fp = m_fp.init(rng, x)
        y_fp = m_fp.apply(v_fp, x)
        opt_mod.options.int8_eval = True

        # identical init (same rng/shapes) -> same kernel
        np.testing.assert_allclose(
            np.asarray(v["params"]["conv"]["kernel"]),
            np.asarray(v_fp["params"]["conv"]["kernel"]))

        # calibration pass records the range; serving uses it
        _, upd = m.apply(v, x, mutable=["quant"])
        v = {**v, "quant": upd["quant"]}
        assert quant_is_calibrated(v)
        y_q = m.apply(v, x)
        assert y_q.shape == y_fp.shape
        err = np.abs(np.asarray(y_q) - np.asarray(y_fp))
        scale = np.abs(np.asarray(y_fp)).max()
        assert err.max() / scale < 0.05, (stride, err.max(), scale)


def test_int8_spatial_conv_matches_fp_within_quant_error(int8_options):
    """TPU.INT8_SPATIAL: the k>1 int8 conv (padding + stride + temporal
    kernel) tracks the fp32 conv within 8-bit error."""
    old = opt_mod.options.int8_spatial
    opt_mod.options.int8_spatial = True
    try:
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (2, 4, 10, 10, 8), jnp.float32)
        for kernel, stride, padding in (
            ((1, 3, 3), (1, 1, 1), (0, 1, 1)),
            ((3, 3, 3), (1, 2, 2), (1, 1, 1)),
        ):
            m = Conv3d(features=16, kernel_size=kernel, stride=stride,
                       padding=padding, use_bias=True, dtype=jnp.float32)
            v = m.init(rng, x)
            assert "quant" in v
            opt_mod.options.int8_spatial = False
            m_fp = Conv3d(features=16, kernel_size=kernel, stride=stride,
                          padding=padding, use_bias=True, dtype=jnp.float32)
            v_fp = m_fp.init(rng, x)
            y_fp = m_fp.apply(v_fp, x)
            opt_mod.options.int8_spatial = True
            np.testing.assert_allclose(
                np.asarray(v["params"]["conv"]["kernel"]),
                np.asarray(v_fp["params"]["conv"]["kernel"]))

            _, upd = m.apply(v, x, mutable=["quant"])
            v = {**v, "quant": upd["quant"]}
            assert quant_is_calibrated(v)
            y_q = m.apply(v, x)
            assert y_q.shape == y_fp.shape
            err = np.abs(np.asarray(y_q) - np.asarray(y_fp))
            scale = np.abs(np.asarray(y_fp)).max()
            assert err.max() / scale < 0.05, (kernel, err.max(), scale)
    finally:
        opt_mod.options.int8_spatial = old


def test_int8_eval_full_model_calibrate_and_serve(int8_options):
    """Full SlowFast flow: build with INT8_EVAL, calibrate via
    engine.quantize, serve — logits stay close to the fp model's (cosine
    similarity), and serving before calibration is detectable."""
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
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
    cfg.MODEL.NUM_CLASSES = 10
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"

    rng = jax.random.PRNGKey(0)
    key = jax.random.PRNGKey(1)
    inputs = [
        jax.random.normal(key, (2, 2, 32, 32, 3), jnp.float32),
        jax.random.normal(key, (2, 8, 32, 32, 3), jnp.float32),
    ]

    # fp baseline (int8 dispatch off, same init seed -> same params)
    cfg.TPU.INT8_EVAL = False
    model_fp = build_model(cfg)
    state_fp, _ = create_train_state(cfg, model_fp, rng)
    vars_fp = {"params": state_fp.params, "batch_stats": state_fp.batch_stats}
    y_fp = np.asarray(model_fp.apply(vars_fp, inputs, train=False))

    cfg.TPU.INT8_EVAL = True
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, rng)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    assert not quant_is_calibrated(variables)

    variables = calibrate_int8(model, variables, [inputs])
    assert quant_is_calibrated(variables)
    y_q = np.asarray(model.apply(variables, inputs, train=False))

    # head is softmax-then-mean: probabilities; int8 noise must not distort
    cos = float(np.sum(y_fp * y_q)
                / (np.linalg.norm(y_fp) * np.linalg.norm(y_q)))
    assert cos > 0.999, cos
    assert (np.argmax(y_q, -1) == np.argmax(y_fp, -1)).all()

    # INT8_SPATIAL leg: every conv quantized; more layers -> looser bound
    cfg.TPU.INT8_SPATIAL = True
    try:
        model_s = build_model(cfg)
        state_s, _ = create_train_state(cfg, model_s, rng)
        vars_s = {"params": state_s.params,
                  "batch_stats": state_s.batch_stats}
        assert not quant_is_calibrated(vars_s)
        vars_s = calibrate_int8(model_s, vars_s, [inputs])
        y_s = np.asarray(model_s.apply(vars_s, inputs, train=False))
        cos_s = float(np.sum(y_fp * y_s)
                      / (np.linalg.norm(y_fp) * np.linalg.norm(y_s)))
        assert cos_s > 0.995, cos_s
        assert (np.argmax(y_s, -1) == np.argmax(y_fp, -1)).mean() >= 0.5
    finally:
        cfg.TPU.INT8_SPATIAL = False
        opt_mod.options.int8_spatial = False


def test_calibration_fingerprint_tracks_weight_values(tmp_path):
    """A persisted calibration is only valid for the checkpoint it was
    calibrated on: changing any weight value (not just the tree shape)
    invalidates the file, forcing recalibration instead of silently
    serving stale activation ranges."""
    import jax.numpy as jnp

    from efficient_slowfast_tpu.engine.quantize import (load_calibration,
                                                        save_calibration)

    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    variables = {"params": {"conv": {"kernel": jnp.ones((1, 1, 1, 4, 8))}}}
    quant = {"conv": {"act_max": jnp.asarray(2.5, jnp.float32)}}
    save_calibration(cfg, variables, quant)
    got = load_calibration(cfg, variables)
    assert got is not None
    assert float(jax.tree_util.tree_leaves(got)[0]) == 2.5

    # same tree structure, different weight values -> invalid
    variables2 = {"params": {"conv": {"kernel":
                                      jnp.ones((1, 1, 1, 4, 8)) * 1.01}}}
    assert load_calibration(cfg, variables2) is None

    # a changed input distribution knob also invalidates
    cfg.DATA.TEST_CROP_SIZE += 32
    assert load_calibration(cfg, variables) is None


def test_int8_eval_test_engine_auto_calibrates(tmp_path, monkeypatch):
    """The serving engines calibrate automatically: `engine.test.test` with
    TPU.INT8_EVAL on runs a TPU.INT8_CALIB_BATCHES-batch calibration pass
    (engine/quantize.py::calibrate_for_test) before the 30-view loop,
    persists it, and a second serving run loads the persisted calibration
    instead of recalibrating. The full ensemble still completes (TestMeter
    raises otherwise). TRAIN.ENABLE must be off — the cfg validator
    rejects the combination because the quant collection is not trained."""
    from efficient_slowfast_tpu.config.defaults import assert_and_infer_cfg
    from efficient_slowfast_tpu.engine import quantize as qmod
    from efficient_slowfast_tpu.engine.test import test as run_test

    cfg = get_cfg()
    cfg.TRAIN.ENABLE = False
    cfg.TEST.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.TEST.BATCH_SIZE = 16
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.DATA.CROP_SIZE = 32
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 10
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
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_CALIB_BATCHES = 2
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg = assert_and_infer_cfg(cfg)

    calib_calls = []
    real_calibrate = qmod.calibrate_for_test
    monkeypatch.setattr(
        qmod, "calibrate_for_test",
        lambda *a, **k: calib_calls.append(1) or real_calibrate(*a, **k))

    stats = run_test(cfg)
    assert "top1_acc" in stats
    assert 0.0 <= float(stats["top1_acc"]) <= 100.0
    assert calib_calls == [1]
    import os

    assert os.path.exists(qmod.calibration_path(cfg))

    # second serving run: persisted calibration is loaded, no recalibration
    stats2 = run_test(cfg)
    assert "top1_acc" in stats2
    assert calib_calls == [1]

    # a different quant layout invalidates the persisted file (fingerprint)
    cfg.TPU.INT8_SPATIAL = True
    try:
        stats3 = run_test(cfg)
        assert calib_calls == [1, 1]
        assert "top1_acc" in stats3
    finally:
        cfg.TPU.INT8_SPATIAL = False
        opt_mod.options.int8_spatial = False

    # the validator rejects int8 serving combined with training
    cfg.TRAIN.ENABLE = True
    with pytest.raises(AssertionError, match="INT8_EVAL"):
        assert_and_infer_cfg(cfg)
