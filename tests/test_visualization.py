"""Visualization tests: Grad-CAM interception + plot utils."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.models import build_model
from efficient_slowfast_tpu.visualization.gradcam import GradCAM, overlay_heatmap
from efficient_slowfast_tpu.visualization.utils import (
    get_confusion_matrix, plot_confusion_matrix, plot_topk_histogram,
)


def test_gradcam_on_two_pathway_model(rng):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.ARCH = "slowfast"
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.MODEL.NUM_CLASSES = 6
    cfg.TPU.COMPUTE_DTYPE = "float32"
    m = build_model(cfg)
    x = [jnp.asarray(np.random.RandomState(0).randn(1, 2, 32, 32, 3), jnp.float32),
         jnp.asarray(np.random.RandomState(1).randn(1, 8, 32, 32, 3), jnp.float32)]
    v = jax.jit(functools.partial(m.init, train=False))(
        {"params": rng, "dropout": rng}, x)
    cam = GradCAM(m, v, target_layer="s3")
    preds, heats = cam(x)
    assert preds.shape == (1, 6)
    assert isinstance(heats, list) and len(heats) == 2  # one CAM per pathway
    for h in heats:
        assert h.min() >= 0.0 and h.max() <= 1.0
    # unknown layer errors clearly
    import pytest

    with pytest.raises(KeyError):
        GradCAM(m, v, target_layer="nope/nothere")(x)


def test_overlay_heatmap_shapes():
    frames = np.zeros((4, 16, 16, 3), np.uint8)
    cam = np.random.rand(2, 4, 4)
    out = overlay_heatmap(frames, cam)
    assert out.shape == frames.shape and out.dtype == np.uint8


def test_confusion_matrix_and_plots():
    preds = np.eye(4)[[0, 1, 2, 3, 0]]
    labels = np.array([0, 1, 2, 3, 1])
    cm = get_confusion_matrix(preds, labels, 4)
    assert cm.shape == (4, 4)
    assert cm[0, 0] == 1.0 and cm[1, 1] == 0.5
    fig = plot_confusion_matrix(cm, 4)
    assert fig is not None
    fig2 = plot_topk_histogram(1, cm[1], topk=2)
    assert fig2 is not None
