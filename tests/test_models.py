"""Model-family build + forward tests (small shapes; CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.models import MODEL_REGISTRY, build_model


def two_pathway_cfg(name, **over):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = name
    cfg.MODEL.ARCH = "slowfast"
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.MODEL.NUM_CLASSES = 11
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
    cfg.NONLOCAL.LOCATION = [[[], []]] * 4
    cfg.NONLOCAL.GROUP = [[1, 1]] * 4
    cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
    for k, v in over.items():
        node, leaf = k.rsplit(".", 1)
        obj = cfg
        for part in node.split("."):
            obj = getattr(obj, part)
        setattr(obj, leaf, v)
    return cfg


def run_model(cfg, rng, batch=1):
    import functools

    model = build_model(cfg)
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.CROP_SIZE
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        x = [jnp.ones((batch, t // cfg.SLOWFAST.ALPHA, s, s, 3)),
             jnp.ones((batch, t, s, s, 3))]
    else:
        x = [jnp.ones((batch, t, s, s, 3))]
    # jit init/apply: one fused compile, persistent-cacheable (eager init
    # dispatches per-op and is ~10x slower on this host).
    v = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, x)
    out = jax.jit(functools.partial(model.apply, train=False))(v, x)
    return out, v


def test_registry_has_all_seven():
    expected = {"SlowFast", "ResNet", "SlowFastDualAttention",
                "SlowFastShuffleNetV2", "SlowFastShuffleNet",
                "SlowFastGhostNet", "SlowFastMoibleNetV2"}
    assert expected <= set(MODEL_REGISTRY.keys())


@pytest.mark.parametrize("name", ["SlowFastShuffleNetV2", "SlowFastMoibleNetV2"])
def test_efficient_models_forward(name, rng):
    cfg = two_pathway_cfg(name, **{"SLOWFAST.WIDTH_MULTI": 1.0})
    out, _ = run_model(cfg, rng)
    assert out.shape == (1, 11)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_slowfast_r18_forward(rng):
    cfg = two_pathway_cfg("SlowFast", **{"RESNET.DEPTH": 18})
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2, 2], [2, 2], [2, 2], [2, 2]]
    out, _ = run_model(cfg, rng)
    assert out.shape == (1, 11)


def test_single_pathway_slow(rng):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2], [2], [2], [2]]
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TPU.COMPUTE_DTYPE = "float32"
    out, _ = run_model(cfg, rng)
    assert out.shape == (1, 5)


def test_nonlocal_insertion(rng):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "i3d"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2], [2], [2], [2]]
    cfg.NONLOCAL.LOCATION = [[[]], [[0]], [[]], [[]]]
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.CROP_SIZE = 32
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TPU.COMPUTE_DTYPE = "float32"
    out, v = run_model(cfg, rng)
    assert out.shape == (1, 5)
    assert any("nonlocal" in k for k in v["params"]["s3"].keys())


def test_train_mode_returns_logits(rng):
    import functools

    cfg = two_pathway_cfg("SlowFastShuffleNetV2", **{"SLOWFAST.WIDTH_MULTI": 0.25})
    model = build_model(cfg)
    x = [jnp.ones((2, 2, 32, 32, 3)), jnp.ones((2, 8, 32, 32, 3))]
    v = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, x)
    out, _ = jax.jit(
        functools.partial(model.apply, train=True, mutable=["batch_stats"])
    )(v, x, rngs={"dropout": rng})
    # train mode: raw logits, not softmax'd
    assert not np.allclose(np.asarray(out.sum(-1)), 1.0)
