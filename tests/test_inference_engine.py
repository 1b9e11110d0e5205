"""Fused eval engine parity: raw-lax/Pallas forward vs flax model.apply.

The engine (engine/inference.py) folds BN and fuses bottleneck blocks; in
f32 on CPU its logits must match the flax path to ~1e-4 (the Pallas kernel
itself is verified against the same reference in test_fused_bottleneck.py).
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.engine.inference import (
    make_fused_eval_forward, supports)
from efficient_slowfast_tpu.models import build_model


def _cfg(depth=50, crop=64, frames=8, alpha=4):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 12
    cfg.RESNET.DEPTH = depth
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
    cfg.NONLOCAL.LOCATION = [[[], []]] * 4
    cfg.NONLOCAL.GROUP = [[1, 1]] * 4
    cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
    cfg.SLOWFAST.ALPHA = alpha
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FUSION_KERNEL_SZ = 7
    cfg.DATA.NUM_FRAMES = frames
    cfg.DATA.CROP_SIZE = crop
    cfg.DATA.TEST_CROP_SIZE = crop
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_supports_gates():
    cfg = _cfg()
    assert supports(cfg)
    bad = _cfg()
    bad.NONLOCAL.LOCATION = [[[1], []]] + [[[], []]] * 3
    assert not supports(bad)
    bad2 = _cfg()
    bad2.BN.NORM_TYPE = "sub_batchnorm"
    assert not supports(bad2)


@pytest.mark.parametrize("depth", [50])
def test_engine_matches_flax_f32(depth):
    cfg = _cfg(depth=depth)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    b, t, s = 2, cfg.DATA.NUM_FRAMES, cfg.DATA.CROP_SIZE
    rs = np.random.RandomState(0)
    inputs = [
        jnp.asarray(rs.rand(b, t // cfg.SLOWFAST.ALPHA, s, s, 3), jnp.float32),
        jnp.asarray(rs.rand(b, t, s, s, 3), jnp.float32),
    ]
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, inputs)
    # randomize BN stats so folding is actually exercised (init is 0/1)
    def jitter(tree, key=[0]):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = jitter(v)
            elif k == "mean":
                key[0] += 1
                out[k] = v + 0.05 * np.float32(key[0] % 7 - 3)
            elif k == "var":
                key[0] += 1
                out[k] = v * np.float32(1.0 + 0.1 * (key[0] % 5))
            else:
                out[k] = v
        return out
    variables = {"params": variables["params"],
                 "batch_stats": jitter(dict(variables["batch_stats"]))}

    ref = model.apply(variables, inputs, train=False)
    fused = make_fused_eval_forward(cfg)
    out = fused(variables, inputs)

    assert out.shape == ref.shape == (b, cfg.MODEL.NUM_CLASSES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # eval scores are post-softmax averages: rows sum to 1
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)
