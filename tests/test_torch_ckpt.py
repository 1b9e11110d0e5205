"""Checkpoint import mapping tests (SURVEY §4: golden tests for interop)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.models import build_model
from efficient_slowfast_tpu.utils.torch_ckpt import (
    c2_name_to_torch,
    export_torch_state_dict,
    flax_path_to_torch_name,
)


def tiny_slowfast_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2, 2]] * 4
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
    cfg.NONLOCAL.LOCATION = [[[], []], [[0], []], [[], []], [[], []]]
    cfg.NONLOCAL.GROUP = [[1, 1]] * 4
    cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.MODEL.NUM_CLASSES = 6
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def build_vars(cfg, rng):
    model = build_model(cfg)
    x = [jnp.ones((1, 2, 32, 32, 3)), jnp.ones((1, 8, 32, 32, 3))]
    v = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, x)
    return model, x, v


def test_reference_names_present(rng):
    cfg = tiny_slowfast_cfg()
    _, _, v = build_vars(cfg, rng)
    sd = export_torch_state_dict(v["params"], v.get("batch_stats", {}))
    expected = [
        "s1.pathway0_stem.conv.weight",
        "s1.pathway0_stem.bn.weight",
        "s1.pathway0_stem.bn.running_mean",
        "s1.pathway1_stem.conv.weight",
        "s1_fuse.conv_f2s.weight",
        "s1_fuse.bn.weight",
        "s2.pathway0_res0.branch2.a.weight",
        "s2.pathway0_res0.branch2.a_bn.weight",
        "s2.pathway0_res0.branch1.weight",
        "s2.pathway0_res0.branch1_bn.running_var",
        "s3.pathway0_nonlocal0.conv_theta.weight",
        "s3.pathway0_nonlocal0.conv_out.weight",
        "s3.pathway0_nonlocal0.bn.weight",
        "head.projection.weight",
        "head.projection.bias",
    ]
    for name in expected:
        assert name in sd, f"missing {name}; have e.g. {sorted(sd)[:8]}"


def test_cmda_names_present(rng):
    cfg = tiny_slowfast_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastDualAttention"
    cfg.RESNET.DEPTH = 18
    cfg.NONLOCAL.LOCATION = [[[], []]] * 4
    _, _, v = build_vars(cfg, rng)
    sd = export_torch_state_dict(v["params"], v.get("batch_stats", {}))
    expected = [
        "s1_fuse.downsample_c_of_slow.weight",
        "s1_fuse.attention_channel_f2s.conv.weight",
        "s1_fuse.attention_spatial_s2f.query_conv.weight",
        "s1_fuse.attention_spatial_s2f.value_conv.bias",
        "s1_fuse.attention_spatial_s2f.gamma",
        "s1_fuse.bn_f2s.weight",
        "s1_fuse.bn_s2f.running_mean",
    ]
    for name in expected:
        assert name in sd, f"missing {name}"


def test_round_trip_import_exact_logits(rng, tmp_path):
    """Export our params to torch names, perturb, reimport → identical logits."""
    import torch

    cfg = tiny_slowfast_cfg()
    model, x, v = build_vars(cfg, rng)

    sd = export_torch_state_dict(v["params"], v.get("batch_stats", {}))
    # randomize every exported tensor so a successful import is distinguishable
    rs = np.random.RandomState(0)
    sd = {k: rs.randn(*np.asarray(w).shape).astype(np.float32) * 0.05
          for k, w in sd.items()}
    ckpt = tmp_path / "ref.pyth"
    torch.save({"model_state": {k: torch.tensor(w) for k, w in sd.items()},
                "epoch": 3}, str(ckpt))

    from efficient_slowfast_tpu.utils.torch_ckpt import load_torch_checkpoint

    params2, stats2 = load_torch_checkpoint(
        cfg, str(ckpt), v["params"], v.get("batch_stats", {})
    )
    # every exported tensor must round-trip exactly
    sd2 = export_torch_state_dict(params2, stats2)
    for k in sd:
        np.testing.assert_allclose(sd2[k], sd[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)
    # and the loaded model must produce different (i.e. actually-loaded) logits
    fwd = jax.jit(functools.partial(model.apply, train=False))
    out_orig = fwd(v, x)
    out_new = fwd({"params": params2, "batch_stats": stats2}, x)
    assert not np.allclose(np.asarray(out_orig), np.asarray(out_new))


def test_c2_name_translation():
    assert c2_name_to_torch("conv1_w") == "s1.pathway0_stem.conv.weight"
    assert (c2_name_to_torch("res2_0_branch2a_w")
            == "s2.pathway0_res0.branch2.a.weight")
    assert (c2_name_to_torch("res3_1_branch2b_bn_rm")
            == "s3.pathway0_res1.branch2.b_bn.running_mean")
    assert (c2_name_to_torch("res4_0_branch1_bn_s")
            == "s4.pathway0_res0.branch1_bn.weight")
    assert c2_name_to_torch("pred_b") == "head.projection.bias"
    assert (c2_name_to_torch("nonlocal_conv3_1_theta_w")
            == "s3.pathway0_nonlocal1.conv_theta.weight")


def efficient_cfg(name, wm):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = name
    cfg.MODEL.ARCH = "slowfast"
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.WIDTH_MULTI = wm
    cfg.SLOWFAST.GROUPS = 3
    cfg.MODEL.NUM_CLASSES = 6
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_efficient_model_names_fully_mapped(rng):
    """Every parameter of every efficient model must resolve to a reference
    torch name (no unmapped leaves), with the reference's Sequential-index
    naming (reference: shufflenetv2_helper.py ShuffleNetV2_Stage naming)."""
    from efficient_slowfast_tpu.utils.torch_ckpt import (
        efficient_prefix_table, resolve_torch_name, _flatten,
    )

    expectations = {
        "SlowFastShuffleNetV2": [
            "s1.pathway0_stem.0.weight",
            "s2.pathway0_channel_224.features.0.banch2.0.weight",
            "s2.pathway1_channel_28.features.0.banch1.1.running_mean",
            "head.pathway0_conv1x1x1.0.0.weight",
            "head.classifier.1.weight",
        ],
        "SlowFastShuffleNet": [
            "s2.pathway0_channel_480.features.0.conv1.weight",
            "s2.pathway0_channel_480.features.0.shortcut.0.weight",
            "s3.pathway1_channel_120.features.1.bn2.running_var",
            "head.classifier.1.bias",
        ],
        "SlowFastMoibleNetV2": [
            "s1.pathway0_stem.features.0.weight",
            "s2.pathway0_channel_16.features.0.conv.0.weight",
            "s2.pathway0_channel_16.features.1.conv.6.weight",
            "s8.pathway1_channel_320.features.0.conv.7.running_mean",
            "head.pathway1_conv1x1x1.0.weight",
        ],
        "SlowFastGhostNet": [
            "s0.pathway0_stem.0.weight",
            "s1.pathway0_channel_16.features.0.ghost1.primary_conv.0.weight",
            "s3.pathway0_channel_40.features.1.se.conv_reduce.weight",
            "head.stage5_conv_slow.conv.weight",
            "head.conv_head_fast.bias",
        ],
    }
    widths = {"SlowFastShuffleNetV2": 2.0, "SlowFastShuffleNet": 2.0,
              "SlowFastMoibleNetV2": 1.0, "SlowFastGhostNet": 1.0}
    for name, expected in expectations.items():
        cfg = efficient_cfg(name, widths[name])
        _, _, v = build_vars_generic(cfg, rng)
        table = efficient_prefix_table(cfg)
        sd = {}
        unmapped = []
        for tree in (v["params"], v.get("batch_stats", {})):
            for p, _ in _flatten(tree).items():
                n = resolve_torch_name(p, table)
                if n is None and p[-1] in ("kernel", "scale", "bias", "mean",
                                           "var", "gamma"):
                    unmapped.append("/".join(p))
                elif n:
                    sd[n] = True
        assert not unmapped, f"{name}: unmapped {unmapped[:5]}"
        for e in expected:
            assert e in sd, f"{name}: missing {e}; sample: {sorted(sd)[:6]}"


def build_vars_generic(cfg, rng):
    import jax.numpy as jnp

    model = build_model(cfg)
    x = [jnp.ones((1, 2, 32, 32, 3)), jnp.ones((1, 8, 32, 32, 3))]
    v = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, x)
    return model, x, v


def test_caffe2_checkpoint_end_to_end(tmp_path):
    """A caffe2-format blobs pickle (the model-zoo `.pkl` layout) loads
    through TRAIN.CHECKPOINT_TYPE=caffe2 into a Slow-R50 param tree with
    exact tensor placement (reference: utils/checkpoint.py:206-261 +
    c2_model_loading.py)."""
    import pickle

    import functools
    import jax
    import numpy as np

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.utils.torch_ckpt import load_torch_checkpoint

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.RESNET.DEPTH = 50
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.CROP_SIZE = 32
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = [jax.numpy.ones((1, 4, 32, 32, 3))]
    variables = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, x)

    rs = np.random.RandomState(0)
    blobs = {
        # stem: conv1_w (Cout, Cin, T, H, W) + BN
        "conv1_w": rs.randn(64, 3, 1, 7, 7).astype(np.float32),
        "res_conv1_bn_s": rs.rand(64).astype(np.float32) + 0.5,
        "res_conv1_bn_b": rs.randn(64).astype(np.float32),
        "res_conv1_bn_rm": rs.randn(64).astype(np.float32),
        "res_conv1_bn_riv": rs.rand(64).astype(np.float32) + 0.5,
        # one res block conv + bn
        "res2_0_branch2a_w": rs.randn(64, 64, 1, 1, 1).astype(np.float32),
        "res2_0_branch2a_bn_s": rs.rand(64).astype(np.float32) + 0.5,
        "res2_0_branch2a_bn_rm": rs.randn(64).astype(np.float32),
        # projection shortcut
        "res2_0_branch1_w": rs.randn(256, 64, 1, 1, 1).astype(np.float32),
        # head
        "pred_w": rs.randn(5, 2048).astype(np.float32),
        "pred_b": rs.randn(5).astype(np.float32),
        # momentum blobs must be skipped
        "conv1_w_momentum": np.zeros((64, 3, 1, 7, 7), np.float32),
    }
    path = tmp_path / "c2_model.pkl"
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)

    params, batch_stats = load_torch_checkpoint(
        cfg, str(path), variables["params"], variables["batch_stats"],
        caffe2=True)

    stem = params["s1"]["pathway0_stem"]
    np.testing.assert_array_equal(
        np.asarray(stem["conv"]["conv"]["kernel"]),
        np.transpose(blobs["conv1_w"], (2, 3, 4, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(stem["bn"]["bn"]["scale"]), blobs["res_conv1_bn_s"])
    np.testing.assert_array_equal(
        np.asarray(batch_stats["s1"]["pathway0_stem"]["bn"]["bn"]["mean"]),
        blobs["res_conv1_bn_rm"])
    blk = params["s2"]["pathway0_res0"]
    np.testing.assert_array_equal(
        np.asarray(blk["branch2"]["a"]["conv"]["kernel"]),
        np.transpose(blobs["res2_0_branch2a_w"], (2, 3, 4, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(blk["branch1"]["conv"]["kernel"]),
        np.transpose(blobs["res2_0_branch1_w"], (2, 3, 4, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(params["head"]["projection"]["fc"]["kernel"]),
        blobs["pred_w"].T)
    np.testing.assert_array_equal(
        np.asarray(params["head"]["projection"]["fc"]["bias"]), blobs["pred_b"])
