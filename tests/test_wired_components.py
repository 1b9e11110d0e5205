"""Tests proving previously-dead components are reachable from config
(VERDICT r1 #4): SLOW_PATHWAY_HEAD, WEIGHTED_RANDOM_SAMPLER,
GRAY_STYLE frame-folder pipeline, SLOW_PATHWAY_MIDDLE packing, and the
host transform classes consumed by Framefolder."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.data.build import build_dataset
from efficient_slowfast_tpu.data.loader import ClipLoader
from efficient_slowfast_tpu.data.pathways import pack_pathway_output
from efficient_slowfast_tpu.models import build_model


def _tiny_sf_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.RESNET.DEPTH = 18
    cfg.RESNET.TRANS_FUNC = "basic_transform"
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[2, 2]] * 4
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
    cfg.NONLOCAL.LOCATION = [[[], []]] * 4
    cfg.NONLOCAL.GROUP = [[1, 1]] * 4
    cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_slow_pathway_head_selected_by_config(rng):
    cfg = _tiny_sf_cfg()
    cfg.MODEL.SLOW_PATHWAY_HEAD = True
    model = build_model(cfg)
    x = [jnp.ones((2, 2, 32, 32, 3)), jnp.ones((2, 8, 32, 32, 3))]
    v = jax.jit(functools.partial(model.init, train=False))(
        {"params": rng, "dropout": rng}, x)
    # slow-only head: projection input dim = slow channels (8*32), not
    # slow+fast concat
    kernel = v["params"]["head"]["projection"]["fc"]["kernel"]
    assert kernel.shape[0] == 8 * 32
    out = model.apply(v, x, train=False)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_weighted_random_sampler_wiring():
    """MODEL.WEIGHTED_RANDOM_SAMPLER sets inverse-frequency sample_weights
    consumed by ClipLoader (reference custom_config.py:7-35)."""
    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.MODEL.WEIGHTED_RANDOM_SAMPLER = True
    ds = build_dataset("synthetic", cfg, "train")
    w = getattr(ds, "sample_weights", None)
    assert w is not None and len(w) == len(ds)
    assert (w > 0).all()
    # synthetic labels are i % 4 → uniform counts → uniform weights
    assert np.allclose(w, w[0])

    # the loader's weighted draw samples WITH replacement (indices repeat
    # with overwhelming probability for 64 draws from 64)
    loader = ClipLoader(ds, batch_size=64, shuffle=True, drop_last=True)
    idx, n_valid = loader._indices()
    assert len(idx) == len(ds) and n_valid == len(ds)
    assert len(np.unique(idx)) < len(ds)


def test_gray_style_framefolder(tmp_path):
    """DATA.GRAY_STYLE drives the grayscale+rotate+salt host pipeline
    (reference decoder.py:607-1041)."""
    d = tmp_path / "clips" / "vid0"
    d.mkdir(parents=True)
    rs = np.random.RandomState(0)
    for i in range(12):
        Image.fromarray(
            rs.randint(0, 255, (40, 60, 3), dtype=np.uint8)
        ).save(d / f"f{i:04d}.jpg")
    (tmp_path / "clips" / "train.txt").write_text(f"{d} 1\n")
    (tmp_path / "clips" / "val.txt").write_text(f"{d} 1\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(tmp_path / "clips")
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [32, 40]
    cfg.DATA.GRAY_STYLE = True
    ds = build_dataset("framefolder", cfg, "train")
    item = ds[0]
    f = item["frames"]
    # square content (width == short side == 40) on the padded canvas,
    # grayscale (R≈G≈B)
    assert f.shape[1] == 40 and int(item["width"]) == 40
    # salt noise may whiten a few pixels but channels stay equal
    assert np.abs(f[..., 0].astype(int) - f[..., 1].astype(int)).max() <= 1
    # HALF_FACE composes with gray style (content stays square after the
    # half-crop + square resize; canvas may carry right padding)
    cfg.DATA.HALF_FACE = True
    ds2 = build_dataset("framefolder", cfg, "train")
    item2 = ds2[0]
    assert item2["frames"].shape[1] == int(item2["width"]) == 40


def test_pack_pathway_middle_window():
    cfg = get_cfg()
    cfg.MODEL.ARCH = "slowfast"
    cfg.SLOWFAST.ALPHA = 4
    cfg.DATA.SLOW_PATHWAY_MIDDLE = True
    frames = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1, 1, 1)
    slow, fast = pack_pathway_output(cfg, frames)
    # middle contiguous T//α window: frames 6..9
    np.testing.assert_array_equal(
        np.asarray(slow).reshape(-1), [6, 7, 8, 9])
    assert fast.shape[1] == 16


def test_flops_per_layer_table(rng):
    """TPU.LOG_FLOPS_PER_LAYER: the nn.tabulate breakdown renders with a
    flops column and covers the pathway stages (reference misc.py:153-162
    ptflops per-layer stats)."""
    from efficient_slowfast_tpu.utils.misc import flops_per_layer_table

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.ARCH = "slowfast"
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.MODEL.NUM_CLASSES = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.CROP_SIZE
    x = [jnp.ones((1, t // cfg.SLOWFAST.ALPHA, s, s, 3)),
         jnp.ones((1, t, s, s, 3))]
    table = flops_per_layer_table(model, x)
    assert "flops" in table
    assert "s1" in table and "head" in table


def test_activation_stats_counts_conv_outputs(rng):
    """log_model_info's activation count (reference misc.py logs fvcore
    ActivationCountAnalysis: elements produced by conv/matmul ops). Checked
    exactly on a single known conv, and for sanity on a full model."""
    import flax.linen as nn

    from efficient_slowfast_tpu.utils.misc import get_activation_stats

    class OneConv(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(4, (3, 3), padding="SAME")(x)

    x = jnp.ones((2, 8, 8, 3))
    acts = get_activation_stats(OneConv(), None, x)
    assert acts == 2 * 8 * 8 * 4  # one conv output, exactly

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.ARCH = "slowfast"
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.MODEL.NUM_CLASSES = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    t, s = cfg.DATA.NUM_FRAMES, cfg.DATA.CROP_SIZE
    inputs = [jnp.ones((1, t // cfg.SLOWFAST.ALPHA, s, s, 3)),
              jnp.ones((1, t, s, s, 3))]
    acts = get_activation_stats(model, cfg, inputs)
    # every pathway stage produces conv activations; the stem alone emits
    # more elements than the input clip
    assert acts > sum(int(np.prod(i.shape)) for i in inputs)


def test_activation_stats_control_flow(rng):
    """Control-flow semantics of the jaxpr walker: a scan body counts
    trip-count times (the compiled program executes it that often — e.g.
    the chunked-attention fallback), and cond counts only its largest
    branch (exactly one branch runs)."""
    import flax.linen as nn
    from jax import lax

    from efficient_slowfast_tpu.utils.misc import get_activation_stats

    class ScanDot(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            w = self.param("w", nn.initializers.ones, (4, 4))

            def body(c, _):
                return c @ w, None

            y, _ = lax.scan(body, x, None, length=5)
            return y

    x = jnp.ones((2, 4))
    assert get_activation_stats(ScanDot(), None, x) == 5 * 2 * 4

    class CondDot(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            w_small = self.param("ws", nn.initializers.ones, (4, 2))
            w_big = self.param("wb", nn.initializers.ones, (4, 8))
            return lax.cond(x.sum() > 0,
                            lambda q: (q @ w_big).sum(),
                            lambda q: (q @ w_small).sum(), x)

    assert get_activation_stats(CondDot(), None, x) == 2 * 8


def test_wheel_gray_alias_and_explicit_list_paths(tmp_path):
    """DATASET wheel_gray (reference configs' Wheel_GRAY) forces the
    gray-style pipeline, and DATA.PATH_TO_TRAIN/VAL_DATA_TXT point the
    Framefolder at absolute list files (wdf fork contract)."""
    d = tmp_path / "anywhere" / "vid0"
    d.mkdir(parents=True)
    rs = np.random.RandomState(1)
    for i in range(8):
        Image.fromarray(
            rs.randint(0, 255, (40, 60, 3), dtype=np.uint8)
        ).save(d / f"f{i:04d}.jpg")
    train_txt = tmp_path / "train_list.txt"
    val_txt = tmp_path / "val_list.txt"
    train_txt.write_text(f"{d} 2\n")
    val_txt.write_text(f"{d} 0\n")

    cfg = get_cfg()
    # no PATH_TO_DATA_DIR at all — only the explicit txt keys
    cfg.DATA.PATH_TO_TRAIN_DATA_TXT = str(train_txt)
    cfg.DATA.PATH_TO_VAL_DATA_TXT = str(val_txt)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [32, 40]
    assert not cfg.DATA.GRAY_STYLE
    ds = build_dataset("wheel_gray", cfg, "train")
    item = ds[0]
    f = item["frames"]
    # gray pipeline ran despite DATA.GRAY_STYLE being off in the base cfg
    assert np.abs(f[..., 0].astype(int) - f[..., 1].astype(int)).max() <= 1
    assert ds._labels[0] == 2
    # val split resolves through PATH_TO_VAL_DATA_TXT
    ds_val = build_dataset("wheel_gray", cfg, "val")
    assert ds_val._labels[0] == 0


def test_load_demo_labels_formats(tmp_path):
    """Both reference demo label formats parse (demo_net.py:141-150):
    id,name CSV (Kinetics/Jester — row order, id column ignored even when
    1-based) and plain name-per-line (AVA .names)."""
    from efficient_slowfast_tpu.utils.misc import load_demo_labels

    csv = tmp_path / "labels.csv"
    csv.write_text("id,name\n1,Doing_other_things\n2,Drumming_Fingers\n")
    assert load_demo_labels(str(csv)) == [
        "Doing_other_things", "Drumming_Fingers"]

    names = tmp_path / "ava.names"
    names.write_text("bend/bow (at the waist)\ncrawl\n")
    assert load_demo_labels(str(names)) == [
        "bend/bow (at the waist)", "crawl"]

    # a name containing commas survives (CSV split is bounded)
    csv2 = tmp_path / "c.csv"
    csv2.write_text("id,name\n0,eating, drinking\n")
    assert load_demo_labels(str(csv2)) == ["eating, drinking"]

    # the shipped label files parse to their class counts
    assert len(load_demo_labels("demo/Kinetics/kinetics_400_labels.csv")) == 400
    assert len(load_demo_labels("demo/Jester/jester_27_labels.csv")) == 27
    assert len(load_demo_labels("demo/AVA/ava.names")) == 80
