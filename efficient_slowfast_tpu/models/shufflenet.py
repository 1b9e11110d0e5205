"""SlowFastShuffleNet — two-pathway inflated ShuffleNet(v1) with CMDA fusion.

Reference: slowfast/models/custom_video_model_builder.py:620-789 (model),
slowfast/models/shufflenet_helper.py (Bottleneck :37-85, stage :221-297),
stem_helper.py:273-306, head_helper.py:562-609.

Group-count → out_planes table at custom_video_model_builder.py:646-661;
width multiplier scales all plane counts; fast channels = slow // BETA_INV.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import Conv3d
from ..ops.norm import get_norm, BatchNorm3d
from ..ops.pool import avg_pool3d
from .build import MODEL_REGISTRY, get_compute_dtype
from .common_efficient import ConvBNAct, EfficientBasicHead, EfficientStem, channel_shuffle
from .fuse import FuseFastAndSlow

_OUT_PLANES = {
    1: [24, 144, 288, 567],
    2: [24, 200, 400, 800],
    3: [24, 240, 480, 960],
    4: [24, 272, 544, 1088],
    8: [24, 384, 768, 1536],
}
_NUM_BLOCKS = [4, 8, 4]


class Bottleneck(nn.Module):
    """ShuffleNet(v1) grouped bottleneck (reference: shufflenet_helper.py:37-85).

    stride=2: mid = out//2, branch out = out - out//2, concat with
    avg-pooled 1×1-conv shortcut; stride=1: residual add. First grouped conv
    uses groups=1 when the input has the stem's 24 channels.
    """

    out_planes: int
    stride: int
    groups: int
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_planes = x.shape[-1]
        if self.stride == 2:
            mid = self.out_planes // 2
            out_c = self.out_planes - self.out_planes // 2
        else:
            mid = self.out_planes // 4
            out_c = self.out_planes
        g = 1 if in_planes == 24 else self.groups

        y = ConvBNAct(mid, 1, groups=g, act=nn.relu, norm=self.norm,
                      dtype=self.dtype, name="conv1")(x, train=train)
        y = channel_shuffle(y, self.groups)
        y = ConvBNAct(mid, 3, (1, self.stride, self.stride), 1, groups=mid,
                      act=None, norm=self.norm, dtype=self.dtype,
                      name="conv2")(y, train=train)
        y = ConvBNAct(out_c, 1, groups=self.groups, act=None, norm=self.norm,
                      dtype=self.dtype, name="conv3")(y, train=train)
        if self.stride == 2:
            sc = Conv3d(mid, 1, use_bias=False, dtype=self.dtype,
                        name="shortcut_conv")(x)
            sc = avg_pool3d(sc, (1, 3, 3), (1, 2, 2), (0, 1, 1))
            return nn.relu(jnp.concatenate([y, sc], axis=-1))
        return nn.relu(y + x)


class ShuffleNetStage(nn.Module):
    slow_out: int
    fast_out: int
    num_block: int
    groups: int
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for p, out_c in enumerate([self.slow_out, self.fast_out]):
            x = inputs[p]
            for i in range(self.num_block):
                x = Bottleneck(
                    out_planes=out_c, stride=2 if i == 0 else 1,
                    groups=self.groups, norm=self.norm, dtype=self.dtype,
                    name=f"pathway{p}_block{i}",
                )(x, train=train)
            outs.append(x)
        return outs


@MODEL_REGISTRY.register()
class SlowFastShuffleNet(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, x, bboxes=None, train: bool = False):
        cfg = self.cfg
        dtype = get_compute_dtype(cfg)
        norm = get_norm(cfg)
        beta = cfg.SLOWFAST.BETA_INV
        groups = cfg.SLOWFAST.GROUPS
        wm = float(cfg.SLOWFAST.WIDTH_MULTI)
        if groups not in _OUT_PLANES:
            raise ValueError(f"{groups} groups is not supported")
        slow_ch = [int(c * wm) for c in _OUT_PLANES[groups]]
        fast_ch = [c // beta for c in slow_ch]

        x = EfficientStem(
            dim_out=[slow_ch[0], fast_ch[0]], with_pool=True, act_name="relu",
            norm=norm, dtype=dtype, name="s1",
        )(x, train=train)

        def fuse(name):
            return FuseFastAndSlow(alpha=cfg.SLOWFAST.ALPHA, beta_inv=beta,
                                   reduction=1, norm=norm, dtype=dtype, name=name)

        x = fuse("s1_fuse")(x, train=train)
        for i, sname in enumerate(["s2", "s3", "s4"]):
            x = ShuffleNetStage(
                slow_out=slow_ch[i + 1], fast_out=fast_ch[i + 1],
                num_block=_NUM_BLOCKS[i], groups=groups,
                norm=norm, dtype=dtype, name=sname,
            )(x, train=train)
            x = fuse(f"{sname}_fuse")(x, train=train)

        return EfficientBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            last_channel=None,  # ShuffleNetBasicHead: pool directly, no conv
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            norm=norm, dtype=dtype, name="head",
        )(x, train=train)
