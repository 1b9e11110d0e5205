"""SlowFastGhostNet — two-pathway inflated GhostNet with CMDA fusion.

Reference: slowfast/models/custom_video_model_builder.py:792-1026 (model),
slowfast/models/ghostnet_helper.py (GhostModule :71-99, GhostBottleneck
:102-163, SqueezeExcite :34-53), stem_helper.py:309-336, head_helper.py:630-700.

Stage cfgs [k, t, c, SE, s] (reference: custom_video_model_builder.py:814-844);
slow channels = make_divisible(c·width, 4), fast = make_divisible(c·width/β, 4).
NOTE (faithful to reference): GhostNetBasicHead overwrites its softmax/sigmoid
`act` with ReLU (head_helper.py:665), so its eval path is ReLU-then-mean.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import Conv3d, Linear
from ..ops.norm import get_norm, BatchNorm3d
from .build import MODEL_REGISTRY, get_compute_dtype
from .common_efficient import ConvBNAct, EfficientStem, hard_sigmoid, make_divisible
from .fuse import FuseFastAndSlow

# [kernel, hidden(t), out(c), se_ratio, stride] per block, grouped into the 5
# fuse-delimited stages used by the SlowFast variant.
_GHOST_STAGE_CFGS = [
    [[3, 16, 16, 0, 1]],
    [[3, 48, 24, 0, 2], [3, 72, 24, 0, 1]],
    [[5, 72, 40, 0.25, 2], [5, 120, 40, 0.25, 1]],
    [[3, 240, 80, 0, 2], [3, 200, 80, 0, 1], [3, 184, 80, 0, 1],
     [3, 184, 80, 0, 1], [3, 480, 112, 0.25, 1], [3, 672, 112, 0.25, 1]],
    [[5, 672, 160, 0.25, 2], [5, 960, 160, 0, 1], [5, 960, 160, 0.25, 1],
     [5, 960, 160, 0, 1], [5, 960, 160, 0.25, 1]],
]


class SqueezeExcite(nn.Module):
    se_ratio: float = 0.25
    divisor: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_chs = x.shape[-1]
        reduced = make_divisible(in_chs * self.se_ratio, self.divisor)
        y = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        y = Conv3d(reduced, 1, use_bias=True, dtype=self.dtype, name="reduce")(y)
        y = nn.relu(y)
        y = Conv3d(in_chs, 1, use_bias=True, dtype=self.dtype, name="expand")(y)
        return x * hard_sigmoid(y)


class GhostModule(nn.Module):
    """Primary (1,k,k) conv + cheap 3×3×3 depthwise, concat, slice to oup."""

    oup: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    stride: int = 1
    relu: bool = True
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        init_c = math.ceil(self.oup / self.ratio)
        new_c = init_c * (self.ratio - 1)
        act = nn.relu if self.relu else None
        k = self.kernel_size
        x1 = ConvBNAct(init_c, (1, k, k), (1, self.stride, self.stride),
                       (0, k // 2, k // 2), act=act, norm=self.norm,
                       dtype=self.dtype, name="primary")(x, train=train)
        x2 = ConvBNAct(new_c, self.dw_size, 1, self.dw_size // 2,
                       groups=init_c, act=act, norm=self.norm,
                       dtype=self.dtype, name="cheap")(x1, train=train)
        out = jnp.concatenate([x1, x2], axis=-1)
        return out[..., : self.oup]


class GhostBottleneck(nn.Module):
    mid_chs: int
    out_chs: int
    dw_kernel_size: int = 3
    stride: int = 1
    se_ratio: float = 0.0
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_chs = x.shape[-1]
        k = self.dw_kernel_size
        y = GhostModule(self.mid_chs, relu=True, norm=self.norm,
                        dtype=self.dtype, name="ghost1")(x, train=train)
        if self.stride > 1:
            y = ConvBNAct(self.mid_chs, (1, k, k), (1, self.stride, self.stride),
                          (0, (k - 1) // 2, (k - 1) // 2), groups=self.mid_chs,
                          act=None, norm=self.norm, dtype=self.dtype,
                          name="conv_dw")(y, train=train)
        if self.se_ratio > 0:
            y = SqueezeExcite(se_ratio=self.se_ratio, dtype=self.dtype,
                              name="se")(y)
        y = GhostModule(self.out_chs, relu=False, norm=self.norm,
                        dtype=self.dtype, name="ghost2")(y, train=train)
        if in_chs == self.out_chs and self.stride == 1:
            sc = x
        else:
            sc = ConvBNAct(in_chs, (1, k, k), (1, self.stride, self.stride),
                           (0, (k - 1) // 2, (k - 1) // 2), groups=in_chs,
                           act=None, norm=self.norm, dtype=self.dtype,
                           name="shortcut_dw")(x, train=train)
            sc = ConvBNAct(self.out_chs, 1, act=None, norm=self.norm,
                           dtype=self.dtype, name="shortcut_pw")(sc, train=train)
        return y + sc


class GhostNetStage(nn.Module):
    slow_cfg: Sequence[Sequence[float]]
    fast_cfg: Sequence[Sequence[float]]
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for p, cfg_rows in enumerate([self.slow_cfg, self.fast_cfg]):
            x = inputs[p]
            for i, (k, exp, c, se, s) in enumerate(cfg_rows):
                x = GhostBottleneck(
                    mid_chs=make_divisible(exp, 2),
                    out_chs=make_divisible(c, 2),
                    dw_kernel_size=int(k), stride=int(s), se_ratio=float(se),
                    norm=self.norm, dtype=self.dtype,
                    name=f"pathway{p}_block{i}",
                )(x, train=train)
            outs.append(x)
        return outs


class GhostNetBasicHead(nn.Module):
    """stage5 conv → pool → conv_head → ReLU → concat → dropout → linear.

    Faithful to the reference bug: eval activation is ReLU (not softmax)
    because `self.act` is reassigned (head_helper.py:665)."""

    num_classes: int
    mid_channel: Sequence[int]
    output_channel: Sequence[int]
    dropout_rate: float = 0.0
    fc_init_std: float = 0.01
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        pools = []
        for p, x in enumerate(inputs):
            x = ConvBNAct(self.mid_channel[p], 1, act=nn.relu, norm=self.norm,
                          dtype=self.dtype, name=f"stage5_conv_{p}")(x, train=train)
            x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            x = Conv3d(self.output_channel[p], 1, use_bias=True,
                       dtype=self.dtype, name=f"conv_head_{p}")(x)
            pools.append(nn.relu(x))
        x = jnp.concatenate(pools, axis=-1)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = Linear(self.num_classes, init_std=self.fc_init_std,
                   dtype=self.dtype, name="projection")(x)
        if not train:
            x = jnp.mean(nn.relu(x.astype(jnp.float32)), axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)


@MODEL_REGISTRY.register()
class SlowFastGhostNet(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, x, bboxes=None, train: bool = False):
        cfg = self.cfg
        dtype = get_compute_dtype(cfg)
        norm = get_norm(cfg)
        beta = cfg.SLOWFAST.BETA_INV
        wm = float(cfg.SLOWFAST.WIDTH_MULTI)

        slow_cfgs, fast_cfgs = [], []
        for stage_rows in _GHOST_STAGE_CFGS:
            slow_cfgs.append([
                [k, make_divisible(t * wm, 4), make_divisible(c * wm, 4), se, s]
                for k, t, c, se, s in stage_rows
            ])
            fast_cfgs.append([
                [k, make_divisible(t * wm // beta, 4),
                 make_divisible(c * wm // beta, 4), se, s]
                for k, t, c, se, s in stage_rows
            ])

        stem_ch = [make_divisible(16 * wm, 4), make_divisible(16 * wm // beta, 4)]
        out_ch = [int(1280 * wm), int(1280 * wm // beta)]

        x = EfficientStem(dim_out=stem_ch, with_pool=False, act_name="relu",
                          norm=norm, dtype=dtype, name="s0")(x, train=train)

        def fuse(name):
            return FuseFastAndSlow(alpha=cfg.SLOWFAST.ALPHA, beta_inv=beta,
                                   reduction=1, norm=norm, dtype=dtype, name=name)

        # s1..s5 with fuses after s1..s4 (reference forward :1008-1022)
        for i in range(5):
            x = GhostNetStage(slow_cfg=slow_cfgs[i], fast_cfg=fast_cfgs[i],
                              norm=norm, dtype=dtype, name=f"s{i + 1}",
                              )(x, train=train)
            if i < 4:
                x = fuse(f"s{i + 1}_fuse")(x, train=train)

        return GhostNetBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            mid_channel=[slow_cfgs[4][-1][1], fast_cfgs[4][-1][1]],
            output_channel=out_ch,
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            norm=norm, dtype=dtype, name="head",
        )(x, train=train)
