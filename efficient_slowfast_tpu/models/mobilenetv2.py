"""SlowFastMoibleNetV2 — two-pathway inflated MobileNetV2 with CMDA fusion.

Reference: slowfast/models/custom_video_model_builder.py:1057-1285 (model;
class name kept verbatim including the reference's "Moible" spelling so YAML
configs resolve), slowfast/models/mobilenetv2_helper.py (InvertedResidual
:30-68, stage :258-345), stem_helper.py:181-232, head_helper.py:436-486.

Stage layout (reference forward :1262-1285): s1 stem → s2 = settings[0:2] →
s3_fuse → s4 = settings[2:3] → s4_fuse → s5 = settings[3:4] → s5_fuse →
s6 = settings[4:5] → s7 = settings[5:6] → s7_fuse → s8 = settings[6:] → head.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norm import get_norm, BatchNorm3d
from .build import MODEL_REGISTRY, get_compute_dtype
from .common_efficient import ConvBNAct, EfficientBasicHead, EfficientStem
from .fuse import FuseFastAndSlow

# (expand_ratio t, channels c, repeats n, stride s) per setting row
# (reference: custom_video_model_builder.py:1029-1054).
_SETTINGS = [
    (1, 16, 1, (1, 1, 1)),
    (6, 24, 2, (1, 2, 2)),
    (6, 32, 3, (1, 2, 2)),
    (6, 64, 4, (1, 2, 2)),
    (6, 96, 3, (1, 1, 1)),
    (6, 160, 3, (1, 2, 2)),
    (6, 320, 1, (1, 1, 1)),
]


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual, 3×3×3 depthwise, ReLU6."""

    oup: int
    stride: Tuple[int, int, int]
    expand_ratio: int
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inp = x.shape[-1]
        hidden = round(inp * self.expand_ratio)
        use_res = self.stride == (1, 1, 1) and inp == self.oup
        y = x
        if self.expand_ratio != 1:
            y = ConvBNAct(hidden, 1, act=jax.nn.relu6, norm=self.norm,
                          dtype=self.dtype, name="pw")(y, train=train)
        y = ConvBNAct(hidden, 3, self.stride, 1, groups=hidden,
                      act=jax.nn.relu6, norm=self.norm, dtype=self.dtype,
                      name="dw")(y, train=train)
        y = ConvBNAct(self.oup, 1, act=None, norm=self.norm, dtype=self.dtype,
                      name="pwl")(y, train=train)
        return x + y if use_res else y


class MobileNetV2Stage(nn.Module):
    """Per-pathway run of inverted-residual settings; fast channels divided
    by beta_inv (reference: mobilenetv2_helper.py:258-345)."""

    settings: Sequence[Tuple[int, int, int, Tuple[int, int, int]]]
    width_mult: float
    beta_inv: int
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        outs = []
        for p in range(len(inputs)):
            x = inputs[p]
            bi = None if p == 0 else self.beta_inv
            blk = 0
            for t, c, n, s in self.settings:
                out_c = (int(c * self.width_mult) if bi is None
                         else int(c * self.width_mult // bi))
                for i in range(n):
                    x = InvertedResidual(
                        oup=out_c, stride=tuple(s) if i == 0 else (1, 1, 1),
                        expand_ratio=t, norm=self.norm, dtype=self.dtype,
                        name=f"pathway{p}_block{blk}",
                    )(x, train=train)
                    blk += 1
            outs.append(x)
        return outs


@MODEL_REGISTRY.register()
class SlowFastMoibleNetV2(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, x, bboxes=None, train: bool = False):
        cfg = self.cfg
        dtype = get_compute_dtype(cfg)
        norm = get_norm(cfg)
        beta = cfg.SLOWFAST.BETA_INV
        wm = float(cfg.SLOWFAST.WIDTH_MULTI)
        alpha = cfg.SLOWFAST.ALPHA
        last_channel = int(1280 * wm) if wm > 1.0 else 1280

        x = EfficientStem(
            dim_out=[int(32 * wm), int(32 * (wm / beta))],
            with_pool=False, act_name="relu6",
            norm=norm, dtype=dtype, name="s1",
        )(x, train=train)

        def stage(name, settings):
            return MobileNetV2Stage(settings=settings, width_mult=wm,
                                    beta_inv=beta, norm=norm, dtype=dtype,
                                    name=name)

        def fuse(name):
            return FuseFastAndSlow(alpha=alpha, beta_inv=beta, reduction=1,
                                   norm=norm, dtype=dtype, name=name)

        x = stage("s2", _SETTINGS[0:2])(x, train=train)
        x = fuse("s3_fuse")(x, train=train)
        x = stage("s4", _SETTINGS[2:3])(x, train=train)
        x = fuse("s4_fuse")(x, train=train)
        x = stage("s5", _SETTINGS[3:4])(x, train=train)
        x = fuse("s5_fuse")(x, train=train)
        x = stage("s6", _SETTINGS[4:5])(x, train=train)
        x = stage("s7", _SETTINGS[5:6])(x, train=train)
        x = fuse("s7_fuse")(x, train=train)
        x = stage("s8", _SETTINGS[6:])(x, train=train)

        return EfficientBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            last_channel=[last_channel, last_channel // beta],
            conv_act_name="relu6",
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            norm=norm, dtype=dtype, name="head",
        )(x, train=train)
