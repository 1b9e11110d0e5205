"""SlowFastShuffleNetV2 — two-pathway inflated ShuffleNetV2 with CMDA fusion.

Reference: slowfast/models/custom_video_model_builder.py:448-617 (model),
slowfast/models/shufflenetv2_helper.py (InvertedResidual :46-112, stage
:222-297), stem_helper.py:236-270, head_helper.py:499-557.

Per-pathway channel tables (reference: custom_video_model_builder.py:470-486;
w1.0/w2.0 differ from the plain ShuffleNetV2 to keep channels divisible after
the CMDA fuse): fast channels = slow // BETA_INV.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from ..ops.norm import get_norm, BatchNorm3d
from .build import MODEL_REGISTRY, get_compute_dtype
from .common_efficient import ConvBNAct, EfficientBasicHead, EfficientStem, channel_shuffle
from .fuse import FuseFastAndSlow

_STAGE_OUT_CHANNELS = {
    0.25: [-1, 24, 32, 64, 128, 1024],
    0.5: [-1, 24, 48, 96, 192, 1024],
    1.0: [-1, 24, 116, 240, 464, 1024],
    1.5: [-1, 24, 176, 352, 704, 1024],
    2.0: [-1, 24, 224, 496, 976, 2048],
}
_STAGE_REPEATS = [4, 8, 4]


class InvertedResidual(nn.Module):
    """ShuffleNetV2 unit. stride=1: split-half; stride=2: dual branch.
    Depthwise conv is 3×3×3 with stride (1, s, s); shuffle(2) at the end."""

    oup: int
    stride: int
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        oup_inc = self.oup // 2
        s = self.stride

        def branch_main(y, name):
            y = ConvBNAct(oup_inc, 1, act=nn.relu, norm=self.norm,
                          dtype=self.dtype, name=f"{name}_pw")(y, train=train)
            y = ConvBNAct(oup_inc, 3, (1, s, s), 1, groups=oup_inc, act=None,
                          norm=self.norm, dtype=self.dtype,
                          name=f"{name}_dw")(y, train=train)
            y = ConvBNAct(oup_inc, 1, act=nn.relu, norm=self.norm,
                          dtype=self.dtype, name=f"{name}_pwl")(y, train=train)
            return y

        if s == 1:
            c = x.shape[-1]
            x1, x2 = x[..., : c // 2], x[..., c // 2:]
            out = jnp.concatenate([x1, branch_main(x2, "banch2")], axis=-1)
        else:
            inp = x.shape[-1]
            b1 = ConvBNAct(inp, 3, (1, s, s), 1, groups=inp, act=None,
                           norm=self.norm, dtype=self.dtype,
                           name="banch1_dw")(x, train=train)
            b1 = ConvBNAct(oup_inc, 1, act=nn.relu, norm=self.norm,
                           dtype=self.dtype, name="banch1_pwl")(b1, train=train)
            out = jnp.concatenate([b1, branch_main(x, "banch2")], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2Stage(nn.Module):
    """One pathway-pair stage: repeats[idx] InvertedResiduals per pathway."""

    idxstage: int
    slow_out: int
    fast_out: int
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        reps = _STAGE_REPEATS[self.idxstage]
        outs = []
        for p, out_c in enumerate([self.slow_out, self.fast_out]):
            x = inputs[p]
            for i in range(reps):
                x = InvertedResidual(
                    oup=out_c, stride=2 if i == 0 else 1, norm=self.norm,
                    dtype=self.dtype, name=f"pathway{p}_block{i}",
                )(x, train=train)
            outs.append(x)
        return outs


@MODEL_REGISTRY.register()
class SlowFastShuffleNetV2(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, x, bboxes=None, train: bool = False):
        cfg = self.cfg
        dtype = get_compute_dtype(cfg)
        norm = get_norm(cfg)
        beta = cfg.SLOWFAST.BETA_INV
        wm = float(cfg.SLOWFAST.WIDTH_MULTI)
        if wm not in _STAGE_OUT_CHANNELS:
            raise ValueError(f"width multiplier {wm} not supported")
        slow_ch = _STAGE_OUT_CHANNELS[wm]
        fast_ch = [c // beta for c in slow_ch]

        x = EfficientStem(
            dim_out=[slow_ch[1], fast_ch[1]], with_pool=True, act_name="relu",
            norm=norm, dtype=dtype, name="s1",
        )(x, train=train)

        def fuse(name):
            return FuseFastAndSlow(alpha=cfg.SLOWFAST.ALPHA, beta_inv=beta,
                                   reduction=1, norm=norm, dtype=dtype, name=name)

        x = fuse("s1_fuse")(x, train=train)
        for i, sname in enumerate(["s2", "s3", "s4"]):
            x = ShuffleNetV2Stage(
                idxstage=i, slow_out=slow_ch[i + 2], fast_out=fast_ch[i + 2],
                norm=norm, dtype=dtype, name=sname,
            )(x, train=train)
            x = fuse(f"{sname}_fuse")(x, train=train)

        return EfficientBasicHead(
            num_classes=cfg.MODEL.NUM_CLASSES,
            last_channel=[slow_ch[-1], fast_ch[-1]],
            conv_act_name="relu",
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            norm=norm, dtype=dtype, name="head",
        )(x, train=train)
