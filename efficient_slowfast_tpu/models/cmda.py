"""SlowFastDualAttention — the CMDA model (the paper's contribution).

Reference: slowfast/models/custom_video_model_builder.py:171-445. Same
ResNet trunk skeleton as SlowFast, but every lateral connection is the
bidirectional FuseFastAndSlow (ECA channel attention Fast→Slow, spatial
attention Slow→Fast), which also widens the FAST pathway input of each stage
by slow_dim//β channels.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..ops.norm import get_norm
from ..ops.pool import max_pool3d
from .build import MODEL_REGISTRY, get_compute_dtype
from .fuse import FuseFastAndSlow
from .resnet import ResStage
from .stems import VideoModelStem
from .slowfast import _MODEL_STAGE_DEPTH, _stage_kwargs, basic_head_cls

# CMDA uses the canonical slowfast kernel basis / pool table
# (reference: custom_video_model_builder.py:151-169).
_TEMPORAL_KERNEL = [
    [[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]],
]
_POOL1 = [[1, 1, 1], [1, 1, 1]]


@MODEL_REGISTRY.register()
class SlowFastDualAttention(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, x, bboxes=None, train: bool = False):
        cfg = self.cfg
        dtype = get_compute_dtype(cfg)
        norm = get_norm(cfg)
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        w = cfg.RESNET.WIDTH_PER_GROUP
        num_groups = cfg.RESNET.NUM_GROUPS
        dim_inner = num_groups * w
        beta = cfg.SLOWFAST.BETA_INV

        x = VideoModelStem(
            dim_out=[w, w // beta],
            kernel=[_TEMPORAL_KERNEL[0][0] + [7, 7], _TEMPORAL_KERNEL[0][1] + [7, 7]],
            stride=[[1, 2, 2]] * 2,
            padding=[[_TEMPORAL_KERNEL[0][0][0] // 2, 3, 3],
                     [_TEMPORAL_KERNEL[0][1][0] // 2, 3, 3]],
            norm=norm, dtype=dtype, name="s1",
        )(x, train=train)

        def fuse(name):
            return FuseFastAndSlow(
                alpha=cfg.SLOWFAST.ALPHA, beta_inv=beta, reduction=1,
                norm=norm, dtype=dtype, name=name,
            )

        x = fuse("s1_fuse")(x, train=train)
        x = ResStage(
            dim_out=[w * 4, w * 4 // beta],
            dim_inner=[dim_inner, dim_inner // beta],
            num_blocks=[d2] * 2, num_groups=[num_groups] * 2,
            norm=norm, dtype=dtype, name="s2", **_stage_kwargs(cfg, 0),
        )(x, train=train)
        x = fuse("s2_fuse")(x, train=train)
        x = [max_pool3d(xi, _POOL1[p], _POOL1[p]) for p, xi in enumerate(x)]
        x = ResStage(
            dim_out=[w * 8, w * 8 // beta],
            dim_inner=[dim_inner * 2, dim_inner * 2 // beta],
            num_blocks=[d3] * 2, num_groups=[num_groups] * 2,
            norm=norm, dtype=dtype, name="s3", **_stage_kwargs(cfg, 1),
        )(x, train=train)
        x = fuse("s3_fuse")(x, train=train)
        x = ResStage(
            dim_out=[w * 16, w * 16 // beta],
            dim_inner=[dim_inner * 4, dim_inner * 4 // beta],
            num_blocks=[d4] * 2, num_groups=[num_groups] * 2,
            norm=norm, dtype=dtype, name="s4", **_stage_kwargs(cfg, 2),
        )(x, train=train)
        x = fuse("s4_fuse")(x, train=train)
        x = ResStage(
            dim_out=[w * 32, w * 32 // beta],
            dim_inner=[dim_inner * 8, dim_inner * 8 // beta],
            num_blocks=[d5] * 2, num_groups=[num_groups] * 2,
            norm=norm, dtype=dtype, name="s5", **_stage_kwargs(cfg, 3),
        )(x, train=train)

        if cfg.DETECTION.ENABLE:
            from .detection import ResNetRoIHead

            return ResNetRoIHead(
                num_classes=cfg.MODEL.NUM_CLASSES,
                pool_size=[
                    [cfg.DATA.NUM_FRAMES // cfg.SLOWFAST.ALPHA // _POOL1[0][0], 1, 1],
                    [cfg.DATA.NUM_FRAMES // _POOL1[1][0], 1, 1],
                ],
                resolution=[[cfg.DETECTION.ROI_XFORM_RESOLUTION] * 2] * 2,
                scale_factor=[cfg.DETECTION.SPATIAL_SCALE_FACTOR] * 2,
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                fc_init_std=cfg.MODEL.FC_INIT_STD,
                dtype=dtype, name="head",
            )(x, bboxes, train=train)

        return basic_head_cls(cfg)(
            num_classes=cfg.MODEL.NUM_CLASSES,
            pool_size=None if cfg.MULTIGRID.SHORT_CYCLE else [
                [cfg.DATA.NUM_FRAMES // cfg.SLOWFAST.ALPHA // _POOL1[0][0],
                 cfg.DATA.CROP_SIZE // 32 // _POOL1[0][1],
                 cfg.DATA.CROP_SIZE // 32 // _POOL1[0][2]],
                [cfg.DATA.NUM_FRAMES // _POOL1[1][0],
                 cfg.DATA.CROP_SIZE // 32 // _POOL1[1][1],
                 cfg.DATA.CROP_SIZE // 32 // _POOL1[1][2]],
            ],
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dtype=dtype, name="head",
        )(x, train=train)
