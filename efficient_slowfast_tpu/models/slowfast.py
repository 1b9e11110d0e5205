"""SlowFast and single-pathway ResNet video models.

Reference: slowfast/models/video_model_builder.py — SlowFast (:153-416),
ResNet (:419-611), _TEMPORAL_KERNEL_BASIS (:20-80), _POOL1 (:82-90),
_MODEL_STAGE_DEPTH (:16-17).

Models take a list of channels-last pathway tensors
[slow (B, T/α, H, W, C), fast (B, T, H, W, C)] (or a single tensor list for
single-pathway archs) and return logits (train) or averaged post-activation
scores (eval; see heads.ResNetBasicHead).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from ..ops.norm import get_norm
from ..ops.pool import max_pool3d
from .build import MODEL_REGISTRY, get_compute_dtype
from .fuse import FuseFastToSlow
from .heads import ResNetBasicHead, ResNetBasicHeadSlowPath
from .resnet import ResStage
from .stems import VideoModelStem


def basic_head_cls(cfg):
    """cfg.MODEL.SLOW_PATHWAY_HEAD selects the slow-only prediction head
    (reference: head_helper.py:269-418 ResNetBasicHead_SlowPath)."""
    return ResNetBasicHeadSlowPath if cfg.MODEL.SLOW_PATHWAY_HEAD else ResNetBasicHead

_MODEL_STAGE_DEPTH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                      18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}

_TEMPORAL_KERNEL_BASIS = {
    "c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d_nopool": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "i3d_nopool": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow": [[[1]], [[1]], [[1]], [[3]], [[3]]],
    "slowfast": [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]],
    "fast": [[[5]], [[3]], [[3]], [[3]], [[3]]],
}

_POOL1 = {
    "c2d": [[2, 1, 1]],
    "c2d_nopool": [[1, 1, 1]],
    "i3d": [[2, 1, 1]],
    "i3d_nopool": [[1, 1, 1]],
    "slow": [[1, 1, 1]],
    "slowfast": [[1, 1, 1], [1, 1, 1]],
    "fast": [[1, 1, 1]],
}


def _stage_kwargs(cfg, idx):
    """Shared per-stage config plumbed from the YAML tree."""
    return dict(
        temp_kernel_sizes=_TEMPORAL_KERNEL_BASIS[cfg.MODEL.ARCH][idx + 1],
        stride=cfg.RESNET.SPATIAL_STRIDES[idx],
        num_block_temp_kernel=cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[idx],
        nonlocal_inds=cfg.NONLOCAL.LOCATION[idx],
        nonlocal_group=cfg.NONLOCAL.GROUP[idx],
        nonlocal_pool=cfg.NONLOCAL.POOL[idx],
        instantiation=cfg.NONLOCAL.INSTANTIATION,
        trans_func_name=cfg.RESNET.TRANS_FUNC,
        stride_1x1=cfg.RESNET.STRIDE_1X1,
        dilation=cfg.RESNET.SPATIAL_DILATIONS[idx],
        zero_init_final_bn=cfg.RESNET.ZERO_INIT_FINAL_BN,
    )


def _stage_cls(cfg, stage_idx: int | None = None):
    """ResStage, optionally rematerialized (jax.checkpoint) so stage
    activations are recomputed in backward — fits ~2x train batch.

    ``TPU.REMAT_STAGES`` (e.g. [2, 3]) limits remat to the named stages:
    the early high-resolution stages hold most of the activation memory,
    so rematting only them keeps the batch headroom while skipping the
    backward recompute of s4/s5 (PERF.md round-3 train sweep).
    """
    if cfg.TPU.REMAT:
        sel = list(cfg.TPU.REMAT_STAGES)
        if stage_idx is None or not sel or stage_idx in sel:
            return nn.remat(ResStage, static_argnums=(2,))
    return ResStage


@MODEL_REGISTRY.register()
class SlowFast(nn.Module):
    """Two-pathway SlowFast network (stages s1–s5, fuse after s1–s4)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, bboxes=None, train: bool = False):
        cfg = self.cfg
        dtype = get_compute_dtype(cfg)
        norm = get_norm(cfg)
        def Stage(*a, name, **k):
            return _stage_cls(cfg, int(name[1]))(*a, name=name, **k)
        pool_size = _POOL1[cfg.MODEL.ARCH]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        w = cfg.RESNET.WIDTH_PER_GROUP
        num_groups = cfg.RESNET.NUM_GROUPS
        dim_inner = num_groups * w
        beta = cfg.SLOWFAST.BETA_INV
        temp_kernel = _TEMPORAL_KERNEL_BASIS[cfg.MODEL.ARCH]

        x = VideoModelStem(
            dim_out=[w, w // beta],
            kernel=[temp_kernel[0][0] + [7, 7], temp_kernel[0][1] + [7, 7]],
            stride=[[1, 2, 2]] * 2,
            padding=[[temp_kernel[0][0][0] // 2, 3, 3],
                     [temp_kernel[0][1][0] // 2, 3, 3]],
            norm=norm, dtype=dtype, name="s1",
        )(x, train=train)

        def fuse(name):
            return FuseFastToSlow(
                fusion_conv_channel_ratio=cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
                fusion_kernel=cfg.SLOWFAST.FUSION_KERNEL_SZ,
                alpha=cfg.SLOWFAST.ALPHA,
                norm=norm, dtype=dtype, name=name,
            )

        x = fuse("s1_fuse")(x, train=train)
        x = Stage(
            dim_out=[w * 4, w * 4 // beta],
            dim_inner=[dim_inner, dim_inner // beta],
            num_blocks=[d2] * 2, num_groups=[num_groups] * 2,
            norm=norm, dtype=dtype, name="s2", **_stage_kwargs(cfg, 0),
        )(x, train)
        x = fuse("s2_fuse")(x, train=train)
        x = [max_pool3d(xi, pool_size[p], pool_size[p])
             for p, xi in enumerate(x)]
        x = Stage(
            dim_out=[w * 8, w * 8 // beta],
            dim_inner=[dim_inner * 2, dim_inner * 2 // beta],
            num_blocks=[d3] * 2, num_groups=[num_groups] * 2,
            norm=norm, dtype=dtype, name="s3", **_stage_kwargs(cfg, 1),
        )(x, train)
        x = fuse("s3_fuse")(x, train=train)
        x = Stage(
            dim_out=[w * 16, w * 16 // beta],
            dim_inner=[dim_inner * 4, dim_inner * 4 // beta],
            num_blocks=[d4] * 2, num_groups=[num_groups] * 2,
            norm=norm, dtype=dtype, name="s4", **_stage_kwargs(cfg, 2),
        )(x, train)
        x = fuse("s4_fuse")(x, train=train)
        x = Stage(
            dim_out=[w * 32, w * 32 // beta],
            dim_inner=[dim_inner * 8, dim_inner * 8 // beta],
            num_blocks=[d5] * 2, num_groups=[num_groups] * 2,
            norm=norm, dtype=dtype, name="s5", **_stage_kwargs(cfg, 3),
        )(x, train)

        if cfg.DETECTION.ENABLE:
            from .detection import ResNetRoIHead

            return ResNetRoIHead(
                num_classes=cfg.MODEL.NUM_CLASSES,
                pool_size=[
                    [cfg.DATA.NUM_FRAMES // cfg.SLOWFAST.ALPHA // pool_size[0][0], 1, 1],
                    [cfg.DATA.NUM_FRAMES // pool_size[1][0], 1, 1],
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
                [cfg.DATA.NUM_FRAMES // cfg.SLOWFAST.ALPHA // pool_size[0][0],
                 cfg.DATA.CROP_SIZE // 32 // pool_size[0][1],
                 cfg.DATA.CROP_SIZE // 32 // pool_size[0][2]],
                [cfg.DATA.NUM_FRAMES // pool_size[1][0],
                 cfg.DATA.CROP_SIZE // 32 // pool_size[1][1],
                 cfg.DATA.CROP_SIZE // 32 // pool_size[1][2]],
            ],
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dtype=dtype, name="head",
        )(x, train=train)


@MODEL_REGISTRY.register()
class ResNet(nn.Module):
    """Single-pathway C2D / I3D / Slow / Fast ResNet."""

    cfg: Any

    @nn.compact
    def __call__(self, x, bboxes=None, train: bool = False):
        cfg = self.cfg
        dtype = get_compute_dtype(cfg)
        norm = get_norm(cfg)
        def Stage(*a, name, **k):
            return _stage_cls(cfg, int(name[1]))(*a, name=name, **k)
        pool_size = _POOL1[cfg.MODEL.ARCH]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[cfg.RESNET.DEPTH]
        w = cfg.RESNET.WIDTH_PER_GROUP
        num_groups = cfg.RESNET.NUM_GROUPS
        dim_inner = num_groups * w
        temp_kernel = _TEMPORAL_KERNEL_BASIS[cfg.MODEL.ARCH]

        x = VideoModelStem(
            dim_out=[w],
            kernel=[temp_kernel[0][0] + [7, 7]],
            stride=[[1, 2, 2]],
            padding=[[temp_kernel[0][0][0] // 2, 3, 3]],
            norm=norm, dtype=dtype, name="s1",
        )(x, train=train)
        x = Stage(
            dim_out=[w * 4], dim_inner=[dim_inner],
            num_blocks=[d2], num_groups=[num_groups],
            norm=norm, dtype=dtype, name="s2", **_stage_kwargs(cfg, 0),
        )(x, train)
        x = [max_pool3d(xi, pool_size[p], pool_size[p])
             for p, xi in enumerate(x)]
        x = Stage(
            dim_out=[w * 8], dim_inner=[dim_inner * 2],
            num_blocks=[d3], num_groups=[num_groups],
            norm=norm, dtype=dtype, name="s3", **_stage_kwargs(cfg, 1),
        )(x, train)
        x = Stage(
            dim_out=[w * 16], dim_inner=[dim_inner * 4],
            num_blocks=[d4], num_groups=[num_groups],
            norm=norm, dtype=dtype, name="s4", **_stage_kwargs(cfg, 2),
        )(x, train)
        x = Stage(
            dim_out=[w * 32], dim_inner=[dim_inner * 8],
            num_blocks=[d5], num_groups=[num_groups],
            norm=norm, dtype=dtype, name="s5", **_stage_kwargs(cfg, 3),
        )(x, train)

        if cfg.DETECTION.ENABLE:
            from .detection import ResNetRoIHead

            return ResNetRoIHead(
                num_classes=cfg.MODEL.NUM_CLASSES,
                pool_size=[[cfg.DATA.NUM_FRAMES // pool_size[0][0], 1, 1]],
                resolution=[[cfg.DETECTION.ROI_XFORM_RESOLUTION] * 2],
                scale_factor=[cfg.DETECTION.SPATIAL_SCALE_FACTOR],
                dropout_rate=cfg.MODEL.DROPOUT_RATE,
                act_func=cfg.MODEL.HEAD_ACT,
                aligned=cfg.DETECTION.ALIGNED,
                fc_init_std=cfg.MODEL.FC_INIT_STD,
                dtype=dtype, name="head",
            )(x, bboxes, train=train)

        return basic_head_cls(cfg)(
            num_classes=cfg.MODEL.NUM_CLASSES,
            pool_size=None if cfg.MULTIGRID.SHORT_CYCLE else [
                [cfg.DATA.NUM_FRAMES // pool_size[0][0],
                 cfg.DATA.CROP_SIZE // 32 // pool_size[0][1],
                 cfg.DATA.CROP_SIZE // 32 // pool_size[0][2]],
            ],
            dropout_rate=cfg.MODEL.DROPOUT_RATE,
            act_func=cfg.MODEL.HEAD_ACT,
            fc_init_std=cfg.MODEL.FC_INIT_STD,
            dtype=dtype, name="head",
        )(x, train=train)
