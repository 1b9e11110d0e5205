"""Lateral pathway fusion.

- FuseFastToSlow: the original SlowFast lateral connection (reference:
  slowfast/models/video_model_builder.py:93-150) — strided temporal conv on
  the fast pathway, concat onto slow.
- FuseFastAndSlow: the CMDA bidirectional dual-attention fusion, the paper's
  contribution (reference: slowfast/models/custom_video_model_builder.py:42-148):
  Fast→Slow = temporal max-pool(α) → ECA → BN → ReLU → concat[slow, fuse];
  Slow→Fast = 1×1×1 conv(C→C/β) → SpatialAttention → BN → ReLU → nearest
  temporal upsample(α) → concat[fuse, fast]  (slow-derived channels FIRST).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import ECA, SpatialAttention
from ..ops.conv import Conv3d
from ..ops.norm import BatchNorm3d
from ..ops.pool import temporal_downsample_max, temporal_upsample_nearest


class FuseFastToSlow(nn.Module):
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_s, x_f = x
        dim_in = x_f.shape[-1]
        fuse = Conv3d(
            dim_in * self.fusion_conv_channel_ratio,
            (self.fusion_kernel, 1, 1),
            (self.alpha, 1, 1),
            (self.fusion_kernel // 2, 0, 0),
            use_bias=False,
            dtype=self.dtype,
            name="conv_f2s",
        )(x_f)
        fuse = self.norm(dtype=self.dtype, name="bn")(fuse, train=train)
        fuse = nn.relu(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


class FuseFastAndSlow(nn.Module):
    """CMDA bidirectional fusion with channel + spatial attention."""

    alpha: int
    beta_inv: int
    reduction: int = 1
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x_s, x_f = x
        dim_slow = x_s.shape[-1]

        # Fast → Slow: squeeze time, gate channels.
        f2s = temporal_downsample_max(x_f, self.alpha)
        f2s = ECA(dtype=self.dtype, name="attention_channel_f2s")(f2s)
        f2s = self.norm(dtype=self.dtype, name="bn_f2s")(f2s, train=train)
        f2s = nn.relu(f2s)
        x_s_fuse = jnp.concatenate([x_s, f2s], axis=-1)

        # Slow → Fast: squeeze channels, attend space-time, expand time.
        s2f = Conv3d(dim_slow // self.beta_inv, 1, use_bias=False,
                     dtype=self.dtype, name="downsample_c_of_slow")(x_s)
        s2f = SpatialAttention(reduction=self.reduction, dtype=self.dtype,
                               name="attention_spatial_s2f")(s2f)
        s2f = self.norm(dtype=self.dtype, name="bn_s2f")(s2f, train=train)
        s2f = nn.relu(s2f)
        s2f = temporal_upsample_nearest(s2f, self.alpha)
        x_f_fuse = jnp.concatenate([s2f, x_f], axis=-1)

        return [x_s_fuse, x_f_fuse]
