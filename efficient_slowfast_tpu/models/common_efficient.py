"""Shared building blocks for the efficient 2D-inflated backbones.

Reference: slowfast/models/{shufflenetv2,shufflenet,mobilenetv2,ghostnet}_helper.py
and head_helper.py (efficient heads). Channels-last throughout.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import Conv3d, Linear
from ..ops.norm import BatchNorm3d
from ..ops.pool import max_pool3d


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Channel shuffle on the trailing channel axis.

    Matches torch's [N, g, C/g, ...] → [N, C/g, g, ...] permute semantics:
    new channel (cp * groups + g) ← old channel (g * C/g + cp)
    (reference: shufflenetv2_helper.py:32-43).
    """
    *lead, c = x.shape
    cpg = c // groups
    x = x.reshape(*lead, groups, cpg)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


def make_divisible(v, divisor, min_value=None):
    """TF-style channel rounding (reference: ghostnet_helper.py:11-24)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


class ConvBNAct(nn.Module):
    """conv → BN → activation with torch-style int padding."""

    features: int
    kernel: Sequence[int] | int
    stride: Sequence[int] | int = (1, 1, 1)
    padding: Sequence[int] | int = (0, 0, 0)
    groups: int = 1
    act: Optional[Callable] = nn.relu
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv3d(self.features, self.kernel, self.stride, self.padding,
                   groups=self.groups, use_bias=False, dtype=self.dtype,
                   name="conv")(x)
        x = self.norm(dtype=self.dtype, name="bn")(x, train=train)
        if self.act is not None:
            x = self.act(x)
        return x


class EfficientStem(nn.Module):
    """Per-pathway 3×3×3/s(1,2,2) conv stem, optional maxpool.

    Covers MobilenetV2_Model_Stem (ReLU6, no pool), ShuffleNetV2/ShuffleNet
    stems (ReLU + maxpool3 s(1,2,2) p1) and GhostNet stem (ReLU, no pool)
    (reference: stem_helper.py:181-336).
    """

    dim_out: Sequence[int]
    with_pool: bool = False
    act_name: str = "relu"  # "relu" | "relu6"
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(x) == len(self.dim_out), (
            f"Input tensor does not contain {len(self.dim_out)} pathways"
        )
        act = nn.relu if self.act_name == "relu" else jax.nn.relu6
        out = []
        for p in range(len(x)):
            y = ConvBNAct(self.dim_out[p], 3, (1, 2, 2), 1, act=act,
                          norm=self.norm, dtype=self.dtype,
                          name=f"pathway{p}_stem")(x[p], train=train)
            if self.with_pool:
                y = max_pool3d(y, 3, (1, 2, 2), 1)
            out.append(y)
        return out


class EfficientBasicHead(nn.Module):
    """Per-pathway optional 1×1×1 conv+BN+act → global avg-pool → concat →
    dropout → linear; eval applies `act_func` then mean over (T,H,W).

    Covers MobileNetV2BasicHead (:436-486, ReLU6 conv), ShuffleNetV2BasicHead
    (:499-557, ReLU conv) and ShuffleNetBasicHead (:562-609, no conv)
    (reference: head_helper.py).
    """

    num_classes: int
    last_channel: Optional[Sequence[int]] = None  # None → no pre-pool conv
    conv_act_name: str = "relu"
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    fc_init_std: float = 0.01
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        act = nn.relu if self.conv_act_name == "relu" else jax.nn.relu6
        pools = []
        for p, x in enumerate(inputs):
            if self.last_channel is not None:
                x = ConvBNAct(self.last_channel[p], 1, act=act, norm=self.norm,
                              dtype=self.dtype,
                              name=f"pathway{p}_conv1x1x1")(x, train=train)
            x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            pools.append(x)
        x = jnp.concatenate(pools, axis=-1)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = Linear(self.num_classes, init_std=self.fc_init_std,
                   dtype=self.dtype, name="projection")(x)
        if not train:
            xf = x.astype(jnp.float32)
            if self.act_func == "softmax":
                xf = nn.softmax(xf, axis=-1)
            elif self.act_func == "sigmoid":
                xf = nn.sigmoid(xf)
            else:
                raise NotImplementedError(self.act_func)
            x = jnp.mean(xf, axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)
