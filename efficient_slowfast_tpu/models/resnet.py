"""3-D ResNet stages for SlowFast trunks.

Reference: slowfast/models/resnet_helper.py (BasicTransform :25-107,
BottleneckTransform :110-240, ResBlock :243-358, ResStage :361-561).

TPU-first notes: channels-last tensors, convs via lax.conv_general_dilated
(MXU), per-pathway block lists are plain Python (static) loops — fully
unrolled under jit into one fused XLA program.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import Conv3d
from ..ops.norm import BatchNorm3d
from .nonlocal_block import Nonlocal


class BasicTransform(nn.Module):
    """Tx3x3 → BN → ReLU → 1x3x3 → BN (final BN may be zero-init)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: Optional[int] = None  # unused, parity with bottleneck signature
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        tk = self.temp_kernel_size
        x = Conv3d(self.dim_out, (tk, 3, 3), (1, self.stride, self.stride),
                   (tk // 2, 1, 1), use_bias=False, dtype=self.dtype, name="a")(x)
        x = self.norm(dtype=self.dtype, name="a_bn")(x, train=train)
        x = nn.relu(x)
        x = Conv3d(self.dim_out, (1, 3, 3), (1, 1, 1), (0, 1, 1),
                   use_bias=False, dtype=self.dtype, name="b")(x)
        x = self.norm(zero_init_gamma=self.zero_init_final_bn, dtype=self.dtype,
                      name="b_bn")(x, train=train)
        return x


class BottleneckTransform(nn.Module):
    """Tx1x1 → 1x3x3 (stride, groups, dilation) → 1x1x1, BN+ReLU between."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int = 64
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        str1, str3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        tk = self.temp_kernel_size
        x = Conv3d(self.dim_inner, (tk, 1, 1), (1, str1, str1), (tk // 2, 0, 0),
                   use_bias=False, dtype=self.dtype, name="a")(x)
        x = self.norm(dtype=self.dtype, name="a_bn")(x, train=train)
        x = nn.relu(x)
        x = Conv3d(self.dim_inner, (1, 3, 3), (1, str3, str3),
                   (0, self.dilation, self.dilation), groups=self.num_groups,
                   dilation=(1, self.dilation, self.dilation),
                   use_bias=False, dtype=self.dtype, name="b")(x)
        x = self.norm(dtype=self.dtype, name="b_bn")(x, train=train)
        x = nn.relu(x)
        x = Conv3d(self.dim_out, (1, 1, 1), use_bias=False, dtype=self.dtype,
                   name="c")(x)
        x = self.norm(zero_init_gamma=self.zero_init_final_bn, dtype=self.dtype,
                      name="c_bn")(x, train=train)
        return x


_TRANS_FUNCS = {
    "basic_transform": BasicTransform,
    "bottleneck_transform": BottleneckTransform,
}


def get_trans_func(name: str):
    assert name in _TRANS_FUNCS, f"Transformation function '{name}' not supported"
    return _TRANS_FUNCS[name]


class ResBlock(nn.Module):
    """Residual block with projection shortcut on dim/stride change."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    trans_func_name: str = "bottleneck_transform"
    dim_inner: int = 64
    num_groups: int = 1
    stride_1x1: bool = False
    dilation: int = 1
    zero_init_final_bn: bool = False
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dim_in = x.shape[-1]
        trans = get_trans_func(self.trans_func_name)(
            dim_out=self.dim_out,
            temp_kernel_size=self.temp_kernel_size,
            stride=self.stride,
            dim_inner=self.dim_inner,
            num_groups=self.num_groups,
            stride_1x1=self.stride_1x1,
            dilation=self.dilation,
            zero_init_final_bn=self.zero_init_final_bn,
            norm=self.norm,
            dtype=self.dtype,
            name="branch2",
        )
        if dim_in != self.dim_out or self.stride != 1:
            sc = Conv3d(self.dim_out, 1, (1, self.stride, self.stride), 0,
                        use_bias=False, dtype=self.dtype, name="branch1")(x)
            sc = self.norm(dtype=self.dtype, name="branch1_bn")(sc, train=train)
        else:
            sc = x
        return nn.relu(sc + trans(x, train=train))


class ResStage(nn.Module):
    """Multi-pathway stage of residual blocks with optional non-local insertion.

    Per-block temporal kernel schedule: first ``num_block_temp_kernel`` blocks
    use the pathway's temporal kernel, the rest use 1
    (reference: resnet_helper.py:443-447).
    """

    dim_out: Sequence[int]
    dim_inner: Sequence[int]
    temp_kernel_sizes: Sequence[Sequence[int]]
    stride: Sequence[int]
    num_blocks: Sequence[int]
    num_groups: Sequence[int]
    num_block_temp_kernel: Sequence[int]
    nonlocal_inds: Sequence[Sequence[int]]
    nonlocal_group: Sequence[int]
    nonlocal_pool: Sequence[Sequence[int]]
    instantiation: str = "dot_product"
    trans_func_name: str = "bottleneck_transform"
    stride_1x1: bool = False
    dilation: Sequence[int] = (1, 1)
    zero_init_final_bn: bool = False
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        num_pathways = len(self.num_blocks)
        assert len(inputs) == num_pathways
        outputs = []
        for p in range(num_pathways):
            tks = (
                (list(self.temp_kernel_sizes[p]) * self.num_blocks[p])[
                    : self.num_block_temp_kernel[p]
                ]
                + [1] * (self.num_blocks[p] - self.num_block_temp_kernel[p])
            )
            x = inputs[p]
            for i in range(self.num_blocks[p]):
                x = ResBlock(
                    dim_out=self.dim_out[p],
                    temp_kernel_size=tks[i],
                    stride=self.stride[p] if i == 0 else 1,
                    trans_func_name=self.trans_func_name,
                    dim_inner=self.dim_inner[p],
                    num_groups=self.num_groups[p],
                    stride_1x1=self.stride_1x1,
                    dilation=self.dilation[p],
                    zero_init_final_bn=self.zero_init_final_bn,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"pathway{p}_res{i}",
                )(x, train=train)
                if i in self.nonlocal_inds[p]:
                    nln = Nonlocal(
                        dim_inner=self.dim_out[p] // 2,
                        pool_size=self.nonlocal_pool[p],
                        instantiation=self.instantiation,
                        norm=self.norm,
                        dtype=self.dtype,
                        name=f"pathway{p}_nonlocal{i}",
                    )
                    g = self.nonlocal_group[p]
                    if g > 1:
                        # Fold temporal groups into batch (reference :541-558).
                        b, t, h, w, c = x.shape
                        x = x.reshape(b * g, t // g, h, w, c)
                        x = nln(x, train=train)
                        x = x.reshape(b, t, h, w, c)
                    else:
                        x = nln(x, train=train)
            outputs.append(x)
        return outputs
