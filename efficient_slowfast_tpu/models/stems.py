"""Input stems (reference: slowfast/models/stem_helper.py).

ResNetBasicStem (:102-178): conv(kT,7,7)/s(1,2,2) → BN → ReLU →
maxpool(1,3,3)/s(1,2,2)/p(0,1,1). VideoModelStem (:9-99) applies a per-pathway
stem. Efficient-backbone stems (MobileNetV2 :181-232, ShuffleNetV2 :236-270,
ShuffleNet :273-306, GhostNet :309-336) live with their model families.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import Conv3d
from ..ops.norm import BatchNorm3d
from ..ops.pool import max_pool3d


class ResNetBasicStem(nn.Module):
    dim_out: int
    kernel: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Conv3d(self.dim_out, self.kernel, self.stride, self.padding,
                   use_bias=False, dtype=self.dtype, name="conv")(x)
        x = self.norm(dtype=self.dtype, name="bn")(x, train=train)
        x = nn.relu(x)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        return x


class VideoModelStem(nn.Module):
    """Per-pathway ResNetBasicStem over the list of pathway tensors."""

    dim_out: Sequence[int]
    kernel: Sequence[Sequence[int]]
    stride: Sequence[Sequence[int]]
    padding: Sequence[Sequence[int]]
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert len(x) == len(self.dim_out), (
            f"Input tensor does not contain {len(self.dim_out)} pathways"
        )
        return [
            ResNetBasicStem(
                dim_out=self.dim_out[p],
                kernel=self.kernel[p],
                stride=self.stride[p],
                padding=self.padding[p],
                norm=self.norm,
                dtype=self.dtype,
                name=f"pathway{p}_stem",
            )(x[p], train=train)
            for p in range(len(x))
        ]
