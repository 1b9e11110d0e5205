"""Classification heads.

ResNetBasicHead (reference: slowfast/models/head_helper.py:133-265):
per-pathway avg-pool → concat channels → dropout → linear; in eval mode
apply activation (softmax/sigmoid) THEN mean over (T, H, W) — the ordering is
load-bearing for multi-crop test parity (:218-221).

Efficient-backbone heads (MobileNetV2 :436-486, ShuffleNetV2 :499-557,
ShuffleNet :562-609, GhostNet :630-700) live in their model-family modules.
ResNetRoIHead (:11-130) lives in detection.py with the ROIAlign op.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import Linear
from ..ops.pool import avg_pool3d


class ResNetBasicHeadSlowPath(nn.Module):
    """Single-branch prediction option: classify from the SLOW pathway only
    while still consuming both (reference: head_helper.py:269-418,
    ResNetBasicHead_SlowPath)."""

    num_classes: int
    pool_size: Optional[Sequence[Optional[Sequence[int]]]] = None
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    fc_init_std: float = 0.01
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x = inputs[0]  # slow pathway only
        if self.pool_size is None or self.pool_size[0] is None:
            x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        else:
            x = avg_pool3d(x, self.pool_size[0], stride=(1, 1, 1))
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


class ResNetBasicHead(nn.Module):
    num_classes: int
    pool_size: Optional[Sequence[Optional[Sequence[int]]]] = None  # None → global
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    fc_init_std: float = 0.01
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        pools = []
        for p, x in enumerate(inputs):
            if self.pool_size is None or self.pool_size[p] is None:
                x = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
            else:
                x = avg_pool3d(x, self.pool_size[p], stride=(1, 1, 1))
            pools.append(x)
        x = jnp.concatenate(pools, axis=-1)  # (B, T', H', W', sum C)

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
