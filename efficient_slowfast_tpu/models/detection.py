"""Detection head for AVA (reference: slowfast/models/head_helper.py:11-130).

Per pathway: temporal avg-pool (squeeze T) → ROIAlign (aligned semantics) →
spatial max-pool → channel concat → dropout → linear → activation. Unlike the
classification head, the activation is applied in BOTH train and eval
(reference :126-129; AVA trains with sigmoid + BCE).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import Linear
from ..ops.roi_align import roi_align


class ResNetRoIHead(nn.Module):
    num_classes: int
    pool_size: Sequence[Sequence[int]]       # per-pathway temporal pool kernels
    resolution: Sequence[Sequence[int]]      # per-pathway ROIAlign output sizes
    scale_factor: Sequence[int]              # spatial stride of the trunk
    dropout_rate: float = 0.0
    act_func: str = "sigmoid"
    aligned: bool = True
    fc_init_std: float = 0.01
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, inputs, bboxes, train: bool = False):
        assert len(inputs) == len(self.pool_size), (
            f"Input tensor does not contain {len(self.pool_size)} pathways"
        )
        pool_out = []
        for p, x in enumerate(inputs):
            # temporal average over the full T axis (kernel == T, stride 1)
            assert x.shape[1] == self.pool_size[p][0], (
                f"pathway {p}: T={x.shape[1]} != pool {self.pool_size[p][0]}"
            )
            feat = jnp.mean(x, axis=1)  # (B, H, W, C)
            rois = roi_align(
                feat, bboxes,
                output_size=self.resolution[p][0],
                spatial_scale=1.0 / self.scale_factor[p],
                # adaptive ceil(bin) grid, detectron2 semantics
                # (reference: head_helper.py:75-81 sampling_ratio=0)
                sampling_ratio=0,
                aligned=self.aligned,
            )
            pool_out.append(jnp.max(rois, axis=(1, 2)))  # (R, C)

        x = jnp.concatenate(pool_out, axis=-1)
        if self.dropout_rate > 0.0:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = Linear(self.num_classes, init_std=self.fc_init_std,
                   dtype=self.dtype, name="projection")(x)
        xf = x.astype(jnp.float32)
        if self.act_func == "softmax":
            xf = nn.softmax(xf, axis=-1)
        elif self.act_func == "sigmoid":
            xf = nn.sigmoid(xf)
        else:
            raise NotImplementedError(self.act_func)
        return xf.reshape(xf.shape[0], -1)
