"""BatchNorm variants for the TPU build.

Reference: slowfast/models/batchnorm_helper.py (get_norm :15-34, SubBatchNorm3d
:37-109, NaiveSyncBatchNorm3d :174-218).

TPU-first note: under pjit/GSPMD the jitted step sees the GLOBAL batch, so a
plain BatchNorm already computes global-batch statistics — what the reference
emulates with NaiveSyncBatchNorm3d's all_gather. Hence:

- "batchnorm"       → plain BN (global stats under pjit; this is what DDP+syncBN
                      approximates, and is statistically strictly better than
                      the reference's per-GPU default).
- "sync_batchnorm"  → same module; NUM_SYNC_DEVICES subgroup sync is expressed
                      via ``axis_name``/``axis_index_groups`` when running under
                      shard_map (per-device SPMD); a no-op difference under pjit.
- "sub_batchnorm"   → SubBatchNorm3d: batch split into NUM_SPLITS groups with
                      independent running stats, aggregated before eval.

Torch momentum m (new = (1-m)*old + m*batch) maps to flax momentum (1-m).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


class BatchNorm3d(nn.Module):
    """BN over (B, T, H, W) reduce axes of a channels-last 5-D tensor."""

    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention
    zero_init_gamma: bool = False
    axis_name: Optional[str] = None
    axis_index_groups: Any = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.epsilon,
            scale_init=(nn.initializers.zeros if self.zero_init_gamma
                        else nn.initializers.ones),
            axis_name=self.axis_name,
            axis_index_groups=self.axis_index_groups,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


class SubBatchNorm3d(nn.Module):
    """Split-batch BN (reference: batchnorm_helper.py:37-109).

    Training: the batch is reshaped into ``num_splits`` groups; each group is
    normalized with its own batch statistics and its own running stats
    (``split_mean``/``split_var``). Eval: uses the aggregated ``mean``/``var``
    (see :func:`aggregate_sub_bn_stats`). Affine scale/bias are shared.
    """

    num_splits: int = 1
    epsilon: float = 1e-5
    momentum: float = 0.1
    zero_init_gamma: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_init_gamma else nn.initializers.ones,
            (c,), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        split_mean = self.variable(
            "batch_stats", "split_mean", lambda: jnp.zeros((self.num_splits, c), jnp.float32)
        )
        split_var = self.variable(
            "batch_stats", "split_var", lambda: jnp.ones((self.num_splits, c), jnp.float32)
        )
        agg_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        agg_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        xf = x.astype(jnp.float32)
        if train:
            b = x.shape[0]
            assert b % self.num_splits == 0, (
                f"batch {b} not divisible by BN.NUM_SPLITS={self.num_splits}"
            )
            xs = xf.reshape((self.num_splits, b // self.num_splits) + x.shape[1:])
            # Per-split batch stats over (batch, T, H, W).
            axes = (1, 2, 3, 4)
            mean = jnp.mean(xs, axis=axes)  # (splits, C)
            var = jnp.mean(jnp.square(xs), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                split_mean.value = (1 - m) * split_mean.value + m * mean
                split_var.value = (1 - m) * split_var.value + m * var
            inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
            y = (xs - mean[:, None, None, None, None, :]) * inv[:, None, None, None, None, :]
            y = y.reshape(x.shape)
        else:
            inv = jnp.reciprocal(jnp.sqrt(agg_var.value + self.epsilon))
            y = (xf - agg_mean.value) * inv
        y = y * scale + bias
        return y.astype(x.dtype)


def aggregate_sub_bn_stats(batch_stats: Any) -> Any:
    """Fold split running stats into the aggregated eval stats.

    Pure-pytree equivalent of the reference's ``aggregate_stats`` walk
    (reference: batchnorm_helper.py:98-109, utils/misc.py:257-272). Applies to
    every subtree that carries {split_mean, split_var, mean, var}.
    """
    import jax

    def fix(tree):
        if isinstance(tree, dict):
            keys = set(tree.keys())
            if {"split_mean", "split_var", "mean", "var"} <= keys:
                sm, sv = tree["split_mean"], tree["split_var"]
                mean = jnp.mean(sm, axis=0)
                var = jnp.mean(sv, axis=0) + jnp.mean(jnp.square(sm - mean), axis=0)
                new = dict(tree)
                new["mean"], new["var"] = mean, var
                return new
            return {k: fix(v) for k, v in tree.items()}
        return tree

    if hasattr(batch_stats, "items") and not isinstance(batch_stats, dict):
        batch_stats = dict(batch_stats)
    return fix(jax.tree_util.tree_map(lambda x: x, batch_stats))


def get_norm(cfg) -> Callable[..., nn.Module]:
    """Norm-module factory from config (reference: batchnorm_helper.py:15-34)."""
    kwargs = dict(
        epsilon=cfg.BN.EPSILON,
        momentum=cfg.BN.MOMENTUM,
    )
    if cfg.BN.NORM_TYPE in ("batchnorm", "sync_batchnorm"):
        return functools.partial(BatchNorm3d, **kwargs)
    if cfg.BN.NORM_TYPE == "sub_batchnorm":
        return functools.partial(SubBatchNorm3d, num_splits=cfg.BN.NUM_SPLITS, **kwargs)
    raise NotImplementedError(f"Norm type {cfg.BN.NORM_TYPE} is not supported")
