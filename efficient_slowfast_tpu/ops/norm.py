"""BatchNorm variants for the TPU build.

Reference: slowfast/models/batchnorm_helper.py (get_norm :15-34, SubBatchNorm3d
:37-109, NaiveSyncBatchNorm3d :174-218).

TPU-first note: under pjit/GSPMD the jitted step sees the GLOBAL batch, so a
plain BatchNorm already computes global-batch statistics — what the reference
emulates with NaiveSyncBatchNorm3d's all_gather. Hence:

- "batchnorm"       → plain BN (global stats under pjit; this is what DDP+syncBN
                      approximates, and is statistically strictly better than
                      the reference's per-GPU default).
- "sync_batchnorm"  → SyncBatchNorm3d when BN.NUM_SYNC_DEVICES names a proper
                      device subgroup: batch statistics over contiguous row
                      groups of (per-device batch × NUM_SYNC_DEVICES) samples —
                      exactly the reference's GroupGather granularity, since
                      shard_batch lays the global batch out as contiguous
                      per-device blocks in mesh order. Plain BN when the
                      subgroup spans all devices (0 or ≥ mesh size: group ==
                      global batch).
- "sub_batchnorm"   → SubBatchNorm3d: batch split into NUM_SPLITS groups with
                      independent running stats, aggregated before eval.

Torch momentum m (new = (1-m)*old + m*batch) maps to flax momentum (1-m).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
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
            # flax's fast variance is E[x²]−E[x]², which cancels to negative
            # in float32 when |mean| >> std and NaNs the rsqrt; torch BN
            # (the parity target) computes the stable two-pass form.
            use_fast_variance=False,
            name="bn",
        )(x)


class SubBatchNorm3d(nn.Module):
    """Split-batch BN (reference: batchnorm_helper.py:37-109).

    Training: the batch is reshaped into ``num_splits`` groups; each group is
    normalized with its own batch statistics and its own running stats
    (``split_mean``/``split_var``). Eval: uses the aggregated ``mean``/``var``
    (see :func:`aggregate_sub_bn_stats`). Affine scale/bias are shared.

    The params/stats live under a child scope named ``bn`` so the pytree
    layout matches :class:`BatchNorm3d` (whose inner ``nn.BatchNorm`` is also
    named ``bn``): a multigrid BN-type switch (utils/multigrid.py auto-switch,
    reference tools/train_net.py:410-432) then carries params and optimizer
    state across unchanged — only ``batch_stats`` gain/lose the ``split_*``
    entries (see :func:`normal_to_sub_bn` / :func:`sub_to_normal_bn`).
    """

    num_splits: int = 1
    epsilon: float = 1e-5
    momentum: float = 0.1
    zero_init_gamma: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return _SubBN3dInner(
            num_splits=self.num_splits,
            epsilon=self.epsilon,
            momentum=self.momentum,
            zero_init_gamma=self.zero_init_gamma,
            name="bn",
        )(x, train)


class _SubBN3dInner(nn.Module):
    """Implementation body of SubBatchNorm3d (scoped under ``bn``)."""

    num_splits: int = 1
    epsilon: float = 1e-5
    momentum: float = 0.1
    zero_init_gamma: bool = False

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
            # Per-split batch stats over (batch, T, H, W). Two-pass variance,
            # NOT E[x²]−E[x]²: the one-pass form cancels catastrophically in
            # float32 when |mean| >> std and the negative result NaNs the
            # rsqrt (observed: data-dependent NaN losses in sub-BN training;
            # torch's native BN uses Welford so the reference never hits it).
            axes = (1, 2, 3, 4)
            mean = jnp.mean(xs, axis=axes)  # (splits, C)
            var = jnp.mean(
                jnp.square(xs - mean[:, None, None, None, None, :]), axis=axes
            )
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


class SyncBatchNorm3d(nn.Module):
    """Group-limited sync-BN (reference: batchnorm_helper.py:174-218).

    The reference's ``NaiveSyncBatchNorm3d`` all-gathers (mean, mean²) over
    ``NUM_SYNC_DEVICES``-sized device subgroups and normalizes each device's
    batch with its subgroup's statistics. Under the single-program SPMD step
    the global batch is laid out as contiguous per-device row blocks
    (parallel/mesh.py::shard_batch), so a device subgroup's combined batch is
    a contiguous row group: the same statistics fall out of a reshape to
    ``(num_groups, B/num_groups, ...)`` with per-group moments — no explicit
    collective needed; GSPMD inserts the partial reductions.

    Running stats: the reference updates each device's buffers with its own
    subgroup's stats and checkpoints the master's. A single shared state tree
    can't hold per-group buffers, so the running stats are updated with the
    across-group aggregate (mean of group means; law-of-total-variance var) —
    expectation-equal to the master's buffers and a strictly lower-variance
    estimator (deliberate deviation, same spirit as sub-BN aggregation).

    Stats live as ``bn/{mean,var}`` and params as ``bn/{scale,bias}`` — the
    exact pytree layout of :class:`BatchNorm3d` — so a multigrid BN-type
    auto-switch (batchnorm ↔ sync_batchnorm) rebuilds the module tree and
    carries the whole train state across unchanged.
    """

    num_groups: int = 1
    epsilon: float = 1e-5
    momentum: float = 0.1
    zero_init_gamma: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return _SyncBN3dInner(
            num_groups=self.num_groups,
            epsilon=self.epsilon,
            momentum=self.momentum,
            zero_init_gamma=self.zero_init_gamma,
            name="bn",
        )(x, train)


class _SyncBN3dInner(nn.Module):
    """Implementation body of SyncBatchNorm3d (scoped under ``bn``)."""

    num_groups: int = 1
    epsilon: float = 1e-5
    momentum: float = 0.1
    zero_init_gamma: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param(
            "scale",
            nn.initializers.zeros if self.zero_init_gamma else nn.initializers.ones,
            (c,), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        xf = x.astype(jnp.float32)
        if train:
            b = x.shape[0]
            assert b % self.num_groups == 0, (
                f"batch {b} not divisible by sync-BN num_groups="
                f"{self.num_groups}"
            )
            xs = xf.reshape((self.num_groups, b // self.num_groups) + x.shape[1:])
            # Two-pass variance, not the reference's meansqr−mean² (which
            # cancels catastrophically in float32 — see _SubBN3dInner).
            axes = (1, 2, 3, 4)
            mean = jnp.mean(xs, axis=axes)  # (groups, C)
            var = jnp.mean(
                jnp.square(xs - mean[:, None, None, None, None, :]), axis=axes
            )
            if not self.is_initializing():
                m = self.momentum
                agg_mean = jnp.mean(mean, axis=0)
                agg_var = jnp.mean(var, axis=0) + jnp.mean(
                    jnp.square(mean - agg_mean), axis=0
                )
                ra_mean.value = (1 - m) * ra_mean.value + m * agg_mean
                ra_var.value = (1 - m) * ra_var.value + m * agg_var
            inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
            y = (xs - mean[:, None, None, None, None, :]) * inv[:, None, None, None, None, :]
            y = y.reshape(x.shape)
        else:
            inv = jnp.reciprocal(jnp.sqrt(ra_var.value + self.epsilon))
            y = (xf - ra_mean.value) * inv
        y = y * scale + bias
        return y.astype(x.dtype)


def aggregate_sub_bn_stats(batch_stats: Any) -> Any:
    """Fold split running stats into the aggregated eval stats.

    Pure-pytree equivalent of the reference's ``aggregate_stats`` walk
    (reference: batchnorm_helper.py:98-109, utils/misc.py:257-272). Applies to
    every subtree that carries {split_mean, split_var, mean, var}.

    Runs as ONE jitted program: the stats may be sharded over the mesh
    (split dim over "data"), so each leaf op carries a collective — many
    concurrent eager multi-device dispatches can interleave their
    rendezvous and deadlock (seen on the CPU backend); a single compiled
    program also costs one dispatch instead of ~2 per BN layer. The jitted
    walkers are module-level so repeat calls (every sub-BN epoch; per-node
    from adapt_bn_stats_to) hit the jit cache instead of recompiling.
    """
    return _aggregate_fix(_as_plain_dict(batch_stats))


def _aggregate_walk(tree):
    if isinstance(tree, dict):
        keys = set(tree.keys())
        if {"split_mean", "split_var", "mean", "var"} <= keys:
            sm, sv = tree["split_mean"], tree["split_var"]
            mean = jnp.mean(sm, axis=0)
            var = jnp.mean(sv, axis=0) + jnp.mean(jnp.square(sm - mean), axis=0)
            new = dict(tree)
            new["mean"], new["var"] = mean, var
            return new
        return {k: _aggregate_walk(v) for k, v in tree.items()}
    return tree


_aggregate_fix = jax.jit(_aggregate_walk)


def _as_plain_dict(tree):
    import jax

    if hasattr(tree, "items") and not isinstance(tree, dict):
        tree = dict(tree)
    return jax.tree_util.tree_map(lambda x: x, tree)


def normal_to_sub_bn(batch_stats: Any, num_splits: int) -> Any:
    """Rewrite plain-BN running stats into sub-BN stats (split tiles).

    Pytree counterpart of the reference's checkpoint rewrite
    (reference: slowfast/utils/checkpoint.py:290-389, ``normal_to_sub_bn``):
    every BN stats leaf-dict {mean, var} gains ``split_mean``/``split_var``
    tiles replicated from the running stats, so each split starts from the
    aggregated statistics — exactly what the reference does when it reloads a
    normal-BN checkpoint into a sub-BN trainer at a multigrid phase boundary.
    Existing split stats with a different leading dim are re-tiled from the
    aggregate (NUM_SPLITS changed between two sub-BN phases).
    """
    # one jitted program — see aggregate_sub_bn_stats on why not eager
    return _normal_to_sub_fix(_as_plain_dict(batch_stats), num_splits)


def _normal_to_sub_walk(tree, num_splits):
    if isinstance(tree, dict):
        keys = set(tree.keys())
        if {"mean", "var"} <= keys:
            mean, var = tree["mean"], tree["var"]
            sm, sv = tree.get("split_mean"), tree.get("split_var")
            if sm is None or sm.shape[0] != num_splits:
                sm = jnp.tile(mean[None], (num_splits, 1))
                sv = jnp.tile(var[None], (num_splits, 1))
            new = dict(tree)
            new["split_mean"], new["split_var"] = sm, sv
            return new
        return {k: _normal_to_sub_walk(v, num_splits) for k, v in tree.items()}
    return tree


_normal_to_sub_fix = jax.jit(_normal_to_sub_walk, static_argnums=1)


def sub_to_normal_bn(batch_stats: Any) -> Any:
    """Rewrite sub-BN stats into plain-BN stats (aggregate, drop splits).

    Pytree counterpart of the reference's ``sub_to_normal_bn``
    (reference: slowfast/utils/checkpoint.py:290-330): the aggregated
    ``mean``/``var`` (union statistics over the splits) become the plain BN
    running stats and the ``split_*`` entries are dropped, so a sub-BN phase
    hands correct running statistics to the following normal/sync-BN phase.
    """
    # one jitted program — see aggregate_sub_bn_stats on why not eager
    return _sub_to_normal_fix(_as_plain_dict(batch_stats))


def _sub_to_normal_walk(tree):
    if isinstance(tree, dict):
        keys = set(tree.keys())
        if {"split_mean", "split_var", "mean", "var"} <= keys:
            sm, sv = tree["split_mean"], tree["split_var"]
            mean = jnp.mean(sm, axis=0)
            var = jnp.mean(sv, axis=0) + jnp.mean(
                jnp.square(sm - mean), axis=0
            )
            new = {k: v for k, v in tree.items()
                   if k not in ("split_mean", "split_var")}
            new["mean"], new["var"] = mean, var
            return new
        return {k: _sub_to_normal_walk(v) for k, v in tree.items()}
    return tree


_sub_to_normal_fix = jax.jit(_sub_to_normal_walk)


def adapt_bn_stats_to(target: Any, stats: Any) -> Any:
    """Reshape a restored batch_stats payload into the target tree's BN form.

    Checkpoints may be saved in one BN form (plain vs sub) and restored into
    a model built in the other — e.g. auto-resume into a different multigrid
    long-cycle phase. Mirrors the reference's load-time rewrites
    (slowfast/utils/checkpoint.py:290-389 sub_to_normal_bn/normal_to_sub_bn):
    where the target expects ``split_*`` and the payload has none, the splits
    are tiled from the running stats; where the target has none and the
    payload does, the splits are aggregated away. Walks both trees in
    parallel so per-node split counts come from the target's shapes.
    """

    def fix(tgt, src):
        if not isinstance(tgt, dict) or not isinstance(src, dict):
            return src
        tkeys, skeys = set(tgt.keys()), set(src.keys())
        tgt_sub = {"split_mean", "split_var"} <= tkeys
        src_sub = {"split_mean", "split_var"} <= skeys
        if {"mean", "var"} <= skeys and tgt_sub and not src_sub:
            return normal_to_sub_bn(src, int(tgt["split_mean"].shape[0]))
        if src_sub and {"mean", "var"} <= tkeys and not tgt_sub:
            return sub_to_normal_bn(src)
        if tgt_sub and src_sub and (
            src["split_mean"].shape[0] != tgt["split_mean"].shape[0]
        ):
            return normal_to_sub_bn(sub_to_normal_bn(src),
                                    int(tgt["split_mean"].shape[0]))
        return {k: (fix(tgt[k], v) if k in tgt else v) for k, v in src.items()}

    return fix(_as_plain_dict(target), _as_plain_dict(stats))


def convert_bn_stats(batch_stats: Any, old_type: str, new_type: str,
                     num_splits: int) -> Any:
    """Convert batch_stats across a BN-type change (no-op when compatible).

    The multigrid engine calls this at a long-cycle phase boundary whose
    auto-switch changed ``BN.NORM_TYPE`` (reference rebuilds the whole
    trainer + checkpoint round-trip, tools/train_net.py:410-432; here the
    params tree is layout-identical so only the stats move).
    """
    old_sub = old_type == "sub_batchnorm"
    new_sub = new_type == "sub_batchnorm"
    if new_sub:
        return normal_to_sub_bn(batch_stats, num_splits)
    if old_sub and not new_sub:
        return sub_to_normal_bn(batch_stats)
    return batch_stats


def effective_num_splits(cfg) -> int:
    """Global split count for SubBatchNorm3d under pjit.

    ``cfg.BN.NUM_SPLITS`` keeps the reference's per-device meaning
    (reference batchnorm_helper.py:37-60: each GPU splits its LOCAL batch
    into NUM_SPLITS groups, giving BN groups of BN_BASE_SIZE samples). The
    jitted step sees the GLOBAL batch, so the module's split count is
    NUM_SPLITS × data-axis size: the reshape keeps every split inside one
    device's batch shard (stats stay device-local, no collective) and the
    BN group size stays BN_BASE_SIZE — the reference's exact statistical
    granularity.
    """
    from ..parallel.mesh import mesh_device_count

    return max(1, int(cfg.BN.NUM_SPLITS)) * mesh_device_count(cfg)


def effective_sync_groups(cfg) -> int:
    """Stat-group count for sync-BN under pjit.

    Reference semantics (batchnorm_helper.py:174-192): statistics are
    synchronized over ``BN.NUM_SYNC_DEVICES``-sized device subgroups;
    0 (or a subgroup spanning the whole mesh) means one global group.
    The global batch is contiguous per-device blocks in mesh order, so
    ``num_groups = mesh_devices / NUM_SYNC_DEVICES`` row groups reproduce
    the reference's per-subgroup statistics exactly.
    """
    from ..parallel.mesh import mesh_device_count

    n = mesh_device_count(cfg)
    sync = int(cfg.BN.NUM_SYNC_DEVICES)
    if sync <= 0 or sync >= n:
        return 1
    if n % sync != 0:
        raise ValueError(
            f"BN.NUM_SYNC_DEVICES={sync} does not divide the data-axis "
            f"size {n} (reference asserts local_size % num_sync == 0, "
            f"batchnorm_helper.py:184-188)")
    return n // sync


def get_norm(cfg) -> Callable[..., nn.Module]:
    """Norm-module factory from config (reference: batchnorm_helper.py:15-34)."""
    kwargs = dict(
        epsilon=cfg.BN.EPSILON,
        momentum=cfg.BN.MOMENTUM,
    )
    if cfg.BN.NORM_TYPE == "batchnorm":
        return functools.partial(BatchNorm3d, **kwargs)
    if cfg.BN.NORM_TYPE == "sync_batchnorm":
        groups = effective_sync_groups(cfg)
        if groups == 1:
            # subgroup spans the mesh: group batch == global batch, which
            # plain BN under pjit already computes
            return functools.partial(BatchNorm3d, **kwargs)
        return functools.partial(SyncBatchNorm3d, num_groups=groups, **kwargs)
    if cfg.BN.NORM_TYPE == "sub_batchnorm":
        return functools.partial(
            SubBatchNorm3d, num_splits=effective_num_splits(cfg), **kwargs
        )
    raise NotImplementedError(f"Norm type {cfg.BN.NORM_TYPE} is not supported")
