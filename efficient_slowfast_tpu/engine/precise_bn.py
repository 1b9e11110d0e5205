"""Precise-BN: recompute BN running stats over N batches.

Reference: fvcore update_bn_stats via tools/train_net.py:277-296 and the
standalone slowfast/utils/bn_helper.py:11-77 — run the train-mode model over
N batches and replace running stats with the PLAIN AVERAGE of the per-batch
statistics.

Functional trick: we never mutate module momentum. One train-mode apply from
frozen stats S gives S' = (1-m)·S + m·B, so the batch statistic is recovered
as B = (S' - (1-m)·S) / m — all on device, jitted once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..parallel.mesh import compile_fence, shard_batch


def calculate_and_update_precise_bn(cfg, state, model, loader, preprocess,
                                    mesh, rng, num_batches: int):
    m = cfg.BN.MOMENTUM

    @jax.jit
    def batch_stats_of(params, stats, inputs, key):
        _, new_state = model.apply(
            {"params": params, "batch_stats": stats},
            inputs, train=True, mutable=["batch_stats"],
            rngs={"dropout": key},
        )
        new = new_state["batch_stats"]
        return jax.tree_util.tree_map(
            lambda s_new, s_old: (s_new - (1.0 - m) * s_old) / m, new, stats
        )

    # train-mode apply reduces batch stats over the global batch — a
    # collective under pjit; fence compile from dispatch for multi-host
    batch_stats_of = compile_fence(batch_stats_of, "precise_bn")

    total = None
    seen = 0
    for i, batch in enumerate(loader):
        if i >= num_batches:
            break
        frames = shard_batch(mesh, batch["frames"])
        widths = shard_batch(mesh, batch["width"])
        portrait = (shard_batch(mesh, batch["portrait"])
                    if "portrait" in batch else None)
        crop_u = (shard_batch(mesh, batch["crop_u"])
                  if "crop_u" in batch else None)
        key = jax.random.fold_in(rng, i)
        inputs = preprocess(key, frames, widths, portrait, crop_u)
        bstats = batch_stats_of(state.params, state.batch_stats, inputs, key)
        total = bstats if total is None else jax.tree_util.tree_map(
            jnp.add, total, bstats
        )
        seen += 1
    if total is None:
        return state
    avg = jax.tree_util.tree_map(lambda x: x / seen, total)
    return state.replace(batch_stats=avg)
