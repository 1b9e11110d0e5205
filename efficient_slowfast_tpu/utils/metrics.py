"""Accuracy metrics (reference: slowfast/utils/metrics.py:9-66).

Device-friendly: pure jnp, no host sync — accumulate in a metrics pytree and
transfer once per LOG_PERIOD (SURVEY §7 design stance).
"""

from __future__ import annotations

import jax.numpy as jnp


def topks_correct_per_sample(preds: jnp.ndarray, labels: jnp.ndarray, ks) -> list:
    """Per-sample top-k correctness, one float32 (B,) vector per k."""
    max_k = max(ks)
    # top-k indices per row: (B, max_k)
    topk_inds = jnp.argsort(-preds, axis=-1)[:, :max_k]
    correct = topk_inds == labels[:, None]
    return [
        correct[:, :k].any(axis=-1).astype(jnp.float32) for k in ks
    ]


def topks_correct(preds: jnp.ndarray, labels: jnp.ndarray, ks) -> list:
    """Number of top-k-correct predictions for each k."""
    return [c.sum() for c in topks_correct_per_sample(preds, labels, ks)]


def topk_errors(preds, labels, ks):
    num = preds.shape[0]
    return [(1.0 - c / num) * 100.0 for c in topks_correct(preds, labels, ks)]


def topk_accuracies(preds, labels, ks):
    num = preds.shape[0]
    return [(c / num) * 100.0 for c in topks_correct(preds, labels, ks)]
