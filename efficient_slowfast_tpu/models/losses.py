"""Loss functions (reference: slowfast/models/losses.py:12-28).

Functional: (logits, labels) → scalar mean loss. ``bce``/``bce_logit`` take
multi-hot float labels (Charades-style multi-label).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    if labels.ndim == logits.ndim:  # soft labels
        return optax.softmax_cross_entropy(logits, labels).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def bce(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Binary cross-entropy on probabilities (torch nn.BCELoss)."""
    eps = 1e-7
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p)).mean()


def bce_logit(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


_LOSSES = {
    "cross_entropy": cross_entropy,
    "bce": bce,
    "bce_logit": bce_logit,
}


def get_loss_func(name: str):
    if name not in _LOSSES:
        raise NotImplementedError(f"Loss {name} is not supported")
    return _LOSSES[name]
