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


def bce_elementwise(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Unreduced :func:`bce` — same values, no mean (for masked reductions)."""
    eps = 1e-7
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -(labels * jnp.log(p) + (1.0 - labels) * jnp.log1p(-p))


_LOSSES = {
    "cross_entropy": cross_entropy,
    "bce": bce,
    "bce_logit": bce_logit,
}

# Unreduced variants for per-sample masking (detection's padded-box mean).
# "bce_logit" is deliberately absent: the RoI head applies MODEL.HEAD_ACT in
# train AND eval (reference head_helper.py:126-129), so detection preds are
# already probabilities — a with-logits loss would silently compute
# sigmoid(sigmoid(x)) with vanishing gradients. Configs asking for it raise
# at build time instead.
_ELEMENTWISE_LOSSES = {
    "bce": bce_elementwise,
}


def get_loss_func(name: str):
    if name not in _LOSSES:
        raise NotImplementedError(f"Loss {name} is not supported")
    return _LOSSES[name]


def get_elementwise_loss_func(name: str):
    """Loss as (preds, labels) → per-element values (no reduction).

    Used where a padding mask must weight the reduction (detection train
    step). Only the multi-label losses make sense there; anything else is a
    config error and raises (reference trains AVA with ``bce``,
    tools/train_net.py + losses.py:12-28).
    """
    if name not in _ELEMENTWISE_LOSSES:
        raise NotImplementedError(
            f"Loss {name} is not supported for masked per-box training "
            f"(detection); use one of {sorted(_ELEMENTWISE_LOSSES)}"
        )
    return _ELEMENTWISE_LOSSES[name]
