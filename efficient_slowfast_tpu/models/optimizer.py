"""Optimizer construction (reference: slowfast/models/optimizer.py:11-91).

SGD(momentum/nesterov) or Adam via optax, with the reference's split weight
decay: parameters whose tree path contains "bn" use BN.WEIGHT_DECAY, all
others use SOLVER.WEIGHT_DECAY (reference :26-48; torch-style COUPLED decay —
added to the gradient before the momentum/adam statistics).

The learning rate is injected via ``optax.inject_hyperparams`` so the
per-iteration LR schedule (reference ``optim.set_lr``) becomes a traced
update of ``opt_state.hyperparams['learning_rate']`` inside the jitted step.
"""

from __future__ import annotations

import jax
import optax


def _path_has_bn(path) -> bool:
    return any("bn" in str(getattr(k, "key", k)) for k in path)


def bn_mask(params, want_bn: bool):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _path_has_bn(path) == want_bn, params
    )


def cast_moment_state(inner: optax.GradientTransformation,
                      dtype) -> optax.GradientTransformation:
    """Store a transform's moment buffers in ``dtype`` (TPU.OPTIMIZER_STATE_
    DTYPE=bfloat16 halves optimizer-state HBM). The update math still runs
    in the moments' native f32: state is upcast before ``inner.update`` and
    downcast after, so only STORAGE precision changes — the same recipe as
    bf16 optimizer-state placement in large-model trainers."""
    import jax.numpy as jnp

    def cast(tree, to):
        return jax.tree_util.tree_map(
            lambda x: x.astype(to)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)

    def init(params):
        return cast(inner.init(params), dtype)

    def update(updates, state, params=None):
        updates, new_state = inner.update(
            updates, cast(state, jnp.float32), params)
        return updates, cast(new_state, dtype)

    return optax.GradientTransformation(init, update)


def construct_optimizer(cfg, params) -> tuple[optax.GradientTransformation, optax.OptState]:
    method = cfg.SOLVER.OPTIMIZING_METHOD
    wd = cfg.SOLVER.WEIGHT_DECAY
    bn_wd = cfg.BN.WEIGHT_DECAY
    import jax.numpy as jnp

    moment_dtype = jnp.dtype(cfg.TPU.OPTIMIZER_STATE_DTYPE)

    nonbn = bn_mask(params, want_bn=False)
    isbn = bn_mask(params, want_bn=True)

    def maybe_cast(t):
        if moment_dtype == jnp.float32:
            return t
        return cast_moment_state(t, moment_dtype)

    def make(learning_rate):
        parts = []
        if wd:
            parts.append(optax.masked(optax.add_decayed_weights(wd), nonbn))
        if bn_wd:
            parts.append(optax.masked(optax.add_decayed_weights(bn_wd), isbn))
        if method == "sgd":
            assert cfg.SOLVER.DAMPENING == 0.0, "dampening != 0 unsupported"
            if cfg.SOLVER.MOMENTUM:
                parts.append(maybe_cast(
                    optax.trace(decay=cfg.SOLVER.MOMENTUM,
                                nesterov=cfg.SOLVER.NESTEROV)
                ))
        elif method == "adam":
            parts.append(maybe_cast(
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)))
        else:
            raise NotImplementedError(f"Does not support {method} optimizer")
        parts.append(optax.scale(-1.0))
        parts.append(optax.scale(learning_rate))
        return optax.chain(*parts)

    tx = optax.inject_hyperparams(make)(learning_rate=cfg.SOLVER.BASE_LR)
    return tx, tx.init(params)


def set_lr(opt_state, lr):
    """Return opt_state with the injected learning rate replaced."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
