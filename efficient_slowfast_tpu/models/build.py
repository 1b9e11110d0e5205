"""Model registry + build (reference: slowfast/models/build.py:9-44).

``build_model(cfg)`` returns the flax Module; parameter/state initialization
and device placement are explicit and functional (see engine/state.py) — there
is no DDP wrap; data parallelism is a sharding of the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.registry import Registry

MODEL_REGISTRY = Registry("MODEL")


def get_compute_dtype(cfg):
    name = cfg.TPU.COMPUTE_DTYPE
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def build_model(cfg):
    from ..ops.options import configure

    configure(cfg)  # kernel dispatch (tap-decompose, flash) is cfg-driven
    name = cfg.MODEL.MODEL_NAME
    static = cfg.static() if hasattr(cfg, "static") else cfg
    return MODEL_REGISTRY.get(name)(cfg=static)
