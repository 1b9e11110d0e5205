"""Misc utilities (reference: slowfast/utils/misc.py).

``launch_job`` (reference :275-303) needs no process spawn on TPU — the SPMD
program is single-process per host; multi-host init happens via
jax.distributed (parallel.mesh.init_distributed).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import numpy as np

from ..parallel.mesh import init_distributed
from .logging import get_logger

logger = get_logger(__name__)


def launch_job(cfg, init_method: str, func: Callable, daemon=False):
    """Run `func(cfg)` with multi-host setup if NUM_SHARDS > 1."""
    if init_method and "INIT_METHOD" not in cfg:
        cfg["INIT_METHOD"] = init_method
    init_distributed(cfg)
    return func(cfg)


def params_count(params: Any) -> int:
    """reference: misc.py:36-42."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def check_nan_losses(loss: float):
    if math.isnan(loss):
        raise RuntimeError("ERROR: Got NaN losses")


def get_flop_stats(model, cfg, example_inputs, train: bool = False) -> float:
    """FLOPs from XLA cost analysis (replaces fvcore flop_count,
    reference: misc.py:109-150)."""
    import functools

    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        {"params": rng, "dropout": rng}, example_inputs,
    )
    lowered = jax.jit(fwd).lower(variables, example_inputs)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", 0.0)) if cost else 0.0


def get_activation_stats(model, cfg, example_inputs, train: bool = False,
                         ) -> float:
    """Activation count: total elements produced by conv/matmul ops in one
    forward (the fvcore ActivationCountAnalysis definition the reference
    logs, misc.py:109-150 "Activations"). Counted from the traced jaxpr —
    no compile, and the count is the compiled program's truth rather than
    a per-module estimate. Control flow: scan bodies are multiplied by the
    trip count, cond counts its largest branch (upper bound), while_loop
    counts one body iteration (lower bound; trip count is data-dependent).
    """
    import functools

    def fwd(variables, x):
        return model.apply(variables, x, train=train)

    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        functools.partial(model.init, train=False),
        {"params": rng, "dropout": rng}, example_inputs,
    )
    jaxpr = jax.make_jaxpr(fwd)(variables, example_inputs)

    counted = ("conv_general_dilated", "dot_general")

    def count(jpr) -> int:
        total = 0
        for eqn in jpr.eqns:
            name = eqn.primitive.name
            if name in counted:
                total += sum(int(np.prod(v.aval.shape)) for v in eqn.outvars)
            elif name == "scan":
                # the body executes `length` times in the compiled program
                # (e.g. the chunked-attention fallback, ops/options.py)
                total += int(eqn.params["length"]) * count(
                    eqn.params["jaxpr"].jaxpr)
            elif name == "cond":
                # exactly one branch executes; count the largest (an upper
                # bound, matching fvcore's static-analysis spirit)
                total += max((count(b.jaxpr)
                              for b in eqn.params["branches"]), default=0)
            elif name == "while":
                # trip count is data-dependent: count one body+cond
                # iteration (a documented lower bound)
                total += count(eqn.params["body_jaxpr"].jaxpr)
                total += count(eqn.params["cond_jaxpr"].jaxpr)
            else:
                # pjit/remat/custom_vjp/etc. carry inner jaxprs in params
                for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                    inner = eqn.params.get(key)
                    if inner is not None:
                        total += count(getattr(inner, "jaxpr", inner))
        return total

    return float(count(jaxpr.jaxpr))


def flops_per_layer_table(model, example_inputs, train: bool = False) -> str:
    """Per-module params/FLOPs breakdown as a rendered table string.

    flax ``nn.tabulate(compute_flops=True)`` is the TPU-native stand-in for
    the reference's ptflops per-layer stat dump
    (reference: misc.py:153-162 log_model_flops_per_layer) — per-module
    forward FLOPs come from XLA cost analysis of each submodule, so the
    numbers are the compiled truth rather than an op-count model. The
    table's per-module input/output shape columns also serve the role of
    the reference heads' printed shape traces (head_helper.py:225-265
    forward_debug).
    """
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    tab = nn.tabulate(
        model, {"params": rng, "dropout": rng},
        compute_flops=True,
        console_kwargs={"width": 160, "force_terminal": False},
    )
    return tab(example_inputs, train=train)


def gpu_mem_usage() -> float:
    """Per-device live HBM bytes → GB (TPU equivalent of cuda mem stats)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 1024 ** 3
    except Exception:
        return 0.0


def cpu_mem_usage():
    try:
        import psutil

        vram = psutil.virtual_memory()
        return (vram.total - vram.available) / 1024 ** 3, vram.total / 1024 ** 3
    except Exception:
        return 0.0, 0.0


def log_model_info(model, cfg, state, example_inputs):
    """Params + FLOPs + memory (reference: misc.py:165-190)."""
    logger.info("Model:\n%s", type(model).__name__)
    logger.info("Params: %s", f"{params_count(state.params):,}")
    logger.info("Mem: %.2f GB", gpu_mem_usage())
    try:
        flops = get_flop_stats(model, cfg, example_inputs)
        logger.info("Flops: %.2f G", flops / 1e9)
    except Exception as e:
        logger.warning("Flop analysis unavailable: %s", e)
    try:
        acts = get_activation_stats(model, cfg, example_inputs)
        logger.info("Activations: %.2f M", acts / 1e6)
    except Exception as e:
        logger.warning("Activation analysis unavailable: %s", e)
    if cfg.TPU.LOG_FLOPS_PER_LAYER:
        try:
            logger.info("\n%s", flops_per_layer_table(model, example_inputs))
        except Exception as e:
            logger.warning("Per-layer flop table unavailable: %s", e)


def frozen_bn_stats_tree(batch_stats):
    """Return batch_stats marked for no-update use (identity; the functional
    train step only updates stats it is asked to — freezing = not threading
    the new stats back, so this is a documentation helper)."""
    return batch_stats


def get_class_names(path, parent_path=None, subset_path=None):
    """reference: misc.py:306-375 (json {name: id} → ordered list)."""
    import json

    with open(path, "r") as f:
        class2idx = json.load(f)
    max_i = max(class2idx.values())
    names = [None] * (max_i + 1)
    for k, i in class2idx.items():
        names[i] = k
    parent, subset = None, None
    if parent_path:
        with open(parent_path, "r") as f:
            parent = json.load(f)
    if subset_path:
        with open(subset_path, "r") as f:
            subset = [line.strip() for line in f]
    return names, parent, subset


def load_demo_labels(path):
    """Class-id → name list for DEMO.LABEL_FILE_PATH.

    Accepts both label formats the reference demo ships and reads
    (tools/demo_net.py:141-150): an ``id,name`` CSV (Kinetics/Jester —
    names taken in ROW order, matching the reference's
    ``pd.read_csv(...)["name"].values``; the id column is ignored, so
    Jester's 1-based ids still map class k to row k) and a plain
    name-per-line file (AVA ``.names``).
    """
    with open(path) as f:
        lines = [line.rstrip("\n") for line in f if line.strip()]
    if not lines:
        return []
    header = [c.strip().lower() for c in lines[0].split(",")]
    if "name" in header and len(header) > 1:
        col = header.index("name")
        return [line.split(",", len(header) - 1)[col].strip()
                for line in lines[1:]]
    return [line.strip() for line in lines]
