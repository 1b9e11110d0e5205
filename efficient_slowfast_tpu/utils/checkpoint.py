"""Checkpointing (reference: slowfast/utils/checkpoint.py).

Two native backends, selected by ``cfg.TPU.CHECKPOINT_BACKEND``:

- ``msgpack`` (default): single flax.serialization file
  ``OUTPUT_DIR/checkpoints/checkpoint_epoch_{epoch:05d}.jaxckpt`` holding
  {epoch, params, batch_stats, opt_state}; master-process-only save,
  newest-file resume (reference :57-70, :107-136, :430-455).
- ``orbax``: async sharded directories
  ``checkpoint_epoch_{epoch:05d}.orbax`` written through
  ``orbax.checkpoint.AsyncCheckpointer`` — every host participates (each
  writes its own array shards), the save overlaps the next training epoch,
  and restore is zero-copy into the existing state sharding. This is the
  TPU-native production path for multi-host/large-model jobs.

Load auto-detects the format from the path, so mixed histories resume
fine. PyTorch ``.pyth``/Caffe2 import lives in utils/torch_ckpt.py.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import flax.serialization
import jax

from .logging import get_logger

logger = get_logger(__name__)

_CKPT_RE = re.compile(r"checkpoint_epoch_(\d+)\.(jaxckpt|orbax)$")

_async_checkpointer = None


def _orbax():
    """Process-wide AsyncCheckpointer (lazy; orbax import is heavy)."""
    global _async_checkpointer
    if _async_checkpointer is None:
        import orbax.checkpoint as ocp

        _async_checkpointer = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler()
        )
    return _async_checkpointer


def wait_for_saves() -> None:
    """Block until any in-flight async (orbax) save completes. Call before
    process exit and before reading a just-written checkpoint."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def make_checkpoint_dir(path_to_job: str) -> str:
    d = get_checkpoint_dir(path_to_job)
    if jax.process_index() == 0:
        os.makedirs(d, exist_ok=True)
    return d


def get_checkpoint_dir(path_to_job: str) -> str:
    return os.path.join(path_to_job, "checkpoints")


def get_path_to_checkpoint(path_to_job: str, epoch: int,
                           backend: str = "msgpack") -> str:
    suffix = "orbax" if backend == "orbax" else "jaxckpt"
    return os.path.join(
        get_checkpoint_dir(path_to_job),
        f"checkpoint_epoch_{epoch:05d}.{suffix}"
    )


def get_last_checkpoint(path_to_job: str) -> Optional[str]:
    d = get_checkpoint_dir(path_to_job)
    if not os.path.isdir(d):
        return None
    names = sorted(n for n in os.listdir(d) if _CKPT_RE.search(n))
    return os.path.join(d, names[-1]) if names else None


def has_checkpoint(path_to_job: str) -> bool:
    return get_last_checkpoint(path_to_job) is not None


def is_checkpoint_epoch(cfg, cur_epoch: int, multigrid_schedule=None) -> bool:
    """Checkpoint cadence, multigrid-aware (reference: :84-104)."""
    if multigrid_schedule is not None:
        prev_epoch = 0
        for s in multigrid_schedule:
            if cur_epoch < s[-1]:
                period = max(
                    (s[-1] - prev_epoch) // cfg.MULTIGRID.EVAL_FREQ + 1, 1
                )
                return (s[-1] - 1 - cur_epoch) % period == 0
            prev_epoch = s[-1]
    return (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0


def save_checkpoint(path_to_job: str, state, epoch: int, cfg) -> Optional[str]:
    """Save the full train state (reference: :107-136).

    msgpack backend: master-only single file. orbax backend: collective
    async save — EVERY process must call this (each host contributes its
    array shards); returns the path on all hosts.
    """
    backend = getattr(getattr(cfg, "TPU", None), "CHECKPOINT_BACKEND",
                      "msgpack")
    if backend == "orbax":
        return _save_orbax(path_to_job, state, epoch, cfg)
    if jax.process_index() != 0:
        return None
    make_checkpoint_dir(path_to_job)
    payload = {
        "epoch": epoch,
        "params": flax.serialization.to_state_dict(jax.device_get(state.params)),
        "batch_stats": flax.serialization.to_state_dict(
            jax.device_get(state.batch_stats)
        ),
        "opt_state": flax.serialization.to_state_dict(
            jax.device_get(state.opt_state)
        ),
        "cfg": cfg.dump() if hasattr(cfg, "dump") else "",
    }
    path = get_path_to_checkpoint(path_to_job, epoch + 1)
    with open(path, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(payload))
    logger.info("Saved checkpoint to %s", path)
    return path


def _save_orbax(path_to_job: str, state, epoch: int, cfg) -> str:
    make_checkpoint_dir(path_to_job)
    path = get_path_to_checkpoint(path_to_job, epoch + 1, backend="orbax")
    ckptr = _orbax()
    ckptr.wait_until_finished()  # at most one save in flight
    payload = {
        "epoch": epoch,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": flax.serialization.to_state_dict(state.opt_state),
    }
    ckptr.save(os.path.abspath(path), payload, force=True)
    if jax.process_index() == 0 and hasattr(cfg, "dump"):
        with open(os.path.join(get_checkpoint_dir(path_to_job),
                               f"cfg_epoch_{epoch + 1:05d}.yaml"), "w") as f:
            f.write(cfg.dump())
    logger.info("Async-saving orbax checkpoint to %s", path)
    return path


def _load_orbax(path: str, state, load_opt: bool) -> Tuple[Any, int]:
    import orbax.checkpoint as ocp

    wait_for_saves()
    target = {
        "epoch": 0,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": flax.serialization.to_state_dict(state.opt_state),
    }
    with ocp.StandardCheckpointer() as ckptr:
        try:
            # fast path: zero-copy restore straight into the state's
            # dtypes/shardings (requires matching trees)
            payload = ckptr.restore(os.path.abspath(path), target)
        except Exception as fast_err:
            # optimizer/solver changed between runs (legal, like the
            # msgpack path): raw-restore and merge tolerantly. Log the
            # fast-path error first — if the raw restore ALSO fails (real
            # corruption / orbax API break) the root cause isn't masked by
            # the secondary merge error.
            logger.info(
                "orbax fast-path restore failed (%s: %s); falling back to "
                "raw restore + tolerant merge",
                type(fast_err).__name__, fast_err)
            payload = ckptr.restore(os.path.abspath(path))
            payload = dict(payload)
            payload["params"] = flax.serialization.from_state_dict(
                state.params, payload["params"])
            from ..ops.norm import adapt_bn_stats_to

            payload["batch_stats"] = flax.serialization.from_state_dict(
                state.batch_stats,
                adapt_bn_stats_to(state.batch_stats, payload["batch_stats"]))
    # Orbax restores committed jax.Arrays pinned to this process's local
    # device(s); under multi-process SPMD those clash with the global-mesh
    # arguments of the next jitted program ("incompatible devices", found
    # by tests/test_multihost.py orbax e2e). Hand back HOST arrays like the
    # msgpack path does — shard_state / jit placement then replicates them
    # onto the global mesh exactly as for a fresh init.
    import numpy as np

    payload = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, payload)
    new = state.replace(params=payload["params"],
                        batch_stats=payload["batch_stats"])
    if load_opt:
        try:
            opt_state = flax.serialization.from_state_dict(
                state.opt_state, payload["opt_state"])
            new = new.replace(opt_state=opt_state)
        except Exception as e:  # optimizer change between runs is legal
            logger.warning("Could not restore optimizer state: %s", e)
    epoch = int(payload.get("epoch", -1))
    logger.info("Loaded orbax checkpoint %s (epoch %d)", path, epoch)
    return new, epoch


def load_checkpoint(path: str, state, load_opt: bool = True) -> Tuple[Any, int]:
    """Restore a TrainState from ``path`` (format auto-detected);
    returns (state, epoch)."""
    if path.endswith(".orbax") or os.path.isdir(path):
        return _load_orbax(path, state, load_opt)
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    params = flax.serialization.from_state_dict(state.params, payload["params"])
    from ..ops.norm import adapt_bn_stats_to

    batch_stats = flax.serialization.from_state_dict(
        state.batch_stats,
        adapt_bn_stats_to(state.batch_stats, payload["batch_stats"]),
    )
    new = state.replace(params=params, batch_stats=batch_stats)
    if load_opt and "opt_state" in payload:
        try:
            opt_state = flax.serialization.from_state_dict(
                state.opt_state, payload["opt_state"]
            )
            new = new.replace(opt_state=opt_state)
        except Exception as e:  # optimizer change between runs is legal
            logger.warning("Could not restore optimizer state: %s", e)
    epoch = int(payload.get("epoch", -1))
    logger.info("Loaded checkpoint %s (epoch %d)", path, epoch)
    return new, epoch


def load_train_checkpoint(cfg, state) -> Tuple[Any, int]:
    """Auto-resume policy (reference: :430-455). Returns (state, start_epoch)."""
    if cfg.TRAIN.AUTO_RESUME and has_checkpoint(cfg.OUTPUT_DIR):
        path = get_last_checkpoint(cfg.OUTPUT_DIR)
        state, epoch = load_checkpoint(path, state)
        return state, epoch + 1
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        state = _load_external(cfg, cfg.TRAIN.CHECKPOINT_FILE_PATH,
                               cfg.TRAIN.CHECKPOINT_TYPE, state,
                               inflate=cfg.TRAIN.CHECKPOINT_INFLATE)
        return state, 0
    return state, 0


def load_test_checkpoint(cfg, state):
    """Test-time checkpoint selection (reference: :392-427)."""
    if cfg.TEST.CHECKPOINT_FILE_PATH:
        return _load_external(cfg, cfg.TEST.CHECKPOINT_FILE_PATH,
                              cfg.TEST.CHECKPOINT_TYPE, state)
    if has_checkpoint(cfg.OUTPUT_DIR):
        state, _ = load_checkpoint(get_last_checkpoint(cfg.OUTPUT_DIR), state,
                                   load_opt=False)
        return state
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        return _load_external(cfg, cfg.TRAIN.CHECKPOINT_FILE_PATH,
                              cfg.TRAIN.CHECKPOINT_TYPE, state)
    logger.info("Testing with random initialization. Only for debugging.")
    return state


def _load_external(cfg, path, ckpt_type, state, inflate=False):
    if (ckpt_type == "jax" or path.endswith(".jaxckpt")
            or path.endswith(".orbax") or os.path.isdir(path)):
        # native formats auto-detect (module docstring contract) — a
        # directory is never a torch/caffe2 pickle
        state, _ = load_checkpoint(path, state, load_opt=False)
        return state
    from .torch_ckpt import load_torch_checkpoint

    params, batch_stats = load_torch_checkpoint(
        cfg, path, state.params, state.batch_stats,
        caffe2=(ckpt_type == "caffe2"), inflate=inflate,
    )
    return state.replace(params=params, batch_stats=batch_stats)
