"""Logging utilities (reference: slowfast/utils/logging.py:18-96).

Master-process-only stdout + file logging and one-line JSON stats. On TPU the
"master" is JAX process index 0 (multi-host) — there is no per-device process
fan-out, so suppression only matters for multi-host runs.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import Any, Mapping

_LOGGER_INITIALIZED = False


def _is_master() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def setup_logging(output_dir: str | None = None) -> None:
    """Configure root logger: stdout + optional ``output_dir/stdout.log``."""
    global _LOGGER_INITIALIZED
    if _LOGGER_INITIALIZED:
        return
    _LOGGER_INITIALIZED = True

    logger = logging.getLogger()
    logger.setLevel(logging.INFO if _is_master() else logging.ERROR)
    for h in list(logger.handlers):
        logger.removeHandler(h)

    fmt = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(name)s: %(lineno)4d: %(message)s",
        datefmt="%m/%d %H:%M:%S",
    )
    if _is_master():
        sh = logging.StreamHandler(stream=sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(output_dir, "stdout.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)


def log_json_stats(stats: Mapping[str, Any]) -> None:
    """One-line JSON stats record (reference: logging.py:84-96)."""
    stats = {
        k: (round(float(v), 5) if isinstance(v, float) else v) for k, v in stats.items()
    }
    get_logger(__name__).info("json_stats: %s", json.dumps(stats, sort_keys=True))
