"""Profiling hooks (SURVEY §5: the reference has no profiler integration;
the TPU equivalent is jax.profiler traces + XLA cost analysis).

Enable with cfg.TPU.PROFILE_DIR (or call these directly): traces open in
xprof/TensorBoard's profile plugin.
"""

from __future__ import annotations

import contextlib
import os

import jax

from .logging import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region for trace timelines (jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_profile(path: str):
    """Dump a device memory profile (pprof format)."""
    with open(path, "wb") as f:
        f.write(jax.profiler.device_memory_profile())
    logger.info("Device memory profile at %s", path)
