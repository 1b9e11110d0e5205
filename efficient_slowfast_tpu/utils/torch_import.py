"""PyTorch tensor → JAX parameter conversions.

Low-level weight-layout mappings shared by the unit tests (torch-parity
goldens) and the checkpoint importer (reference checkpoints are torch
``.pyth`` pickles; reference: slowfast/utils/checkpoint.py:178-287).

Layouts:
- torch Conv3d weight (O, I/g, kT, kH, kW) → flax Conv kernel (kT, kH, kW, I/g, O)
- torch Linear weight (O, I)               → flax Dense kernel (I, O)
- torch BatchNorm {weight, bias, running_mean, running_var}
    → flax BatchNorm {scale, bias} (params) + {mean, var} (batch_stats)
"""

from __future__ import annotations

import numpy as np


def conv3d_weight(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 5
    return np.transpose(w, (2, 3, 4, 1, 0))


def conv1d_weight(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (O, I, k) → flax Conv (k, I, O)."""
    assert w.ndim == 3
    return np.transpose(w, (2, 1, 0))


def linear_weight(w: np.ndarray) -> np.ndarray:
    assert w.ndim == 2
    return np.transpose(w, (1, 0))


def inflate_2d_to_3d(w2d: np.ndarray, time_dim: int) -> np.ndarray:
    """2D→3D weight inflation: replicate over T and divide by T
    (reference: slowfast/utils/checkpoint.py:139-175)."""
    assert w2d.ndim == 4  # (O, I, kH, kW)
    w3d = np.repeat(w2d[:, :, None, :, :], time_dim, axis=2) / float(time_dim)
    return w3d


def bn_params(state: dict, prefix: str) -> dict:
    """Extract one BN layer from a torch state_dict into flax pieces."""
    return {
        "scale": np.asarray(state[prefix + ".weight"]),
        "bias": np.asarray(state[prefix + ".bias"]),
        "mean": np.asarray(state[prefix + ".running_mean"]),
        "var": np.asarray(state[prefix + ".running_var"]),
    }
