"""Fused Pallas bottleneck kernel vs the pure-jax reference (interpret
mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from efficient_slowfast_tpu.ops.pallas.fused_bottleneck import (
    _plan, bottleneck_reference, fold_bn, fused_bottleneck)


def _mk(B, T, H, Cin, Ci, Cout, kt, proj, seed=0):
    rs = np.random.RandomState(seed)
    n = B * T
    x = jnp.asarray(rs.randn(n, H, H, Cin), jnp.float32)
    args = dict(
        wa=jnp.asarray(rs.randn(kt, Cin, Ci) * 0.1, jnp.float32),
        ba=jnp.asarray(rs.randn(Ci) * 0.1, jnp.float32),
        wb=jnp.asarray(rs.randn(3, 3, Ci, Ci) * 0.1, jnp.float32),
        bb=jnp.asarray(rs.randn(Ci) * 0.1, jnp.float32),
        wc=jnp.asarray(rs.randn(Ci, Cout) * 0.1, jnp.float32),
        bc=jnp.asarray(rs.randn(Cout) * 0.1, jnp.float32),
        wp=jnp.asarray(rs.randn(Cin, Cout) * 0.1, jnp.float32) if proj else None,
        bp=jnp.asarray(rs.randn(Cout) * 0.1, jnp.float32) if proj else None,
    )
    return x, args


@pytest.mark.parametrize("case", [
    # (B, T, H, Cin, Ci, Cout, kt, proj)
    (2, 4, 8, 16, 8, 16, 1, False),       # whole-image, no temporal
    (2, 4, 8, 16, 8, 16, 3, False),       # temporal taps across clip edges
    (2, 4, 8, 16, 8, 16, 3, True),        # projection shortcut
    (1, 4, 64, 256, 64, 256, 1, False),   # H-strip tiling (s2-slow shape)
    (1, 8, 64, 32, 8, 32, 3, False),      # strips + temporal (s2-fast)
    (2, 4, 64, 32, 8, 32, 3, True),       # strips + temporal + projection
])
def test_fused_matches_reference(case):
    B, T, H, Cin, Ci, Cout, kt, proj = case
    x, a = _mk(*case)
    ref = bottleneck_reference(x, T, a["wa"], a["ba"], a["wb"], a["bb"],
                               a["wc"], a["bc"], a["wp"], a["bp"])
    out = fused_bottleneck(x, T, a["wa"], a["ba"], a["wb"], a["bb"],
                           a["wc"], a["bc"], a["wp"], a["bp"],
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=2e-4)


def test_fold_bn_matches_conv_then_bn():
    rs = np.random.RandomState(1)
    k = jnp.asarray(rs.randn(1, 1, 1, 8, 16) * 0.2, jnp.float32)
    scale = jnp.asarray(rs.rand(16) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(16), jnp.float32)
    mean = jnp.asarray(rs.randn(16) * 0.2, jnp.float32)
    var = jnp.asarray(rs.rand(16) + 0.3, jnp.float32)
    x = jnp.asarray(rs.randn(2, 4, 6, 6, 8), jnp.float32)

    y_ref = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    y_ref = (y_ref - mean) / jnp.sqrt(var + 1e-5) * scale + bias

    kf, bf = fold_bn(k, scale, bias, mean, var, 1e-5)
    y = jax.lax.conv_general_dilated(
        x, kf, (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bf
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_plan_respects_budget_and_divisibility():
    # big s2-slow eval shape must tile; tiny shapes take whole clips
    g, rows = _plan(128, 8, 64, 64, 256, 64, 256, 2)
    assert 64 % rows == 0
    g2, rows2 = _plan(2, 4, 8, 8, 16, 8, 16, 4)
    assert rows2 == 8 and 2 % g2 == 0
