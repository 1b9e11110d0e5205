"""Flash/chunked attention numerics (the CMDA SpatialAttention hot path)."""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_slowfast_tpu.ops.pallas.flash_attention import (
    chunked_attention, flash_attention, _pick_block_k,
)


def dense(q, k, v):
    logits = jnp.einsum("bnd,bkd->bnk", q, k)
    return jnp.einsum("bnk,bkc->bnc", jax.nn.softmax(logits, -1), v)


def rand_qkv(n=700, d=8, c=16, b=2):
    rs = np.random.RandomState(0)
    return (jnp.asarray(rs.randn(b, n, d), jnp.float32),
            jnp.asarray(rs.randn(b, n, d), jnp.float32),
            jnp.asarray(rs.randn(b, n, c), jnp.float32))


def test_chunked_matches_dense():
    q, k, v = rand_qkv()
    ref = dense(q, k, v)
    out = chunked_attention(q, k, v, chunk=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_chunked_uneven_chunk_and_small():
    q, k, v = rand_qkv(n=130)
    ref = dense(q, k, v)
    out = chunked_attention(q, k, v, chunk=64)  # 130 = 2*64 + 2 (padding path)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_flash_attention_gradients_match_dense():
    q, k, v = rand_qkv(n=260)
    for argnum in range(3):
        g1 = jax.grad(lambda *a: flash_attention(*a).sum(), argnums=argnum)(q, k, v)
        g2 = jax.grad(lambda *a: dense(*a).sum(), argnums=argnum)(q, k, v)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-3, atol=1e-4)


def test_pick_block_k():
    assert _pick_block_k(3136) == 448   # 112² input token count
    assert _pick_block_k(4096) == 512
    assert _pick_block_k(196) == 196    # 56²/4 tokens
    assert _pick_block_k(7919) is None  # prime → chunked fallback


def test_spatial_attention_uses_flash_for_large_n(rng):
    """SpatialAttention output must be identical whichever path runs."""
    from efficient_slowfast_tpu.ops.attention import SpatialAttention

    rs = np.random.RandomState(1)
    # (B=1, T=4, H=18, W=18, C=8) → N=1296 > 1024 → flash path
    x = jnp.asarray(rs.randn(1, 4, 18, 18, 8), jnp.float32)
    m = SpatialAttention(reduction=1)
    v = m.init(rng, x)
    out = m.apply(v, x)
    # reference dense computation with the same params
    params = v["params"]

    def conv(p, x):
        kern = params[p]["conv"]["kernel"]
        bias = params[p]["conv"]["bias"]
        y = jax.lax.conv_general_dilated(
            x, kern, (1, 1, 1), [(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision="highest")
        return y + bias
    q = conv("query", x).reshape(1, -1, 8)
    k = conv("key", x).reshape(1, -1, 8)
    vv = conv("value", x).reshape(1, -1, 8)
    ref = dense(q, k, vv).reshape(x.shape)
    gamma = params["gamma"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(gamma * ref + x),
                               rtol=1e-4, atol=1e-5)
