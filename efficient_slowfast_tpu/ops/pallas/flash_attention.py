"""Flash-style attention for the CMDA SpatialAttention module.

The reference materializes the full (T·H·W)² affinity matrix
(reference: slowfast/models/wdf_attention_helper.py:33-54) — at 112² inputs
that is a 3136×3136 float matrix PER CLIP (20 GB at batch 512), the dominant
memory + bandwidth cost of the CMDA models. Head dims here are tiny (C/β ∈
{3..64}), so the op is bandwidth-bound: the fix is never writing the N²
logits to HBM.

Two implementations:

- ``chunked_attention`` — pure-jax online-softmax over key/value blocks via
  lax.scan (O(N·block) memory, differentiable, runs everywhere). Used for
  training and as the CPU/interpret fallback.
- ``flash_attention`` — Pallas TPU kernel: per (batch, q-block) grid cell,
  loop over k blocks with the online-softmax recurrence entirely in VMEM.
  Forward-only; wrapped in ``jax.custom_vjp`` with the chunked version
  providing gradients (attention here is small-d, so recompute is cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def chunked_attention(q, k, v, *, chunk: int = 512):
    """softmax(q kᵀ) v without materializing (N, N).

    q: (B, N, D), k: (B, M, D), v: (B, M, C) → (B, N, C). Softmax over M in
    f32 with the online (streaming) max/sum recurrence over key chunks.
    """
    b, n, d = q.shape
    m = k.shape[1]
    c = v.shape[2]
    chunk = min(chunk, m)
    num_chunks = -(-m // chunk)
    pad = num_chunks * chunk - m
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    kc = k.reshape(b, num_chunks, chunk, d)
    vc = v.reshape(b, num_chunks, chunk, c)
    valid = (jnp.arange(num_chunks * chunk) < m).reshape(num_chunks, chunk)

    qf = q.astype(jnp.float32)

    def body(carry, blk):
        acc, row_max, row_sum = carry
        kb, vb, mask = blk
        logits = jnp.einsum(
            "bnd,bkd->bnk", qf, kb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(mask[None, None, :], logits, _NEG_INF)
        blk_max = jnp.max(logits, axis=-1)
        new_max = jnp.maximum(row_max, blk_max)
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(logits - new_max[..., None])
        new_sum = row_sum * correction + p.sum(axis=-1)
        pv = jnp.einsum("bnk,bkc->bnc", p, vb.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        new_acc = acc * correction[..., None] + pv
        return (new_acc, new_max, new_sum), None

    init = (
        jnp.zeros((b, n, c), jnp.float32),
        jnp.full((b, n), _NEG_INF, jnp.float32),
        jnp.zeros((b, n), jnp.float32),
    )
    (acc, _, row_sum), _ = jax.lax.scan(
        body, init,
        (jnp.moveaxis(kc, 1, 0), jnp.moveaxis(vc, 1, 0), valid),
    )
    out = acc / jnp.maximum(row_sum, 1e-30)[..., None]
    return out.astype(v.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int):
    """One (batch, q-block) cell: stream key blocks with online softmax."""
    q = q_ref[0].astype(jnp.float32)          # (block_q, D)
    m_tot = k_ref.shape[1]
    block_q = q.shape[0]
    c = v_ref.shape[2]

    def body(i, carry):
        acc, row_max, row_sum = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        logits = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
        blk_max = jnp.max(logits, axis=-1)
        new_max = jnp.maximum(row_max, blk_max)
        corr = jnp.exp(row_max - new_max)
        p = jnp.exp(logits - new_max[:, None])
        new_sum = row_sum * corr + p.sum(axis=-1)
        pv = jnp.dot(p, vb, preferred_element_type=jnp.float32)
        return (acc * corr[:, None] + pv, new_max, new_sum)

    init = (
        jnp.zeros((block_q, c), jnp.float32),
        jnp.full((block_q,), _NEG_INF, jnp.float32),
        jnp.zeros((block_q,), jnp.float32),
    )
    acc, _, row_sum = jax.lax.fori_loop(0, m_tot // block_k, body, init)
    o_ref[0] = (acc / jnp.maximum(row_sum, 1e-30)[:, None]).astype(o_ref.dtype)


def _flash_forward(q, k, v, block_q: int = 256, block_k: int = 512):
    from jax.experimental import pallas as _pl

    global pl
    pl = _pl

    b, n, d = q.shape
    m = k.shape[1]
    c = v.shape[2]
    # pad N and M to block multiples
    n_pad = -n % block_q
    m_pad = -m % block_k
    if n_pad:
        q = jnp.pad(q, ((0, 0), (0, n_pad), (0, 0)))
    if m_pad:
        # padded keys get an all -inf contribution via zero v and the fact
        # that exp(logit - max) for duplicate-of-zero keys still sums; to be
        # safe pad keys with a large negative bias channel is not possible —
        # instead pad k with zeros and v with zeros: zero-key logits are 0,
        # which would pollute the softmax, so we pad with -inf via masking
        # in the chunked path. For the Pallas path we require M % block_k == 0
        # after padding with REPEATED last key row and compensate by nothing:
        # simplest correct choice — fall back to chunked when padding needed.
        raise ValueError("flash path requires M % block_k == 0")
    grid = (b, (n + n_pad) // block_q)
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b, n + n_pad, c), v.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, c), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v)
    return out[:, :n]


@jax.custom_vjp
def flash_attention(q, k, v):
    """softmax(q kᵀ) v; Pallas forward on TPU, chunked fallback elsewhere."""
    return _dispatch(q, k, v)


def _pick_block_k(m: int):
    for bk in (512, 448, 392, 384, 256, 224, 196, 128, 112, 64, 56, 32):
        if m % bk == 0:
            return bk
    return None


# Which path the last flash_attention call took ("pallas" | "chunked") —
# diagnostic for tests asserting the Pallas kernel actually ran.
last_path: str = ""

_fallback_logged = False


def _log_fallback(reason: str, exc: Exception | None = None) -> None:
    global _fallback_logged
    if _fallback_logged:
        return
    _fallback_logged = True
    import logging

    logging.getLogger(__name__).warning(
        "flash_attention: Pallas path unavailable (%s)%s; using the chunked "
        "lax.scan fallback for this and subsequent calls this trace.",
        reason, f": {exc!r}" if exc is not None else "",
    )


def _dispatch(q, k, v):
    global last_path
    from ..options import options

    m = k.shape[1]
    if (
        options.flash_attention
        and jax.default_backend() == "tpu"
        and m <= options.flash_max_keys
    ):
        bk = _pick_block_k(m)
        if bk is None:
            _log_fallback(f"no block size divides key count {m}")
        else:
            try:
                out = _flash_forward(q, k, v, block_k=bk)
                last_path = "pallas"
                return out
            except Exception as exc:  # Mosaic/compile regression: degrade loudly
                _log_fallback("Pallas lowering failed", exc)
    last_path = "chunked"
    return chunked_attention(q, k, v)


def _fwd(q, k, v):
    return _dispatch(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(chunked_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
