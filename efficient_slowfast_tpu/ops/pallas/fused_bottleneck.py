"""Fused residual bottleneck block (eval) — Pallas TPU kernel.

The SlowFast trunk is HBM-bandwidth-bound at eval: each bottleneck block
(reference: slowfast/models/resnet_helper.py:110-240, Tx1x1 -> 1x3x3 ->
1x1x1 with BN+ReLU between and a residual add) makes XLA stream every
intermediate activation through HBM — roughly six tensor passes per block.
This kernel computes the whole block for a group of clips (or an H-strip of
them) per grid step entirely in VMEM: HBM traffic drops to one read of x
plus one write of the output (~3x less), and eval-mode BN is pre-folded
into the conv weights (y = (x-mean)/sqrt(var+eps)*scale+bias is affine, so
W' = W*g, b' = b-mean*g with g = scale/sqrt(var+eps)).

Layout choices (TPU-first):
- the grid batches WHOLE CLIPS, so the temporal taps of the 'a' conv are
  plain in-VMEM shifts along the block's T axis (zero-padded at clip
  edges), and the matmul M dimension is T*rows*W — large enough to amortize
  MXU latency even for the fast pathway's tiny channel counts;
- large images are split into H-strips; the one-row halo the 1x3x3 conv
  needs comes from two extra single-row block views of x with clamped
  index maps (masked at the image border) — overlapping reads without
  manual DMA;
- f32 accumulation on the MXU, bf16 residual add (the unfused XLA path
  adds residuals on the compute dtype too), Cout chunking bounds VMEM.

Supported: stride-1 blocks, dilation 1, groups 1, 'a' temporal kernel in
{1, 3} (the R50-family schedule), optional 1x1x1 projection shortcut.
Anything else stays on the XLA path (the caller decides; see
engine/inference.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold an eval-mode BN affine into the preceding conv.

    kernel: (..., Cin, Cout); BN params are (Cout,). Returns (W', b') with
    W' = W * g, b' = bias - mean * g, g = scale / sqrt(var + eps).
    """
    g = scale * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    return kernel * g, bias - mean * g


def bottleneck_reference(x, t_len, wa, ba, wb, bb, wc, bc, wp=None, bp=None):
    """Pure-jax reference of the fused block (same argument layout).

    x: (N, H, W, Cin) with N = B*t_len; wa: (kt, Cin, Ci); wb: (3, 3, Ci, Ci);
    wc: (Ci, Cout); optional projection wp: (Cin, Cout).
    """
    n, h, w, cin = x.shape
    kt = wa.shape[0]
    xf = x.astype(jnp.float32)
    if kt == 1:
        a = jnp.einsum("nhwc,cd->nhwd", xf, wa[0].astype(jnp.float32))
    else:
        assert kt == 3
        xc = xf.reshape(n // t_len, t_len, h, w, cin)
        xm = jnp.pad(xc, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        a = sum(
            jnp.einsum("bthwc,cd->bthwd", xm[:, dt:dt + t_len],
                       wa[dt].astype(jnp.float32))
            for dt in range(3)
        ).reshape(n, h, w, -1)
    a = jax.nn.relu(a + ba)
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bacc = sum(
        jnp.einsum("nhwc,cd->nhwd", ap[:, dy:dy + h, dx:dx + w],
                   wb[dy, dx].astype(jnp.float32))
        for dy in range(3) for dx in range(3)
    )
    bv = jax.nn.relu(bacc + bb)
    cv = jnp.einsum("nhwc,cd->nhwd", bv, wc.astype(jnp.float32)) + bc
    if wp is not None:
        res = jnp.einsum("nhwc,cd->nhwd", xf, wp.astype(jnp.float32)) + bp
    else:
        res = xf
    return jax.nn.relu(cv + res).astype(x.dtype)


def _apply_a(xblk, g, t_len, kt, wa_ref, ba_ref, dtype):
    """'a' conv on a (g*t_len, R, W, Cin) block → (g*t_len, R, W, Ci) bf16.

    Temporal taps are shifts along the per-clip T axis (zero at clip edges).
    """
    gt, r, w, cin = xblk.shape
    rows = gt * r * w
    a = jnp.dot(xblk.reshape(rows, cin), wa_ref[kt // 2],
                preferred_element_type=jnp.float32)
    if kt == 3:
        xc = xblk.reshape(g, t_len, r, w, cin)
        zero = jnp.zeros((g, 1, r, w, cin), xblk.dtype)
        xm = jnp.concatenate([zero, xc[:, :-1]], axis=1).reshape(rows, cin)
        xp = jnp.concatenate([xc[:, 1:], zero], axis=1).reshape(rows, cin)
        a += jnp.dot(xm, wa_ref[0], preferred_element_type=jnp.float32)
        a += jnp.dot(xp, wa_ref[2], preferred_element_type=jnp.float32)
    a = jnp.maximum(a + ba_ref[0], 0.0)
    return a.astype(dtype).reshape(gt, r, w, -1)


def _kernel(xu_ref, x_ref, xd_ref, wa_ref, ba_ref, wb_ref, bb_ref,
            wc_ref, bc_ref, wp_ref, bp_ref, o_ref, *,
            g: int, t_len: int, kt: int, has_proj: bool, n_strips: int,
            cout_chunk: int):
    gt, r, w, cin = x_ref.shape
    ci = wa_ref.shape[2]
    rows = gt * r * w

    x = x_ref[...]
    # ---- a on the strip and (if tiled) on the two halo rows ---------------
    a = _apply_a(x, g, t_len, kt, wa_ref, ba_ref, x.dtype)
    if n_strips > 1:
        j = pl.program_id(1)
        # mask the OUTPUT at image borders: the unfused path zero-pads the
        # post-ReLU activation, and relu(0 @ W + bias) != 0
        au = jnp.where(
            j > 0,
            _apply_a(xu_ref[...], g, t_len, kt, wa_ref, ba_ref, x.dtype), 0)
        ad = jnp.where(
            j < n_strips - 1,
            _apply_a(xd_ref[...], g, t_len, kt, wa_ref, ba_ref, x.dtype), 0)
    else:
        au = jnp.zeros((gt, 1, w, ci), x.dtype)
        ad = jnp.zeros((gt, 1, w, ci), x.dtype)
    # padded activation: rows halo on H, zero pad on W
    ap = jnp.concatenate([au, a, ad], axis=1)
    ap = jnp.pad(ap, ((0, 0), (0, 0), (1, 1), (0, 0)))

    # ---- b: 1x3x3 conv + ReLU ---------------------------------------------
    bacc = jnp.zeros((rows, ci), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = ap[:, dy:dy + r, dx:dx + w].reshape(rows, ci)
            bacc += jnp.dot(tap, wb_ref[dy * 3 + dx],
                            preferred_element_type=jnp.float32)
    bv = jnp.maximum(bacc + bb_ref[0], 0.0).astype(x.dtype)

    # ---- c: 1x1x1 conv + residual + ReLU (Cout chunked for VMEM) ----------
    cout = o_ref.shape[-1]
    xf = x.reshape(rows, cin)
    for j0 in range(0, cout, cout_chunk):
        cv = jnp.dot(bv, wc_ref[:, j0:j0 + cout_chunk],
                     preferred_element_type=jnp.float32)
        cv = (cv + bc_ref[0, j0:j0 + cout_chunk]).astype(x.dtype)
        if has_proj:
            res = jnp.dot(xf, wp_ref[:, j0:j0 + cout_chunk],
                          preferred_element_type=jnp.float32)
            res = (res + bp_ref[0, j0:j0 + cout_chunk]).astype(x.dtype)
        else:
            res = xf[:, j0:j0 + cout_chunk]
        y = jnp.maximum(cv + res, 0.0)
        o_ref[:, :, :, j0:j0 + cout_chunk] = y.reshape(gt, r, w, -1)


pl = None  # populated lazily so CPU-only imports never pull in pallas

_VMEM_BUDGET = 11 * 1024 * 1024  # Mosaic's scoped limit is 16M; leave slack


def _plan(b, t_len, h, w, cin, ci, cout, itemsize, kt=3, has_proj=False):
    """Pick (clips per step g, strip rows). Returns None if nothing fits.

    Accounts for Mosaic's double-buffered block pipeline: every in/out
    BlockSpec holds two buffers; strip mode adds two single-row halo views.
    """
    def step_bytes(g, rows):
        gt = g * t_len
        strips = rows < h
        m = gt * rows * w
        total = gt * rows * w * cin * itemsize * 2       # x block, 2 buffers
        total += gt * rows * w * cout * itemsize * 2     # out block, 2 buffers
        if strips:
            total += 2 * gt * w * cin * itemsize * 2     # 2 halo row views
        total += gt * (rows + 2) * (w + 2) * ci * itemsize   # padded A
        total += m * ci * 4                               # a/b f32 accum
        cchunk = min(cout, 512)
        total += m * cchunk * 4 * (2 if has_proj else 1)  # c (+proj) f32
        total += m * cchunk * itemsize * 2                # cv/res cast temps
        if kt == 3:
            total += m * cin * itemsize                   # shifted copies
        return total

    for g in (8, 4, 2, 1):
        if b % g:
            continue
        if step_bytes(g, h) <= _VMEM_BUDGET:
            return g, h
    for rows in (32, 16, 8, 4, 2):
        if h % rows:
            continue
        if step_bytes(1, rows) <= _VMEM_BUDGET:
            return 1, rows
    return None


def fused_bottleneck(x, t_len, wa, ba, wb, bb, wc, bc, wp=None, bp=None,
                     *, interpret: bool = False):
    """Fused eval bottleneck. x: (N, H, W, Cin), N = B*t_len.

    wa: (kt, Cin, Ci); wb: (3, 3, Ci, Ci); wc: (Ci, Cout); wp/bp: optional
    (Cin, Cout) stride-1 projection. BN must already be folded (fold_bn).
    Returns (N, H, W, Cout). Raises ValueError when no VMEM plan exists —
    callers fall back to ``bottleneck_reference``.
    """
    global pl
    from jax.experimental import pallas as _pl
    from jax.experimental.pallas import tpu as pltpu

    pl = _pl

    n, h, w, cin = x.shape
    kt, _, ci = wa.shape
    cout = wc.shape[-1]
    assert kt in (1, 3), kt
    assert n % t_len == 0
    b = n // t_len
    has_proj = wp is not None
    cdt = x.dtype

    plan = _plan(b, t_len, h, w, cin, ci, cout, jnp.dtype(cdt).itemsize,
                 kt=kt, has_proj=has_proj)
    if plan is None:
        raise ValueError(f"no VMEM plan for shape {x.shape}")
    g, rows = plan
    n_strips = h // rows
    gt = g * t_len

    wb2 = wb.reshape(9, ci, ci)
    if not has_proj:
        wp = jnp.zeros((1, 1), cdt)  # dummies keep the signature static
        bp = jnp.zeros((1,), jnp.float32)

    strip = lambda i, j: (i, j, 0, 0)
    if n_strips > 1:
        # single-row halo views above/below the strip (clamped at borders,
        # masked to zero in-kernel)
        up = lambda i, j: (i, jnp.maximum(j * rows - 1, 0), 0, 0)
        dn = lambda i, j: (i, jnp.minimum(j * rows + rows, h - 1), 0, 0)
        xu_spec = pl.BlockSpec((gt, 1, w, cin), up, memory_space=pltpu.VMEM)
        xd_spec = pl.BlockSpec((gt, 1, w, cin), dn, memory_space=pltpu.VMEM)
        xu_arg = xd_arg = x
    else:
        xu_spec = xd_spec = pl.BlockSpec(
            (1, 1, 1, 1), lambda i, j: (0, 0, 0, 0), memory_space=pltpu.VMEM)
        xu_arg = xd_arg = jnp.zeros((1, 1, 1, 1), cdt)

    wspec = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    flops = n * h * w * 2 * (cin * ci * kt + 9 * ci * ci + ci * cout
                             + (cin * cout if has_proj else 0))
    bytes_acc = n * h * w * (cin + cout) * jnp.dtype(cdt).itemsize

    cout_chunk = min(cout, 512)
    out = pl.pallas_call(
        functools.partial(_kernel, g=g, t_len=t_len, kt=kt,
                          has_proj=has_proj, n_strips=n_strips,
                          cout_chunk=cout_chunk),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), cdt),
        grid=(b // g, n_strips),
        in_specs=[
            xu_spec,
            pl.BlockSpec((gt, rows, w, cin), strip, memory_space=pltpu.VMEM),
            xd_spec,
            wspec(wa.shape),
            wspec((1, ci)),
            wspec((9, ci, ci)),
            wspec((1, ci)),
            wspec((ci, cout)),
            wspec((1, cout)),
            wspec(wp.shape),
            wspec((1, bp.shape[-1])),
        ],
        out_specs=pl.BlockSpec((gt, rows, w, cout), strip,
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0),
        interpret=interpret,
    )(xu_arg, x, xd_arg,
      wa.astype(cdt), ba.astype(jnp.float32).reshape(1, -1),
      wb2.astype(cdt), bb.astype(jnp.float32).reshape(1, -1),
      wc.astype(cdt), bc.astype(jnp.float32).reshape(1, -1),
      wp.astype(cdt), bp.astype(jnp.float32).reshape(1, -1))
    return out
