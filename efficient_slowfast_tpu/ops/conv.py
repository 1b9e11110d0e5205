"""3-D convolution wrappers, channels-last (B, T, H, W, C).

TPU-first: channels-last keeps C on the 128-lane axis so XLA tiles convs onto
the MXU; all kernels are ``lax.conv_general_dilated`` with ('NDHWC','DHWIO',
'NDHWC') dimension numbers via ``flax.linen.Conv``. Padding is always explicit
(symmetric ints) to match the reference's torch Conv3d semantics
(reference: slowfast/models/resnet_helper.py conv constructions).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# He/MSRA fan-out init == fvcore c2_msra_fill used by the reference
# (reference: slowfast/models/weight_init_helper.py:10-43).
msra_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
msra_init_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def conv_precision(dtype):
    """Matmul/conv precision policy: exact fp32 accumulation for parity runs
    (dtype None/float32), default (fast MXU bf16) for bfloat16 compute."""
    if dtype == jnp.bfloat16:
        return None
    return "highest"


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


class _TapDecomposedConv(nn.Module):
    """Full 3-D conv computed as a sum of per-temporal-tap 2-D convs.

    Exact rewrite: conv3d(x, w) = Σ_dt conv2d(shift_t(x, dt), w[dt]).
    On TPU this is ~2x faster than the direct 3-D conv for low-channel-count
    stems (e.g. the fast pathway's 5×7×7, C_in=3 stem) because each tap runs
    as a well-tiled spatial conv with T folded into the batch. Parameter
    names/shapes are identical to flax nn.Conv so checkpoints interchange.
    """

    features: int
    kernel_size: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    use_bias: bool
    dtype: jnp.dtype | None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", msra_init_normal, (kt, kh, kw, cin, self.features),
            jnp.float32,
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        dt_ = self.dtype or x.dtype
        xb = x.astype(dt_)
        kb = kernel.astype(dt_)
        b, t, h, w, _ = x.shape
        xp = jnp.pad(xb, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
        t_out = (t + 2 * pt - kt) // st + 1
        out = None
        prec = conv_precision(self.dtype)
        for tap in range(kt):
            xt = jax.lax.slice_in_dim(xp, tap, tap + (t_out - 1) * st + 1, st,
                                      axis=1)
            y = jax.lax.conv_general_dilated(
                xt.reshape(b * t_out, h, w, cin), kb[tap], (sh, sw),
                [(ph, ph), (pw, pw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=prec,
            )
            out = y if out is None else out + y
        out = out.reshape(b, t_out, out.shape[1], out.shape[2], self.features)
        if bias is not None:
            out = out + bias.astype(dt_)
        return out


import functools


@functools.lru_cache(maxsize=None)
def _stem_d2s_index(kt: int, cin: int, co: int):
    """Static index map rewriting a (kt,7,7,cin,co) stride-2 stem kernel as
    a (kt,4,4,16*cin,16*co) kernel over space-to-depth(4) inputs with the
    4x4 output-pixel block packed into channels (depth-to-space(4) after).

    Derivation: out[4P+r,4Q+q] = Σ_{u,v} W[u,v]·X[8P+2r+u-3, 8Q+2q+v-3];
    with X4[S,(a,·)] = X[4S+a] and conv stride 2 taps k∈{0..3} (asymmetric
    pad (1,2): block offsets k-1 ∈ [-1,2] — the r=3 outputs reach into the
    second block to the right), u = 4(k-1)+a-2r+3 — each (k,a,r) hits at
    most one valid u. Taps falling outside [0,7) get a zero weight, which
    also reproduces the original pad-3 zero extension exactly.
    """
    import numpy as np

    flat_size = kt * 7 * 7 * cin * co
    idx = np.full((kt, 4, 4, 16 * cin, 16 * co), flat_size, np.int32)  # →0
    for k in range(4):
        for L in range(4):
            for a in range(4):
                for b_ in range(4):
                    for r in range(4):
                        for q in range(4):
                            u = 4 * (k - 1) + a - 2 * r + 3
                            v = 4 * (L - 1) + b_ - 2 * q + 3
                            if not (0 <= u < 7 and 0 <= v < 7):
                                continue
                            for dt in range(kt):
                                for ci in range(cin):
                                    src = (((dt * 7 + u) * 7 + v) * cin
                                           + ci) * co
                                    cin_new = (a * 4 + b_) * cin + ci
                                    co_new0 = (r * 4 + q) * co
                                    idx[dt, k, L, cin_new,
                                        co_new0:co_new0 + co] = (
                                        src + np.arange(co))
    return jnp.asarray(idx)


class _S2DStemConv(nn.Module):
    """Stride-2 7x7 stem conv via space-to-depth(4) + depth-to-space(4).

    Packs the 4x4 output-pixel block into the conv's output channels
    (16*C_out), turning the MXU-hostile tiny-C_out stem (N=8 → 6% lane
    use) into an N=16*C_out matmul — measured 1.5x faster than the direct
    3-D conv for the fast-pathway stem on v5e. Exact rewrite; parameter
    names/shapes identical to flax nn.Conv so checkpoints interchange.
    Requires stride (1,2,2), spatial kernel 7, padding (kt//2,3,3), and
    H, W divisible by 8.
    """

    features: int
    kernel_size: Sequence[int]
    use_bias: bool
    dtype: jnp.dtype | None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt = self.kernel_size[0]
        cin = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel", msra_init_normal, (kt, 7, 7, cin, co), jnp.float32,
        )
        bias = (self.param("bias", nn.initializers.zeros, (co,),
                           jnp.float32) if self.use_bias else None)
        dt_ = self.dtype or x.dtype
        idx = _stem_d2s_index(kt, cin, co)
        wflat = jnp.concatenate(
            [kernel.reshape(-1), jnp.zeros((1,), kernel.dtype)])
        wd = wflat[idx].astype(dt_)

        b, t, h, w, _ = x.shape
        y = x.astype(dt_).reshape(b, t, h // 4, 4, w // 4, 4, cin)
        y = y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, t, h // 4, w // 4, 16 * cin)
        y = jax.lax.conv_general_dilated(
            y, wd, (1, 2, 2), [(kt // 2, kt // 2), (1, 2), (1, 2)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=conv_precision(self.dtype),
        )
        y = y.reshape(b, t, h // 8, w // 8, 4, 4, co)
        y = y.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, t, h // 2, w // 2, co)
        if bias is not None:
            y = y + bias.astype(dt_)
        return y


class _Int8Conv1x1(nn.Module):
    """Pointwise conv served as an int8×int8→int32 matmul (TPU.INT8_EVAL).

    Design intent: the int8 MXU path can beat the bf16 matmul at the
    model's 1×1-conv shapes AND halve the activation bytes both ways IF
    XLA fuses the quantize into the producer's epilogue — which requires a
    STATIC activation scale, not a dynamic maxabs (that would add a full
    extra read pass). Whether the fusion and the speedup actually
    materialize is an empirical question settled by `bench.py --mode int8`
    + the hlo_stats capture (PERF.md round 4). Scales live in the ``quant``
    collection: running the model with ``mutable=["quant"]`` is the
    calibration pass (records the running max|x| per layer); afterwards the
    frozen scales serve. Weights quantize per-output-channel from the fp32
    kernel in-graph (the kernel is tiny; XLA folds it). Parameter name and
    shape are identical to the plain conv so checkpoints interchange.

    Serving with an uncalibrated (zero) scale would silently zero the
    activations — engine code must check ``quant_is_calibrated`` before
    jitting an INT8_EVAL forward.
    """

    features: int
    stride: Tuple[int, int, int]
    use_bias: bool
    dtype: jnp.dtype | None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel", msra_init_normal, (1, 1, 1, cin, co), jnp.float32
        )
        bias = (self.param("bias", nn.initializers.zeros, (co,), jnp.float32)
                if self.use_bias else None)
        act_max = self.variable("quant", "act_max",
                                lambda: jnp.zeros((), jnp.float32))
        st, sh, sw = self.stride
        xs = x[:, ::st, ::sh, ::sw]  # strided 1x1x1 == slice + matmul
        calibrating = self.is_mutable_collection("quant")
        if calibrating or self.is_initializing():
            if not self.is_initializing():
                act_max.value = jnp.maximum(
                    act_max.value,
                    jnp.max(jnp.abs(xs)).astype(jnp.float32))
            dt_ = self.dtype or x.dtype
            y = jnp.einsum(
                "bthwc,co->bthwo", xs.astype(dt_),
                kernel[0, 0, 0].astype(dt_),
                precision=conv_precision(self.dtype),
            )
        else:
            s_act = act_max.value / 127.0
            w_max = jnp.maximum(jnp.max(jnp.abs(kernel[0, 0, 0]), axis=0),
                                1e-12)
            s_w = w_max / 127.0
            wq = jnp.clip(jnp.round(kernel[0, 0, 0] / s_w), -127, 127
                          ).astype(jnp.int8)
            xq = jnp.clip(jnp.round(xs / s_act), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (s_act * s_w)
            y = y.astype(self.dtype or x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class _Int8ConvSpatial(nn.Module):
    """Spatial (k>1) conv served as an int8×int8→int32 conv
    (TPU.INT8_SPATIAL, requires TPU.INT8_EVAL).

    Extends the pointwise int8 path (:class:`_Int8Conv1x1`) to the
    spatial convs where the slow pathway's HBM stream lives (PERF.md:
    s2–s5 3×3s run at 550–660 GiB/s, bandwidth-bound): int8 activations
    halve every conv operand read, and the v5e MXU runs int8 at 2× the
    bf16 rate. Same quant recipe — per-tensor activation scale calibrated
    through the mutable ``quant`` collection, per-output-channel weight
    scales folded in-graph from the fp32 kernel. Parameter name and shape
    match the plain conv so checkpoints interchange. Accuracy risk is
    larger than the pointwise path (3×3s feed the residual trunk), which
    is why it is a separate opt-in measured by ``bench.py --mode int8``.
    """

    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    use_bias: bool
    dtype: jnp.dtype | None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel", msra_init_normal, (*self.kernel_size, cin, co),
            jnp.float32,
        )
        bias = (self.param("bias", nn.initializers.zeros, (co,), jnp.float32)
                if self.use_bias else None)
        act_max = self.variable("quant", "act_max",
                                lambda: jnp.zeros((), jnp.float32))
        pad = [(pi, pi) for pi in self.padding]
        calibrating = self.is_mutable_collection("quant")
        if calibrating or self.is_initializing():
            if not self.is_initializing():
                act_max.value = jnp.maximum(
                    act_max.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
            dt_ = self.dtype or x.dtype
            y = jax.lax.conv_general_dilated(
                x.astype(dt_), kernel.astype(dt_), self.stride, pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                precision=conv_precision(self.dtype),
            )
        else:
            s_act = act_max.value / 127.0
            w_max = jnp.maximum(
                jnp.max(jnp.abs(kernel), axis=(0, 1, 2, 3)), 1e-12)
            s_w = w_max / 127.0
            wq = jnp.clip(jnp.round(kernel / s_w), -127, 127
                          ).astype(jnp.int8)
            xq = jnp.clip(jnp.round(x / s_act), -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, wq, self.stride, pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (s_act * s_w)
            y = y.astype(self.dtype or x.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def quant_is_calibrated(variables) -> bool:
    """True when every ``quant`` act_max recorded a positive range (i.e. a
    calibration pass ran); serving INT8_EVAL without one zeroes the net."""
    import jax

    q = variables.get("quant") if hasattr(variables, "get") else None
    if not q:
        return False
    leaves = jax.tree_util.tree_leaves(q)
    return bool(leaves) and all(float(v) > 0.0 for v in leaves)


class Conv3d(nn.Module):
    """Conv over (T, H, W) with torch-style symmetric integer padding.

    Mirrors torch.nn.Conv3d(out, kernel, stride, padding, groups, bias) but in
    channels-last layout. Low-channel full-3D kernels (stems) dispatch to the
    per-tap decomposition (see _TapDecomposedConv).
    """

    features: int
    kernel_size: Sequence[int] | int
    stride: Sequence[int] | int = (1, 1, 1)
    padding: Sequence[int] | int = (0, 0, 0)
    groups: int = 1
    use_bias: bool = True
    dilation: Sequence[int] | int = (1, 1, 1)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        p = _triple(self.padding)
        d = _triple(self.dilation)
        # NOTE: measured in isolation the tap decomposition is ~1.8x faster
        # for the C_in=3 fast stem, but END-TO-END at large batch it loses
        # (~500 → ~300 clips/s on v5e) because it breaks XLA's fusion with the
        # surrounding BN/pool. Kept opt-in (cfg.TPU.TAP_DECOMPOSE) for
        # experimentation.
        from .options import options

        if (
            options.int8_eval
            and k == (1, 1, 1) and p == (0, 0, 0)  # slice+matmul form
            and self.groups == 1 and d == (1, 1, 1)
        ):
            return _Int8Conv1x1(
                features=self.features, stride=s, use_bias=self.use_bias,
                dtype=self.dtype, name="conv",
            )(x)
        if (
            options.int8_spatial
            # everything the pointwise gate above didn't take (k>1, or the
            # rare padded 1x1 that needs a real conv)
            and not (k == (1, 1, 1) and p == (0, 0, 0))
            and self.groups == 1 and d == (1, 1, 1)
        ):
            return _Int8ConvSpatial(
                features=self.features, kernel_size=k, stride=s, padding=p,
                use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x)
        if (
            options.stem_d2s
            and k[1] == k[2] == 7 and s == (1, 2, 2)
            and k[0] % 2 == 1  # the output reshape assumes t_out == t
            and p == (k[0] // 2, 3, 3)
            and self.groups == 1 and d == (1, 1, 1)
            and x.shape[-1] <= 8  # tiny-C_in stems (the MXU-hostile case)
            and x.shape[2] % 8 == 0 and x.shape[3] % 8 == 0
        ):
            return _S2DStemConv(
                features=self.features, kernel_size=k,
                use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x)
        if (
            options.tap_decompose
            and k[0] > 1 and (k[1] > 1 or k[2] > 1)
            and self.groups == 1 and d == (1, 1, 1)
            and x.shape[-1] * k[0] <= 48  # low-intensity stem territory
        ):
            return _TapDecomposedConv(
                features=self.features, kernel_size=k, stride=s, padding=p,
                use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x)
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=[(pi, pi) for pi in p],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=msra_init_normal,
            bias_init=nn.initializers.zeros,
            kernel_dilation=d,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
            name="conv",
        )(x)


class Conv1x1x1(Conv3d):
    kernel_size: Sequence[int] | int = (1, 1, 1)


class Linear(nn.Module):
    """Dense layer with the reference's fc init (normal std=fc_init_std, bias 0)."""

    features: int
    init_std: float = 0.01
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.normal(stddev=self.init_std),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
            name="fc",
        )(x)
