"""Attention modules used by the CMDA fusion and aux blocks.

Reference behavior: slowfast/models/wdf_attention_helper.py
  - SpatialAttention (:13-54)  — SAGAN/DANet QKV over T·H·W with learned γ.
  - ECA             (:57-91)  — global avg-pool → conv1d(k) over channels → σ gate.
  - ChannelAttention (:97-124) — SE-style gate with extra residual.
  - NonLocalBlock   (:129-195), Stripe_NonLocalBlock (:198-273),
    ContextBlock3D  (:289-379, GCNet).

All modules take channels-last (B, T, H, W, C) tensors. The QKV attention is
expressed as einsum batched matmuls so XLA maps it onto the MXU; softmax
accumulation in float32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .conv import Conv3d, conv_precision
from .norm import BatchNorm3d


class SpatialAttention(nn.Module):
    """Full spatio-temporal self-attention with zero-init γ residual."""

    reduction: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        inner = c // self.reduction
        q = Conv3d(inner, 1, use_bias=True, dtype=self.dtype, name="query")(x)
        k = Conv3d(inner, 1, use_bias=True, dtype=self.dtype, name="key")(x)
        v = Conv3d(c, 1, use_bias=True, dtype=self.dtype, name="value")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)

        n = t * h * w
        q = q.reshape(b, n, inner)
        k = k.reshape(b, n, inner)
        v = v.reshape(b, n, c)
        # attention[i, j] = softmax_j(q_i · k_j)  (reference softmax over
        # dim=-1, unscaled). Large token counts go through the flash-style
        # path so the (N, N) affinity never hits HBM (ops/pallas).
        from .options import options

        if n > options.flash_min_tokens:
            from .pallas.flash_attention import flash_attention

            out = flash_attention(q, k, v)
        else:
            logits = jnp.einsum("bqd,bkd->bqk", q, k,
                                preferred_element_type=jnp.float32)
            attn = nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bqk,bkc->bqc", attn, v,
                             preferred_element_type=jnp.float32)
        out = out.reshape(b, t, h, w, c).astype(x.dtype)
        return gamma.astype(x.dtype) * out + x


class ECA(nn.Module):
    """Efficient Channel Attention: 1-D conv over the channel profile."""

    k_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (B, C) global descriptor
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        # conv1d over channel axis, 1 in / 1 out channel, no bias
        y = y[..., None]  # (B, C, 1)
        y = nn.Conv(
            features=1,
            kernel_size=(self.k_size,),
            padding=[( (self.k_size - 1) // 2, (self.k_size - 1) // 2 )],
            use_bias=False,
            param_dtype=jnp.float32,
            precision=conv_precision(self.dtype),
            name="conv",
        )(y)
        gate = nn.sigmoid(y[..., 0]).astype(x.dtype)  # (B, C)
        return x * gate[:, None, None, None, :]


class ChannelAttention(nn.Module):
    """SE-style channel gate with an extra residual (x*g + x)."""

    reduction: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        inner = c // self.reduction if c // self.reduction != 0 else 2
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
        y = Conv3d(inner, 1, use_bias=True, dtype=self.dtype, name="down")(y.astype(x.dtype))
        y = nn.relu(y)
        y = Conv3d(c, 1, use_bias=True, dtype=self.dtype, name="up")(y)
        gate = nn.sigmoid(y)
        return x * gate + x


class NonLocalBlock(nn.Module):
    """Generic embedded-gaussian non-local block with zero-init output BN."""

    inter_channels: Optional[int] = None
    sub_sample: bool = False
    bn_layer: bool = True
    instance: str = "soft"  # "soft" | "dot"
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        inner = self.inter_channels or max(c // 2, 1)

        g = Conv3d(inner, 1, dtype=self.dtype, name="g")(x)
        theta = Conv3d(inner, 1, dtype=self.dtype, name="theta")(x)
        phi = Conv3d(inner, 1, dtype=self.dtype, name="phi")(x)
        if self.sub_sample:
            from .pool import max_pool3d

            g = max_pool3d(g, (1, 2, 2))
            phi = max_pool3d(phi, (1, 2, 2))

        n_q = t * h * w
        theta = theta.reshape(b, n_q, inner)
        phi = phi.reshape(b, -1, inner)
        g = g.reshape(b, -1, inner)
        f = jnp.einsum("bqd,bkd->bqk", theta, phi, preferred_element_type=jnp.float32)
        if self.instance == "soft":
            f = nn.softmax(f, axis=-1)
        else:
            f = f / f.shape[1]
        y = jnp.einsum("bqk,bkd->bqd", f.astype(g.dtype), g,
                       preferred_element_type=jnp.float32)
        y = y.reshape(b, t, h, w, inner).astype(x.dtype)

        if self.bn_layer:
            wy = Conv3d(c, 1, dtype=self.dtype, name="w")(y)
            wy = BatchNorm3d(
                epsilon=self.bn_eps, momentum=self.bn_momentum,
                zero_init_gamma=True, dtype=self.dtype, name="w_bn",
            )(wy, train=train)
        else:
            # zero-init conv so the block starts as identity
            wy = nn.Conv(
                features=c, kernel_size=(1, 1, 1),
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                dtype=self.dtype, param_dtype=jnp.float32,
                precision=conv_precision(self.dtype), name="w_zero",
            )(y)
        return wy + x


class StripeNonLocalBlock(nn.Module):
    """Non-local attention over horizontal stripes (pooled descriptors)."""

    stripe: int
    inter_channels: Optional[int] = None
    pool_type: str = "mean"  # "mean" | "max" | "meanmax"
    instance: str = "soft"
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        assert h % self.stripe == 0
        hs = h // self.stripe
        # (B, T, stripe, hs, w, C) → pooled over (hs, w) → (B, T, stripe, 1, 1, C)
        xs = x.reshape(b, t, self.stripe, hs, w, c)
        if self.pool_type == "mean":
            d = jnp.mean(xs, axis=(3, 4))
        elif self.pool_type == "max":
            d = jnp.max(xs, axis=(3, 4))
        else:  # meanmax — concat on channel
            d = jnp.concatenate(
                [jnp.mean(xs, axis=(3, 4)), jnp.max(xs, axis=(3, 4))], axis=-1
            )
        # d: (B, T, stripe, C'), treat (T, stripe) as the token grid with a
        # singleton width so Conv3d applies.
        d = d[:, :, :, None, :]  # (B, T, stripe, 1, C')
        inner = self.inter_channels or max(c // 2, 1)
        g = Conv3d(inner, 1, dtype=self.dtype, name="g")(d)
        theta = Conv3d(inner, 1, dtype=self.dtype, name="theta")(d)
        phi = Conv3d(inner, 1, dtype=self.dtype, name="phi")(d)
        n = t * self.stripe
        g = g.reshape(b, n, inner)
        theta = theta.reshape(b, n, inner)
        phi = phi.reshape(b, n, inner)
        f = jnp.einsum("bqd,bkd->bqk", theta, phi, preferred_element_type=jnp.float32)
        if self.instance == "soft":
            f = nn.softmax(f, axis=-1)
        else:
            f = f / f.shape[1]
        y = jnp.einsum("bqk,bkd->bqd", f.astype(g.dtype), g,
                       preferred_element_type=jnp.float32)
        y = y.reshape(b, t, self.stripe, 1, inner).astype(x.dtype)
        wy = Conv3d(c, 1, dtype=self.dtype, name="w")(y)
        wy = BatchNorm3d(
            epsilon=self.bn_eps, momentum=self.bn_momentum,
            zero_init_gamma=True, dtype=self.dtype, name="w_bn",
        )(wy, train=train)
        # broadcast each stripe value back over its (hs, w) footprint
        wy = jnp.broadcast_to(
            wy.reshape(b, t, self.stripe, 1, 1, c), (b, t, self.stripe, hs, w, c)
        ).reshape(b, t, h, w, c)
        return wy + x


class ContextBlock3D(nn.Module):
    """GCNet global-context block (attention pooling + channel add/mul)."""

    ratio: float = 1.0
    pooling_type: str = "att"  # "att" | "avg"
    fusion_types: Tuple[str, ...] = ("channel_add",)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        planes = int(c * self.ratio)
        if self.pooling_type == "att":
            mask = Conv3d(1, 1, dtype=self.dtype, name="conv_mask")(x)  # (B,T,H,W,1)
            mask = nn.softmax(mask.reshape(b, -1).astype(jnp.float32), axis=-1)
            ctx = jnp.einsum(
                "bn,bnc->bc", mask, x.reshape(b, -1, c).astype(jnp.float32)
            ).astype(x.dtype)
        else:
            ctx = jnp.mean(x, axis=(1, 2, 3))
        ctx = ctx[:, None, None, None, :]  # (B,1,1,1,C)

        out = x
        if "channel_mul" in self.fusion_types:
            y = Conv3d(planes, 1, dtype=self.dtype, name="mul_down")(ctx)
            y = nn.LayerNorm(param_dtype=jnp.float32, name="mul_ln")(y)
            y = nn.relu(y)
            y = nn.Conv(
                features=c, kernel_size=(1, 1, 1), kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=jnp.float32,
                precision=conv_precision(self.dtype), name="mul_up",
            )(y)
            out = out * nn.sigmoid(y)
        if "channel_add" in self.fusion_types:
            y = Conv3d(planes, 1, dtype=self.dtype, name="add_down")(ctx)
            y = nn.LayerNorm(param_dtype=jnp.float32, name="add_ln")(y)
            y = nn.relu(y)
            y = nn.Conv(
                features=c, kernel_size=(1, 1, 1), kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                param_dtype=jnp.float32,
                precision=conv_precision(self.dtype), name="add_up",
            )(y)
            out = out + y
        return out
