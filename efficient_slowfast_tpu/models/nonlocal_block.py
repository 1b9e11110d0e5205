"""Non-local block (reference: slowfast/models/nonlocal_helper.py:10-148).

Channels-last (B, T, H, W, C); affinity + aggregation as einsum batched
matmuls (MXU), softmax path scales by dim_inner**-0.5 and accumulates fp32.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import Conv3d
from ..ops.norm import BatchNorm3d
from ..ops.pool import max_pool3d


class Nonlocal(nn.Module):
    dim_inner: int
    pool_size: Optional[Sequence[int]] = None  # (T, H, W) pooling of phi/g input
    instantiation: str = "softmax"  # "softmax" | "dot_product"
    zero_init_final_norm: bool = True
    norm: Callable[..., nn.Module] = BatchNorm3d
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        identity = x

        theta = Conv3d(self.dim_inner, 1, dtype=self.dtype, name="theta")(x)

        use_pool = self.pool_size is not None and any(s > 1 for s in self.pool_size)
        if use_pool:
            x = max_pool3d(x, self.pool_size, self.pool_size)

        phi = Conv3d(self.dim_inner, 1, dtype=self.dtype, name="phi")(x)
        g = Conv3d(self.dim_inner, 1, dtype=self.dtype, name="g")(x)

        theta = theta.reshape(b, -1, self.dim_inner)
        phi = phi.reshape(b, -1, self.dim_inner)
        g = g.reshape(b, -1, self.dim_inner)
        n_q = theta.shape[1]
        n_k = phi.shape[1]

        if self.instantiation == "dot_product":
            # (θ φᵀ / N) g == θ (φᵀ g) / N — associativity turns the (N, N)
            # affinity into a (d, d) contraction: O(N·d²) compute, O(d²) memory
            # instead of O(N²). Exact.
            kv = jnp.einsum("bkd,bke->bde", phi, g,
                            preferred_element_type=jnp.float32)
            out = jnp.einsum("bqd,bde->bqe", theta, kv.astype(theta.dtype),
                             preferred_element_type=jnp.float32) / n_k
        elif self.instantiation == "softmax":
            scale = self.dim_inner ** -0.5
            from ..ops.options import options

            if n_q > options.flash_min_tokens:
                # flash path: the (N, N) affinity never hits HBM
                from ..ops.pallas.flash_attention import flash_attention

                out = flash_attention(theta * scale, phi, g)
            else:
                aff = jnp.einsum("bqd,bkd->bqk", theta, phi,
                                 preferred_element_type=jnp.float32)
                aff = nn.softmax(aff * scale, axis=-1)
                out = jnp.einsum("bqk,bkd->bqd", aff.astype(g.dtype), g,
                                 preferred_element_type=jnp.float32)
        else:
            raise NotImplementedError(self.instantiation)
        out = out.reshape(b, t, h, w, self.dim_inner).astype(identity.dtype)

        out = Conv3d(c, 1, dtype=self.dtype, name="out")(out)
        out = self.norm(
            zero_init_gamma=self.zero_init_final_norm, dtype=self.dtype, name="bn"
        )(out, train=train)
        return identity + out
