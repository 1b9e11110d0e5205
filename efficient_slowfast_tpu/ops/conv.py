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


class Conv3d(nn.Module):
    """Conv over (T, H, W) with torch-style symmetric integer padding.

    Mirrors torch.nn.Conv3d(out, kernel, stride, padding, groups, bias) but in
    channels-last layout.
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
