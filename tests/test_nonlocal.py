"""Nonlocal block numerics: associative dot_product + flash softmax paths
must match the dense reference computation."""

import numpy as np
import jax
import jax.numpy as jnp

from efficient_slowfast_tpu.models.nonlocal_block import Nonlocal


def dense_reference(variables, x, instantiation, dim_inner):
    """Dense (N, N) computation using the module's own conv params."""
    p = variables["params"]

    def conv(name, x):
        k = p[name]["conv"]["kernel"]
        b = p[name]["conv"]["bias"]
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(0, 0)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision="highest")
        return y + b

    b, t, h, w, c = x.shape
    theta = conv("theta", x).reshape(b, -1, dim_inner)
    phi = conv("phi", x).reshape(b, -1, dim_inner)
    g = conv("g", x).reshape(b, -1, dim_inner)
    aff = jnp.einsum("bqd,bkd->bqk", theta, phi)
    if instantiation == "softmax":
        aff = jax.nn.softmax(aff * dim_inner ** -0.5, axis=-1)
    else:
        aff = aff / aff.shape[-1]
    out = jnp.einsum("bqk,bkd->bqd", aff, g).reshape(b, t, h, w, dim_inner)
    # final conv + bn (eval: running stats are init → identity-ish affine)
    y = jax.lax.conv_general_dilated(
        out, p["out"]["conv"]["kernel"], (1, 1, 1), [(0, 0)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision="highest")
    y = y + p["out"]["conv"]["bias"]
    scale = p["bn"]["bn"]["scale"]
    bias = p["bn"]["bn"]["bias"]
    y = y / np.sqrt(1.0 + 1e-5) * scale + bias
    return x + y


def run_case(instantiation, shape=(1, 4, 18, 18, 16)):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape), jnp.float32)
    m = Nonlocal(dim_inner=8, pool_size=None, instantiation=instantiation)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x, train=False)
    ref = dense_reference(v, x, instantiation, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_nonlocal_dot_product_associative_matches_dense():
    run_case("dot_product")


def test_nonlocal_softmax_flash_matches_dense():
    # 4*18*18 = 1296 > 1024 → flash/chunked path
    run_case("softmax")


def test_nonlocal_softmax_small_dense_path():
    run_case("softmax", shape=(1, 2, 8, 8, 16))
