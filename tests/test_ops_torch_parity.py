"""Golden-value parity tests vs PyTorch CPU (SURVEY §4 test plan item 2/3).

Each test builds the torch op fresh (no reference code), copies weights into
the flax module via utils.torch_import layout mappings, and compares outputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from efficient_slowfast_tpu.ops.conv import Conv3d
from efficient_slowfast_tpu.ops.norm import BatchNorm3d, SubBatchNorm3d, aggregate_sub_bn_stats
from efficient_slowfast_tpu.ops.pool import avg_pool3d, max_pool3d
from efficient_slowfast_tpu.models.common_efficient import channel_shuffle
from efficient_slowfast_tpu.utils import torch_import as ti

TOL = dict(rtol=1e-5, atol=1e-5)


def to_cl(x_nchw):  # torch NCTHW -> jax NTHWC
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 4, 1)))


def from_cl(y):  # jax NTHWC -> numpy NCTHW
    return np.transpose(np.asarray(y), (0, 4, 1, 2, 3))


@pytest.mark.parametrize("kernel,stride,padding,groups,cin", [
    ((1, 7, 7), (1, 2, 2), (0, 3, 3), 1, 8),
    ((3, 1, 1), (1, 1, 1), (1, 0, 0), 1, 8),
    ((3, 3, 3), (1, 2, 2), (1, 1, 1), 4, 8),   # depthwise-ish grouped
    ((5, 1, 1), (4, 1, 1), (2, 0, 0), 1, 8),   # lateral fusion conv
    ((5, 7, 7), (1, 2, 2), (2, 3, 3), 1, 3),   # stem → tap-decomposed path
    ((3, 3, 3), (2, 1, 1), (1, 1, 1), 1, 3),   # temporal stride, decomposed
])
def test_conv3d_matches_torch(kernel, stride, padding, groups, cin):
    torch.manual_seed(0)
    cout = 16
    tconv = tnn.Conv3d(cin, cout, kernel, stride, padding, groups=groups, bias=True)
    x = torch.randn(2, cin, 8, 12, 12)
    with torch.no_grad():
        ref = tconv(x).numpy()

    m = Conv3d(cout, kernel, stride, padding, groups=groups, use_bias=True)
    xj = to_cl(x.numpy())
    params = m.init(jax.random.PRNGKey(0), xj)
    params = jax.tree_util.tree_map(lambda x: x, params)  # unfreeze copy
    params["params"]["conv"]["kernel"] = jnp.asarray(
        ti.conv3d_weight(tconv.weight.detach().numpy())
    )
    params["params"]["conv"]["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    out = from_cl(m.apply(params, xj))
    np.testing.assert_allclose(out, ref, **TOL)


@pytest.mark.parametrize("kernel,stride,padding", [
    ((5, 7, 7), (1, 2, 2), (2, 3, 3)),   # fast-pathway stem
    ((3, 3, 3), (2, 1, 1), (1, 1, 1)),   # temporal-stride stem
])
def test_tap_decomposed_conv_matches_torch(monkeypatch, kernel, stride, padding):
    """The opt-in per-tap decomposition (cfg.TPU.TAP_DECOMPOSE) must be
    numerically identical to the dense conv."""
    from efficient_slowfast_tpu.ops.options import options

    torch.manual_seed(0)
    cin, cout = 3, 16
    tconv = tnn.Conv3d(cin, cout, kernel, stride, padding, bias=True)
    x = torch.randn(2, cin, 8, 12, 12)
    with torch.no_grad():
        ref = tconv(x).numpy()

    monkeypatch.setattr(options, "tap_decompose", True)
    m = Conv3d(cout, kernel, stride, padding, use_bias=True)
    xj = to_cl(x.numpy())
    params = m.init(jax.random.PRNGKey(0), xj)
    params = jax.tree_util.tree_map(lambda x: x, params)
    params["params"]["conv"]["kernel"] = jnp.asarray(
        ti.conv3d_weight(tconv.weight.detach().numpy())
    )
    params["params"]["conv"]["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    out = from_cl(m.apply(params, xj))
    np.testing.assert_allclose(out, ref, **TOL)


def test_batchnorm_eval_matches_torch():
    torch.manual_seed(0)
    c = 12
    tbn = tnn.BatchNorm3d(c, eps=1e-5, momentum=0.1)
    tbn.weight.data.normal_(); tbn.bias.data.normal_()
    tbn.running_mean.normal_(); tbn.running_var.uniform_(0.5, 2.0)
    tbn.eval()
    x = torch.randn(2, c, 4, 6, 6)
    with torch.no_grad():
        ref = tbn(x).numpy()

    m = BatchNorm3d()
    xj = to_cl(x.numpy())
    v = m.init(jax.random.PRNGKey(0), xj)
    v = {
        "params": {"bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                            "bias": jnp.asarray(tbn.bias.detach().numpy())}},
        "batch_stats": {"bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                                "var": jnp.asarray(tbn.running_var.numpy())}},
    }
    out = from_cl(m.apply(v, xj, train=False))
    np.testing.assert_allclose(out, ref, **TOL)


def test_batchnorm_train_updates_running_stats_like_torch():
    torch.manual_seed(1)
    c = 6
    tbn = tnn.BatchNorm3d(c, eps=1e-5, momentum=0.1)
    tbn.train()
    x = torch.randn(4, c, 2, 5, 5)
    with torch.no_grad():
        ref = tbn(x).numpy()

    m = BatchNorm3d()
    xj = to_cl(x.numpy())
    v = m.init(jax.random.PRNGKey(0), xj)
    out, updated = m.apply(v, xj, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(from_cl(out), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["bn"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5,
    )
    # torch uses unbiased variance for the running update
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["bn"]["var"]),
        tbn.running_var.numpy(), rtol=1e-2, atol=1e-2,
    )


def test_channel_shuffle_matches_torch():
    x = torch.arange(2 * 12 * 2 * 3 * 3, dtype=torch.float32).reshape(2, 12, 2, 3, 3)
    g = 3
    b, c, t, h, w = x.shape
    ref = (
        x.view(b, g, c // g, t, h, w).permute(0, 2, 1, 3, 4, 5).reshape(b, c, t, h, w)
    ).numpy()
    out = from_cl(channel_shuffle(to_cl(x.numpy()), g))
    np.testing.assert_array_equal(out, ref)


def test_maxpool_matches_torch():
    x = torch.randn(2, 4, 8, 9, 9)
    tp = tnn.MaxPool3d(kernel_size=(1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))
    ref = tp(x).numpy()
    out = from_cl(max_pool3d(to_cl(x.numpy()), (1, 3, 3), (1, 2, 2), (0, 1, 1)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_avgpool_matches_torch():
    x = torch.randn(2, 4, 8, 8, 8)
    tp = tnn.AvgPool3d(kernel_size=(2, 7, 7), stride=1)
    ref = tp(x).numpy()
    out = from_cl(avg_pool3d(to_cl(x.numpy()), (2, 7, 7), (1, 1, 1)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_sub_bn_aggregation():
    """Aggregated mean/var must equal stats over the union of splits."""
    rng = np.random.RandomState(0)
    sm = rng.randn(4, 8).astype(np.float32)
    sv = rng.uniform(0.5, 2.0, (4, 8)).astype(np.float32)
    stats = {"layer": {"split_mean": jnp.asarray(sm), "split_var": jnp.asarray(sv),
                       "mean": jnp.zeros(8), "var": jnp.ones(8)}}
    out = aggregate_sub_bn_stats(stats)
    mean = sm.mean(0)
    var = sv.mean(0) + ((sm - mean) ** 2).mean(0)
    np.testing.assert_allclose(np.asarray(out["layer"]["mean"]), mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["layer"]["var"]), var, rtol=1e-5)


def test_sub_bn_forward_train_matches_manual_split():
    c, splits = 4, 2
    m = SubBatchNorm3d(num_splits=splits)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 2, 3, 3, c).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    # manual: normalize each half-batch independently
    for s in range(splits):
        xs = np.asarray(x[s * 2:(s + 1) * 2])
        mu = xs.mean(axis=(0, 1, 2, 3))
        var = xs.var(axis=(0, 1, 2, 3))
        expect = (xs - mu) / np.sqrt(var + 1e-5)
        np.testing.assert_allclose(
            np.asarray(out[s * 2:(s + 1) * 2]), expect, rtol=1e-4, atol=1e-4
        )


def test_linear_matches_torch():
    torch.manual_seed(0)
    tl = tnn.Linear(16, 5)
    x = torch.randn(3, 16)
    ref = tl(x).detach().numpy()
    from efficient_slowfast_tpu.ops.conv import Linear

    m = Linear(5)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))
    v = {"params": {"fc": {
        "kernel": jnp.asarray(ti.linear_weight(tl.weight.detach().numpy())),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }}}
    out = np.asarray(m.apply(v, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(out, ref, **TOL)


def test_inflate_2d_to_3d():
    w2 = np.random.RandomState(0).randn(8, 3, 7, 7).astype(np.float32)
    w3 = ti.inflate_2d_to_3d(w2, 5)
    assert w3.shape == (8, 3, 5, 7, 7)
    np.testing.assert_allclose(w3.sum(axis=2), w2, rtol=1e-6)


@pytest.mark.parametrize("kt,cin,cout", [(5, 3, 8), (1, 3, 64), (5, 1, 8)])
def test_s2d_stem_conv_matches_torch(monkeypatch, kt, cin, cout):
    """cfg.TPU.STEM_D2S rewrite (s2d(4) + output-block channel packing) is
    numerically identical to the dense stride-2 7x7 stem conv."""
    from efficient_slowfast_tpu.ops.options import options

    torch.manual_seed(0)
    tconv = tnn.Conv3d(cin, cout, (kt, 7, 7), (1, 2, 2), (kt // 2, 3, 3),
                       bias=True)
    x = torch.randn(2, cin, 4, 32, 32)
    with torch.no_grad():
        ref = tconv(x).numpy()

    monkeypatch.setattr(options, "stem_d2s", True)
    m = Conv3d(cout, (kt, 7, 7), (1, 2, 2), (kt // 2, 3, 3), use_bias=True)
    xj = to_cl(x.numpy())
    params = m.init(jax.random.PRNGKey(0), xj)
    params = jax.tree_util.tree_map(lambda x: x, params)
    # the rewrite must have created the STANDARD kernel param (checkpoint
    # layout unchanged)
    assert params["params"]["conv"]["kernel"].shape == (kt, 7, 7, cin, cout)
    params["params"]["conv"]["kernel"] = jnp.asarray(
        ti.conv3d_weight(tconv.weight.detach().numpy())
    )
    params["params"]["conv"]["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    out = from_cl(m.apply(params, xj))
    np.testing.assert_allclose(out, ref, **TOL)


def test_s2d_stem_gate_skips_even_temporal_kernel(monkeypatch):
    """Even-kt stems (t_out != t) must fall back to the standard conv."""
    from efficient_slowfast_tpu.ops.options import options

    monkeypatch.setattr(options, "stem_d2s", True)
    torch.manual_seed(0)
    tconv = tnn.Conv3d(3, 8, (2, 7, 7), (1, 2, 2), (1, 3, 3), bias=False)
    x = torch.randn(1, 3, 4, 16, 16)
    with torch.no_grad():
        ref = tconv(x).numpy()
    m = Conv3d(8, (2, 7, 7), (1, 2, 2), (1, 3, 3), use_bias=False)
    xj = to_cl(x.numpy())
    params = m.init(jax.random.PRNGKey(0), xj)
    params = jax.tree_util.tree_map(lambda v: v, params)
    params["params"]["conv"]["kernel"] = jnp.asarray(
        ti.conv3d_weight(tconv.weight.detach().numpy()))
    out = from_cl(m.apply(params, xj))
    np.testing.assert_allclose(out, ref, **TOL)


def test_bn_variance_no_catastrophic_cancellation():
    """Large-mean/small-std activations must not NaN the BN rsqrt: the
    one-pass E[x²]−E[x]² variance cancels to NEGATIVE in float32 at
    |mean|>>std (torch BN computes the stable form natively — observed here
    as data-dependent NaN losses in sub-BN multigrid training)."""
    import jax

    rs = np.random.RandomState(0)
    x = (1e3 + 0.01 * rs.randn(16, 4, 8, 8, 8)).astype(np.float32)
    # the raw one-pass formula genuinely fails on this data (guards the
    # test itself against becoming vacuous on future dtype changes)
    fast = np.mean(x.astype(np.float32) ** 2, axis=(0, 1, 2, 3)) - \
        np.mean(x, axis=(0, 1, 2, 3)) ** 2
    assert fast.min() < 0

    for mod in (SubBatchNorm3d(num_splits=4), BatchNorm3d()):
        v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
        y, updated = mod.apply(v, jnp.asarray(x), train=True,
                               mutable=["batch_stats"])
        assert np.isfinite(np.asarray(y)).all(), type(mod).__name__
        for leaf in jax.tree_util.tree_leaves(updated):
            assert np.isfinite(np.asarray(leaf)).all(), type(mod).__name__
