"""Group-limited sync-BN (reference: batchnorm_helper.py:174-218).

The reference's NaiveSyncBatchNorm3d normalizes each device's batch with
statistics all-gathered over a NUM_SYNC_DEVICES-sized device subgroup. Under
the global-batch SPMD step a subgroup's combined batch is a contiguous row
group, so SyncBatchNorm3d(num_groups=G) must reproduce per-group statistics
exactly — these tests check the math against a manual numpy transliteration
of the reference forward, the running-stats aggregation, the pytree-layout
compatibility that the multigrid BN auto-switch relies on, and the
get_norm/_bn_signature dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.ops.norm import (
    BatchNorm3d, SubBatchNorm3d, SyncBatchNorm3d, effective_sync_groups,
    get_norm,
)

EPS = 1e-5


def _reference_naive_sync(x, num_groups, weight, bias):
    """Numpy transliteration of NaiveSyncBatchNorm3d.forward train math
    (reference batchnorm_helper.py:195-218): per-subgroup mean/meansqr,
    var = meansqr - mean², scale/shift."""
    b = x.shape[0]
    per = b // num_groups
    out = np.empty_like(x)
    group_stats = []
    for g in range(num_groups):
        xs = x[g * per:(g + 1) * per]
        mean = xs.mean(axis=(0, 1, 2, 3))
        meansqr = (xs * xs).mean(axis=(0, 1, 2, 3))
        var = meansqr - mean * mean
        invstd = 1.0 / np.sqrt(var + EPS)
        scale = weight * invstd
        shift = bias - mean * scale
        out[g * per:(g + 1) * per] = xs * scale + shift
        group_stats.append((mean, var))
    return out, group_stats


def test_sync_bn_train_matches_reference_group_math():
    rng = np.random.RandomState(0)
    x = rng.randn(8, 2, 3, 3, 4).astype(np.float32)
    m = SyncBatchNorm3d(num_groups=4)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, _ = m.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    weight = np.ones(4, np.float32)
    bias = np.zeros(4, np.float32)
    expect, _ = _reference_naive_sync(x, 4, weight, bias)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_sync_bn_groups_actually_differ_from_global_bn():
    """With per-group means pushed apart, grouped normalization must differ
    from global-batch BN — guards against the module silently degenerating
    to plain BN."""
    rng = np.random.RandomState(1)
    x = rng.randn(8, 2, 3, 3, 4).astype(np.float32)
    x[:4] += 5.0  # shift group 0 (under num_groups=2)
    grouped = SyncBatchNorm3d(num_groups=2)
    plain = BatchNorm3d()
    gv = grouped.init(jax.random.PRNGKey(0), jnp.asarray(x))
    pv = plain.init(jax.random.PRNGKey(0), jnp.asarray(x))
    gout, _ = grouped.apply(gv, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])
    pout, _ = plain.apply(pv, jnp.asarray(x), train=True,
                          mutable=["batch_stats"])
    assert np.abs(np.asarray(gout) - np.asarray(pout)).max() > 0.1


def test_sync_bn_running_stats_aggregate_update():
    """Running stats update with the across-group aggregate: mean of group
    means, law-of-total-variance var (documented deviation from the
    reference's per-device buffers — expectation-equal to the master's)."""
    rng = np.random.RandomState(2)
    x = rng.randn(8, 2, 3, 3, 4).astype(np.float32) * 2.0 + 1.0
    m = SyncBatchNorm3d(num_groups=2, momentum=0.1)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _, new = m.apply(v, jnp.asarray(x), train=True, mutable=["batch_stats"])
    stats = new["batch_stats"]["bn"]
    _, group_stats = _reference_naive_sync(
        x, 2, np.ones(4, np.float32), np.zeros(4, np.float32))
    means = np.stack([m_ for m_, _ in group_stats])
    # two-pass per-group var (the module's form; reference's one-pass form
    # agrees to float tolerance on this data)
    per = x.shape[0] // 2
    vars = np.stack([
        ((x[g * per:(g + 1) * per] -
          means[g]) ** 2).mean(axis=(0, 1, 2, 3))
        for g in range(2)
    ])
    agg_mean = means.mean(0)
    agg_var = vars.mean(0) + ((means - agg_mean) ** 2).mean(0)
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), 0.9 * 0.0 + 0.1 * agg_mean, rtol=1e-4,
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats["var"]), 0.9 * 1.0 + 0.1 * agg_var, rtol=1e-4,
        atol=1e-5)


def test_sync_bn_eval_uses_running_stats():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 2, 3, 3, 4).astype(np.float32)
    m = SyncBatchNorm3d(num_groups=2)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(v, jnp.asarray(x), train=False)
    # init stats are mean=0, var=1 → eval output ≈ input / sqrt(1+eps)
    np.testing.assert_allclose(
        np.asarray(out), x / np.sqrt(1.0 + EPS), rtol=1e-5, atol=1e-5)


def test_sync_bn_pytree_layout_matches_plain_bn():
    """The multigrid BN auto-switch carries params/opt-state/batch_stats
    across a batchnorm <-> sync_batchnorm rebuild unchanged — requires
    identical pytree structure (engine/train.py BN rebuild branch)."""
    x = jnp.ones((4, 2, 3, 3, 4))
    vp = BatchNorm3d().init(jax.random.PRNGKey(0), x)
    vs = SyncBatchNorm3d(num_groups=2).init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(vp) ==
            jax.tree_util.tree_structure(vs))
    for a, b in zip(jax.tree_util.tree_leaves(vp),
                    jax.tree_util.tree_leaves(vs)):
        assert a.shape == b.shape


def test_effective_sync_groups_and_get_norm_dispatch():
    cfg = get_cfg()
    n = jax.device_count()  # 8 virtual CPU devices (conftest)
    cfg.BN.NORM_TYPE = "sync_batchnorm"

    cfg.BN.NUM_SYNC_DEVICES = 0  # reference: 0 -> whole local group
    assert effective_sync_groups(cfg) == 1
    assert get_norm(cfg)().__class__ is BatchNorm3d

    cfg.BN.NUM_SYNC_DEVICES = n  # spans the mesh -> global stats
    assert effective_sync_groups(cfg) == 1
    assert get_norm(cfg)().__class__ is BatchNorm3d

    cfg.BN.NUM_SYNC_DEVICES = n // 2
    assert effective_sync_groups(cfg) == 2
    mod = get_norm(cfg)()
    assert isinstance(mod, SyncBatchNorm3d) and mod.num_groups == 2

    cfg.BN.NUM_SYNC_DEVICES = 1  # reference default: per-device stats
    mod = get_norm(cfg)()
    assert isinstance(mod, SyncBatchNorm3d) and mod.num_groups == n

    cfg.BN.NUM_SYNC_DEVICES = 3  # does not divide the mesh — reference
    with pytest.raises(ValueError):  # asserts the same way (:184-188)
        effective_sync_groups(cfg)


def test_bn_signature_distinguishes_sync_groups():
    from efficient_slowfast_tpu.engine.train import _bn_signature

    cfg = get_cfg()
    n = jax.device_count()
    cfg.BN.NORM_TYPE = "batchnorm"
    plain_sig = _bn_signature(cfg)

    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.BN.NUM_SYNC_DEVICES = n  # degenerate: same module as plain BN
    assert _bn_signature(cfg) == plain_sig

    cfg.BN.NUM_SYNC_DEVICES = n // 2  # proper subgroup: real module change
    assert _bn_signature(cfg) == ("sync_batchnorm", 2)

    cfg.BN.NORM_TYPE = "sub_batchnorm"
    cfg.BN.NUM_SPLITS = 2
    assert _bn_signature(cfg)[0] == "sub_batchnorm"


def test_sync_bn_in_model_trains_on_mesh():
    """Whole-model smoke on the 8-virtual-device mesh: a sync-BN build
    (proper subgroup) must jit, take a train step, and produce finite
    grouped statistics."""
    from efficient_slowfast_tpu.engine.state import (
        create_train_state, make_train_step, pathway_inputs, shard_state,
    )
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.parallel.mesh import build_mesh, shard_batch

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 6
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.BN.NORM_TYPE = "sync_batchnorm"
    cfg.BN.NUM_SYNC_DEVICES = jax.device_count() // 2

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    state, tx = create_train_state(cfg, model, rng)
    state = shard_state(state, mesh)
    step = make_train_step(cfg, model, tx)
    batch = 8
    inputs = shard_batch(mesh, pathway_inputs(cfg, batch))
    labels = shard_batch(
        mesh, np.arange(batch, dtype=np.int32) % cfg.MODEL.NUM_CLASSES)
    state, mets = step(state, inputs, labels, 0.01, rng)
    assert np.isfinite(float(mets["loss"]))
    stats = jax.device_get(state.batch_stats)
    leaves = jax.tree_util.tree_leaves(stats)
    assert all(np.all(np.isfinite(l)) for l in leaves)
