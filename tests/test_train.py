"""Train-step, optimizer, and LR-policy tests (8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.models import build_model
from efficient_slowfast_tpu.models.optimizer import bn_mask, construct_optimizer
from efficient_slowfast_tpu.engine.state import (
    create_train_state, make_eval_step, make_train_step, pathway_inputs, shard_state,
)
from efficient_slowfast_tpu.parallel.mesh import build_mesh, shard_batch
from efficient_slowfast_tpu.utils import lr_policy


def small_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.ARCH = "slowfast"
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.MODEL.NUM_CLASSES = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_train_step_decreases_loss(rng):
    cfg = small_cfg()
    cfg.MODEL.DROPOUT_RATE = 0.0  # deterministic objective on a fixed batch
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, rng)
    mesh = build_mesh(cfg)
    state = shard_state(state, mesh)
    step = make_train_step(cfg, model, tx)
    inputs = [jax.random.normal(rng, x.shape) for x in pathway_inputs(cfg, 8)]
    labels = jnp.arange(8) % 4
    inputs = shard_batch(mesh, inputs)
    labels = shard_batch(mesh, labels)
    losses = []
    for _ in range(6):
        state, mets = step(state, inputs, labels, 0.01, rng)
        losses.append(float(mets["loss"]))
    # SGD on a fixed batch (no dropout) must reduce the loss overall
    assert min(losses[2:]) < losses[0], losses
    assert int(state.step) == 6


def test_eval_step_metrics(rng):
    cfg = small_cfg()
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, rng)
    ev = make_eval_step(cfg, model)
    inputs = pathway_inputs(cfg, 4)
    labels = jnp.zeros(4, jnp.int32)
    out = ev(state, inputs, labels)
    assert out["preds"].shape == (4, 4)
    assert 0.0 <= float(out["top1_err"]) <= 100.0


def test_data_parallel_collectives_in_compiled_hlo(rng):
    """Pin the parallelism contract at the compiler level: over the 8-device
    mesh the jitted train step must (a) partition the batch 8-ways and keep
    params replicated, and (b) contain a cross-device all-reduce — the
    gradient psum GSPMD inserts for data parallelism (SURVEY §2.7; the TPU
    counterpart of the reference's DDP allreduce). Catches regressions where
    sharding annotations silently stop propagating (everything still runs,
    just replicated — wrong gradients at scale, invisible to value tests on
    one host)."""
    cfg = small_cfg()
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, rng)
    mesh = build_mesh(cfg)
    assert mesh.devices.size == 8, "conftest must provide 8 virtual devices"
    state = shard_state(state, mesh)
    step = make_train_step(cfg, model, tx)
    inputs = shard_batch(mesh, pathway_inputs(cfg, 8))
    labels = shard_batch(mesh, jnp.zeros(8, jnp.int32))

    # runtime shardings: batch split over the data axis, params replicated
    assert not inputs[0].sharding.is_fully_replicated
    assert inputs[0].sharding.shard_shape(inputs[0].shape)[0] == 1
    some_param = jax.tree_util.tree_leaves(state.params)[0]
    assert some_param.sharding.is_fully_replicated

    hlo = step.lower(state, inputs, labels, 0.01, rng).compile().as_text()
    # gradient sync: an all-reduce spanning all 8 devices (group format
    # varies by XLA version: explicit {{0,...,7}} or iota [8]<=[8])
    assert "all-reduce" in hlo, "no gradient all-reduce in compiled HLO"
    assert ("{0,1,2,3,4,5,6,7}" in hlo) or ("[8]<=[8]" in hlo) or \
        ("replica_groups={}" in hlo), "all-reduce does not span the mesh"

    # the masked eval step's metric reduction must also cross devices
    ev = make_eval_step(cfg, model)
    valid = shard_batch(mesh, jnp.ones(8, jnp.float32))
    ehlo = ev.lower(state, inputs, labels, valid).compile().as_text()
    assert "all-reduce" in ehlo, "no metric all-reduce in compiled eval HLO"


def test_bn_mask_identifies_norm_params(rng):
    cfg = small_cfg()
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, rng)
    mask = bn_mask(state.params, want_bn=True)
    leaves_with_path = jax.tree_util.tree_flatten_with_path(mask)[0]
    bn_true = [p for p, v in leaves_with_path if v]
    bn_false = [p for p, v in leaves_with_path if not v]
    assert bn_true and bn_false
    assert all(any("bn" in str(k) for k in p) for p in bn_true)
    assert not any(any("bn" in str(k) for k in p) for p in bn_false)


def test_lr_cosine_and_warmup():
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.MAX_EPOCH = 100
    cfg.SOLVER.WARMUP_EPOCHS = 0.0
    assert lr_policy.get_lr_at_epoch(cfg, 0.0) == pytest.approx(0.1)
    assert lr_policy.get_lr_at_epoch(cfg, 50.0) == pytest.approx(0.05)
    assert lr_policy.get_lr_at_epoch(cfg, 100.0) == pytest.approx(0.0, abs=1e-9)
    cfg.SOLVER.WARMUP_EPOCHS = 10.0
    cfg.SOLVER.WARMUP_START_LR = 0.01
    assert lr_policy.get_lr_at_epoch(cfg, 0.0) == pytest.approx(0.01)
    # warmup is linear to the policy LR at warmup end
    end = lr_policy.lr_func_cosine(cfg, 10.0)
    mid = lr_policy.get_lr_at_epoch(cfg, 5.0)
    assert mid == pytest.approx((0.01 + end) / 2)


def test_lr_steps_policy():
    cfg = get_cfg()
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.SOLVER.STEPS = [0, 20, 40]
    cfg.SOLVER.LRS = [1.0, 0.1, 0.01]
    cfg.SOLVER.BASE_LR = 0.2
    cfg.SOLVER.MAX_EPOCH = 60
    assert lr_policy.get_lr_at_epoch(cfg, 5.0) == pytest.approx(0.2)
    assert lr_policy.get_lr_at_epoch(cfg, 25.0) == pytest.approx(0.02)
    assert lr_policy.get_lr_at_epoch(cfg, 45.0) == pytest.approx(0.002)


@pytest.mark.parametrize("stages", [[], [2], [2, 3]])
def test_remat_stages_is_semantic_noop(rng, stages):
    """TPU.REMAT_STAGES selects which ResStages rematerialize; remat is a
    pure memory/FLOPs trade, so the train loss must be bit-identical to the
    un-rematerialized step for every selection."""
    def one_loss(remat, sel):
        cfg = get_cfg()
        cfg.MODEL.MODEL_NAME = "SlowFast"
        cfg.MODEL.ARCH = "slowfast"
        cfg.RESNET.DEPTH = 18
        cfg.DATA.NUM_FRAMES = 8
        cfg.DATA.CROP_SIZE = 32
        cfg.SLOWFAST.ALPHA = 4
        cfg.SLOWFAST.BETA_INV = 8
        cfg.MODEL.NUM_CLASSES = 4
        cfg.MODEL.DROPOUT_RATE = 0.0
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
        cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
        cfg.RESNET.SPATIAL_DILATIONS = [[1, 1]] * 4
        cfg.NONLOCAL.LOCATION = [[[], []]] * 4
        cfg.NONLOCAL.GROUP = [[1, 1]] * 4
        cfg.NONLOCAL.POOL = [[[1, 2, 2], [1, 2, 2]]] * 4
        cfg.TPU.REMAT = remat
        cfg.TPU.REMAT_STAGES = sel
        model = build_model(cfg)
        state, tx = create_train_state(cfg, model, rng)
        step = make_train_step(cfg, model, tx)
        inputs = [jax.random.normal(rng, x.shape)
                  for x in pathway_inputs(cfg, 2)]
        labels = jnp.arange(2) % 4
        state, mets = step(state, inputs, labels, 0.01, rng)
        state, mets = step(state, inputs, labels, 0.01, rng)
        return float(mets["loss"])

    base = one_loss(False, [])
    got = one_loss(True, stages)
    assert got == pytest.approx(base, rel=1e-6), (stages, base, got)


def test_sgd_matches_torch_momentum(rng):
    """One SGD+momentum+wd step must match torch.optim.SGD semantics."""
    import torch

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    g = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    lr, mom, wd = 0.1, 0.9, 1e-2

    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SGD([tw], lr=lr, momentum=mom, weight_decay=wd, nesterov=True)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(g.copy())
        opt.step()
    ref = tw.detach().numpy()

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.MOMENTUM = mom
    cfg.SOLVER.NESTEROV = True
    cfg.SOLVER.WEIGHT_DECAY = wd
    cfg.SOLVER.BASE_LR = lr
    cfg.BN.WEIGHT_DECAY = 0.0
    params = {"dense": {"kernel": jnp.asarray(w0.copy())}}
    tx, opt_state = construct_optimizer(cfg, params)
    import optax

    for _ in range(3):
        opt_state = opt_state._replace(
            hyperparams={**opt_state.hyperparams, "learning_rate": jnp.asarray(lr)}
        )
        updates, opt_state = tx.update(
            {"dense": {"kernel": jnp.asarray(g.copy())}}, opt_state, params
        )
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]), ref,
                               rtol=1e-5, atol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """TPU.CHECKPOINT_BACKEND=orbax: async sharded save + auto-resume
    restore produce the identical train state (the production multi-host
    checkpoint path)."""
    import jax
    import numpy as np

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.engine.state import create_train_state
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.utils import checkpoint as cu

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.CHECKPOINT_BACKEND = "orbax"
    cfg.OUTPUT_DIR = str(tmp_path)

    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))

    path = cu.save_checkpoint(str(tmp_path), state, epoch=3, cfg=cfg)
    assert path.endswith(".orbax")
    cu.wait_for_saves()
    assert cu.get_last_checkpoint(str(tmp_path)) == path
    # cfg sidecar written by the master process
    assert (tmp_path / "checkpoints" / "cfg_epoch_00004.yaml").exists()

    fresh, _ = create_train_state(cfg, model, jax.random.PRNGKey(7))
    restored, epoch = cu.load_checkpoint(path, fresh)
    assert epoch == 3
    lhs = jax.tree_util.tree_leaves(state.params)
    rhs = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(lhs, rhs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    sl = jax.tree_util.tree_leaves(state.batch_stats)
    rl = jax.tree_util.tree_leaves(restored.batch_stats)
    for a, b in zip(sl, rl):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # auto-resume path picks the orbax dir
    cfg.TRAIN.AUTO_RESUME = True
    resumed, start_epoch = cu.load_train_checkpoint(cfg, fresh)
    assert start_epoch == 4


def test_orbax_restore_tolerates_optimizer_change(tmp_path):
    """Resuming an orbax checkpoint with a different solver must keep the
    model weights and warn on opt_state (msgpack-path parity)."""
    import jax
    import numpy as np

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.engine.state import create_train_state
    from efficient_slowfast_tpu.models import build_model
    from efficient_slowfast_tpu.utils import checkpoint as cu

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFastShuffleNetV2"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.SLOWFAST.WIDTH_MULTI = 0.25
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.CHECKPOINT_BACKEND = "orbax"
    cfg.OUTPUT_DIR = str(tmp_path)

    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
    path = cu.save_checkpoint(str(tmp_path), state, epoch=1, cfg=cfg)
    cu.wait_for_saves()

    cfg.SOLVER.OPTIMIZING_METHOD = "adam"  # different opt_state tree
    other, _ = create_train_state(cfg, model, jax.random.PRNGKey(9))
    restored, epoch = cu.load_checkpoint(path, other)
    assert epoch == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_grad_accum_matches_manual_microbatching(rng):
    """TPU.GRAD_ACCUM_STEPS=2 must equal the hand-rolled reference: two
    sequential half-batch grad computations with BN batch stats threaded
    through, gradients AVERAGED, ONE optimizer update (torch-style
    accumulation semantics; VERDICT r3 next #8 probe)."""
    import optax

    cfg = small_cfg()
    cfg.MODEL.DROPOUT_RATE = 0.0
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, rng)

    cfg2 = small_cfg()
    cfg2.MODEL.DROPOUT_RATE = 0.0
    cfg2.TPU.GRAD_ACCUM_STEPS = 2
    cfg2.TPU.DONATE = False
    step2 = make_train_step(cfg2, model, tx)

    k = jax.random.PRNGKey(7)
    inputs = [jax.random.normal(k, x.shape) for x in pathway_inputs(cfg, 4)]
    labels = jnp.arange(4) % 4
    new_state, mets = step2(state, inputs, labels, 0.05, k)

    # manual two-microbatch reference with identical rng folding
    from efficient_slowfast_tpu.models.losses import get_loss_func

    loss_fn = get_loss_func(cfg.MODEL.LOSS_FUNC)
    folded = jax.random.fold_in(k, state.step)

    def loss_of(params, bstats, mi, ml, idx):
        def f(p):
            out, ms = model.apply(
                {"params": p, "batch_stats": bstats}, mi, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(folded, idx)})
            return loss_fn(out, ml), ms
        (loss, ms), grads = jax.value_and_grad(f, has_aux=True)(params)
        return loss, grads, ms["batch_stats"]

    @jax.jit
    def manual(params, bstats0, opt_state0):
        l0, g0, bstats = loss_of(params, bstats0,
                                 [p[:2] for p in inputs], labels[:2], 0)
        l1, g1, bstats = loss_of(params, bstats,
                                 [p[2:] for p in inputs], labels[2:], 1)
        grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g0, g1)
        opt_state0 = opt_state0._replace(hyperparams={
            **opt_state0.hyperparams,
            "learning_rate": jnp.asarray(0.05, jnp.float32)})
        updates, _ = tx.update(grads, opt_state0, params)
        return optax.apply_updates(params, updates), bstats, (l0 + l1) / 2.0

    ref_params, ref_bstats, ref_loss = manual(
        state.params, state.batch_stats, state.opt_state)

    # jitted-scan vs jitted-unrolled reference: conv algorithm/fusion
    # choices leave sub-1e-3-relative f32 noise through the BN stack; the
    # semantic failure modes this guards against (unthreaded BN stats,
    # summed instead of averaged grads, a second optimizer step) diverge
    # at >1e-1 relative
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(ref_bstats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)
    np.testing.assert_allclose(float(mets["loss"]), float(ref_loss),
                               rtol=1e-4)
    assert int(new_state.step) == 1


def test_optimizer_state_bf16_placement(rng):
    """TPU.OPTIMIZER_STATE_DTYPE=bfloat16 stores the SGD momentum (and adam
    moments) in bf16 — half the optimizer-state HBM — while updates still
    compute in f32 (models/optimizer.py::cast_moment_state)."""
    cfg = small_cfg()
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.TPU.OPTIMIZER_STATE_DTYPE = "bfloat16"
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, rng)

    moment_dtypes = {
        l.dtype for l in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
        and l.ndim > 0
    }
    assert moment_dtypes == {jnp.dtype(jnp.bfloat16)}, moment_dtypes

    step = make_train_step(cfg, model, tx)
    inputs = [jax.random.normal(rng, x.shape) for x in pathway_inputs(cfg, 4)]
    labels = jnp.arange(4) % 4
    losses = []
    for _ in range(5):
        state, mets = step(state, inputs, labels, 0.02, rng)
        losses.append(float(mets["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0], losses
