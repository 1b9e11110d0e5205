"""Train state + jitted step builders.

Replaces the reference's imperative epoch loop internals
(reference: tools/train_net.py:28-162): one jitted function carries
forward + loss + backward + optimizer update + BN-stat update + on-device
metrics. Data parallelism comes from sharding the batch over the mesh's
"data" axis — GSPMD inserts the gradient psum; there is no DDP wrapper and
no per-iteration host sync (metrics are device arrays, fetched every
LOG_PERIOD; reference's per-iter ``.item()`` syncs at train_net.py:133-138
are deliberately absent).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.losses import get_loss_func
from ..models.optimizer import construct_optimizer
from ..parallel.mesh import replicated
from ..utils import metrics as metrics_lib


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def pathway_inputs(cfg, batch_size, dtype=jnp.float32):
    """Zero example inputs [slow, fast] (or [frames]) for init/compile."""
    t = cfg.DATA.NUM_FRAMES
    s = cfg.DATA.CROP_SIZE
    c = cfg.DATA.INPUT_CHANNEL_NUM[0]
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        alpha = cfg.SLOWFAST.ALPHA
        return [
            jnp.zeros((batch_size, t // alpha, s, s, c), dtype),
            jnp.zeros((batch_size, t, s, s, c), dtype),
        ]
    return [jnp.zeros((batch_size, t, s, s, c), dtype)]


def create_train_state(cfg, model, rng, example_inputs=None):
    if example_inputs is None:
        example_inputs = pathway_inputs(cfg, batch_size=2)
    init_args = (example_inputs,)
    if cfg.DETECTION.ENABLE:
        # (R, 5) example rois: [batch_idx, x1, y1, x2, y2]
        rois = jnp.tile(
            jnp.asarray([[0.0, 0.0, 0.0, 8.0, 8.0]], jnp.float32), (4, 1)
        )
        init_args = (example_inputs, rois)
    variables = jax.jit(
        functools.partial(model.init, train=False)
    )({"params": rng, "dropout": rng}, *init_args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx, opt_state = construct_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
    return state, tx


def make_train_step(cfg, model, tx) -> Callable:
    """Jitted (state, inputs, labels, lr, rng) → (state, metrics).

    With ``TPU.GRAD_ACCUM_STEPS`` > 1 the batch is processed as N
    sequential microbatches inside the step (lax.scan): per-microbatch
    forward+backward with BN batch statistics threaded through like N real
    steps, gradients AVERAGED across microbatches, one optimizer update —
    peak activation memory scales with B/N (the round-4 probe for the
    batch sizes that compile-OOM even with remat, PERF.md)."""
    loss_fn = get_loss_func(cfg.MODEL.LOSS_FUNC)
    topk = cfg.TRAIN.TOPK
    donate = cfg.TPU.DONATE
    accum = max(int(cfg.TPU.GRAD_ACCUM_STEPS), 1)
    classify = not cfg.DATA.MULTI_LABEL and not cfg.DETECTION.ENABLE

    def _grad_accum(state, inputs, labels, rng):
        b = labels.shape[0]
        assert b % accum == 0, (
            f"batch {b} not divisible by TPU.GRAD_ACCUM_STEPS={accum}")
        m = b // accum
        mi = tuple(p.reshape((accum, m) + p.shape[1:]) for p in inputs)
        ml = labels.reshape(accum, m)

        def body(carry, xs):
            bstats, gacc, lacc, k1acc, kkacc = carry
            parts, part_labels, idx = xs

            def compute_loss(params):
                out, new_ms = model.apply(
                    {"params": params, "batch_stats": bstats},
                    list(parts),
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(rng, idx)},
                )
                return loss_fn(out, part_labels), (out, new_ms)

            (loss, (preds, new_ms)), grads = jax.value_and_grad(
                compute_loss, has_aux=True)(state.params)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            if classify:
                k1, kk = metrics_lib.topks_correct(preds, part_labels,
                                                   (1, topk))
                k1acc, kkacc = k1acc + k1, kkacc + kk
            return (new_ms.get("batch_stats", bstats), gacc, lacc + loss,
                    k1acc, kkacc), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        init = (state.batch_stats, zeros, jnp.zeros(()), jnp.zeros(()),
                jnp.zeros(()))
        (bstats, gsum, lsum, k1, kk), _ = jax.lax.scan(
            body, init, (mi, ml, jnp.arange(accum)))
        grads = jax.tree_util.tree_map(lambda g: g / accum, gsum)
        return grads, lsum / accum, bstats, (k1, kk)

    def step(state: TrainState, inputs, labels, lr, rng):
        rng = jax.random.fold_in(rng, state.step)

        if accum > 1:
            grads, loss, new_bstats, (k1_, kk_) = _grad_accum(
                state, inputs, labels, rng)
            new_model_state = {"batch_stats": new_bstats}
            preds = None
        else:
            def compute_loss(params):
                out, new_model_state = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    inputs,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                loss = loss_fn(out, labels)
                return loss, (out, new_model_state)

            (loss, (preds, new_model_state)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)

        opt_state = state.opt_state._replace(
            hyperparams={
                **state.opt_state.hyperparams,
                "learning_rate": jnp.asarray(lr, jnp.float32),
            }
        )
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
        )
        mets = {"loss": loss, "lr": jnp.asarray(lr, jnp.float32)}
        if classify:
            if accum > 1:
                k1, kk = k1_, kk_  # summed inside the microbatch scan
            else:
                k1, kk = metrics_lib.topks_correct(preds, labels, (1, topk))
            n = labels.shape[0]
            mets["top1_err"] = (1.0 - k1 / n) * 100.0
            mets[f"top{topk}_err"] = (1.0 - kk / n) * 100.0
        return new_state, mets

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg, model) -> Callable:
    """Jitted (state, inputs, labels[, valid]) → metrics + post-act preds.

    `valid` is the loader's {1,0} padding mask (data/loader.py pad_to_full);
    padded samples are excluded from the error denominators so a padded tail
    batch reports the same metrics the unpadded data would.
    """
    topk = cfg.TRAIN.TOPK

    def step(state: TrainState, inputs, labels, valid=None):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs,
            train=False,
        )
        out = {"preds": preds}
        if not cfg.DATA.MULTI_LABEL and not cfg.DETECTION.ENABLE:
            c1, ck = metrics_lib.topks_correct_per_sample(
                preds, labels, (1, topk)
            )
            if valid is None:
                k1, kk = c1.sum(), ck.sum()
                num_valid = jnp.asarray(preds.shape[0], jnp.float32)
            else:
                v = valid.astype(jnp.float32)
                k1, kk = (c1 * v).sum(), (ck * v).sum()
                num_valid = v.sum()
            n = jnp.maximum(num_valid, 1.0)
            out["top1_err"] = (1.0 - k1 / n) * 100.0
            out[f"top{topk}_err"] = (1.0 - kk / n) * 100.0
            # GLOBAL sample count (jit sees global shapes): the meter
            # weight — hosts must not re-scale it by shard count
            out["num_valid"] = num_valid
        return out

    return jax.jit(step)


def make_forward(cfg, model) -> Callable:
    """Jitted inference forward: (variables, inputs) → preds.

    cfg.TPU.FUSED_EVAL (default off) opts into the fused serving engine
    (folded BN + Pallas bottleneck blocks, engine/inference.py) —
    numerically equivalent, but measured SLOWER end-to-end than XLA's own
    conv fusion on v5e (PERF.md); kept as a tested opt-in.
    """
    if cfg.TPU.FUSED_EVAL:
        # the fused engine never calls model.apply, so it cannot serve the
        # int8 path — refuse rather than silently serving fp as "int8"
        # (assert_and_infer_cfg rejects the combination for CLI runs; this
        # guards direct library use)
        assert not cfg.TPU.INT8_EVAL, (
            "TPU.FUSED_EVAL and TPU.INT8_EVAL are mutually exclusive")
        from .inference import make_fused_eval_forward, supports

        if supports(cfg):
            return make_fused_eval_forward(cfg)

    def fwd(variables, inputs):
        return model.apply(variables, inputs, train=False)

    return jax.jit(fwd)


def shard_state(state: TrainState, mesh) -> TrainState:
    """Replicate train state over the mesh (params/opt state replicated).

    Multi-process: device_put of a host value onto a replicated global
    sharding makes jax verify equality across hosts with a gloo
    allgather PER LEAF — for a full train state that is hundreds of
    cross-host collectives before the first step (slow, and any >30s
    host skew fails gloo context init outright; observed in
    tests/test_multihost.py). The state is deterministic per host
    (seeded init / checkpoint restore), so build the replicated global
    arrays directly from each host's local copy instead.
    """
    rep = replicated(mesh)
    if jax.process_count() > 1:
        import numpy as np

        _verify_state_consistency(state)

        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, rep, lambda idx: x[idx])

        return jax.tree_util.tree_map(put, state)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


_verify_seq = [0]


def _verify_state_consistency(state) -> None:
    """One cross-host checksum in place of device_put's per-leaf allgather.

    Stamping each host's local copy into a "replicated" global array skips
    the equality verification device_put performs — a host that restored a
    different checkpoint (e.g. a torn read while the master rewrites it on
    shared storage) would silently diverge and poison every later metric.
    A single crc32 over all leaves, compared through the coordination
    service, fails loudly instead. The comparison deliberately avoids a
    device collective: shard_state runs right after create_train_state /
    checkpoint restore, where hosts can be minutes apart (compile-cache
    asymmetry), and a fresh gloo context tolerates only ~30 s of skew
    (parallel/mesh.py::host_barrier rationale) — the KV store takes an
    explicit timeout.
    """
    import zlib

    import numpy as np
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    crc = 0
    for leaf in jax.tree_util.tree_leaves(state):
        crc = zlib.crc32(np.asarray(leaf).tobytes(), crc)
    seq = _verify_seq[0]
    _verify_seq[0] += 1
    me = jax.process_index()
    client.key_value_set(f"esf_state_crc_{seq}/{me}", hex(crc))
    for p in range(jax.process_count()):
        other = client.blocking_key_value_get(
            f"esf_state_crc_{seq}/{p}", 600_000)
        if other != hex(crc):
            raise RuntimeError(
                f"shard_state: train-state checksum {hex(crc)} (host {me}) "
                f"!= {other} (host {p}) — hosts restored/initialized "
                f"different state; refusing to replicate divergent copies")


def _flatten_rois(boxes):
    """(B, MAX_BOXES, 4) canvas-pixel boxes → (B*MAX, 5) [batch_idx, x1y1x2y2]."""
    b, m, _ = boxes.shape
    idx = jnp.repeat(jnp.arange(b, dtype=boxes.dtype), m)[:, None]
    return jnp.concatenate([idx, boxes.reshape(b * m, 4)], axis=1)


def make_detection_train_step(cfg, model, tx) -> Callable:
    """AVA detection train step: masked MODEL.LOSS_FUNC over padded boxes.

    The reference RoI head applies its activation in train AND eval
    (head_helper.py:126-129) and feeds that output to whatever loss
    cfg.MODEL.LOSS_FUNC names (tools/train_net.py; AVA configs use "bce" on
    post-sigmoid scores). Same placement here; padded boxes are masked out
    of the mean, so the loss must be elementwise — unsupported loss names
    raise at build time rather than silently training with "bce".

    ``TPU.GRAD_ACCUM_STEPS`` > 1 splits the batch into N sequential
    microbatches (lax.scan) like make_train_step. Unlike the classification
    path, the masked mean makes per-microbatch losses non-uniform weights:
    to reproduce full-batch gradients exactly, the scan accumulates the
    gradient of the UNNORMALIZED masked sum plus the total mask count, and
    divides once at the end — grad(masked_mean over B) == sum_i
    grad(masked_sum over m_i) / total_mask.
    """
    from ..models.losses import get_elementwise_loss_func

    elem_loss_fn = get_elementwise_loss_func(cfg.MODEL.LOSS_FUNC)
    donate = cfg.TPU.DONATE
    accum = max(int(cfg.TPU.GRAD_ACCUM_STEPS), 1)

    def _grad_accum(state, inputs, boxes, labels, mask, rng):
        b = mask.shape[0]
        assert b % accum == 0, (
            f"batch {b} not divisible by TPU.GRAD_ACCUM_STEPS={accum}")
        m = b // accum
        split = lambda x: x.reshape((accum, m) + x.shape[1:])  # noqa: E731
        mi = tuple(split(p) for p in inputs)

        def body(carry, xs):
            bstats, gacc, lacc, macc = carry
            parts, pboxes, plabels, pmask, idx = xs
            rois = _flatten_rois(pboxes)  # microbatch-local batch indices
            flat_labels = plabels.reshape(-1, plabels.shape[-1])
            flat_mask = pmask.reshape(-1)

            def loss_sum(params):
                preds, new_ms = model.apply(
                    {"params": params, "batch_stats": bstats},
                    list(parts), rois, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.fold_in(rng, idx)},
                )
                per_box = elem_loss_fn(preds, flat_labels).mean(axis=-1)
                return (per_box * flat_mask).sum(), new_ms

            (lsum, new_ms), grads = jax.value_and_grad(
                loss_sum, has_aux=True)(state.params)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            return (new_ms.get("batch_stats", bstats), gacc, lacc + lsum,
                    macc + flat_mask.sum()), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        init = (state.batch_stats, zeros, jnp.zeros(()), jnp.zeros(()))
        (bstats, gsum, lsum, msum), _ = jax.lax.scan(
            body, init,
            (mi, split(boxes), split(labels), split(mask),
             jnp.arange(accum)))
        denom = jnp.maximum(msum, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / denom, gsum)
        return grads, lsum / denom, {"batch_stats": bstats}

    def step(state: TrainState, inputs, boxes, labels, mask, lr, rng):
        rng = jax.random.fold_in(rng, state.step)

        if accum > 1:
            grads, loss, new_model_state = _grad_accum(
                state, inputs, boxes, labels, mask, rng)
        else:
            rois = _flatten_rois(boxes)
            flat_labels = labels.reshape(-1, labels.shape[-1])
            flat_mask = mask.reshape(-1)

            def compute_loss(params):
                preds, new_model_state = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    inputs, rois, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                per_box = elem_loss_fn(preds, flat_labels).mean(axis=-1)
                loss = (per_box * flat_mask).sum() / jnp.maximum(
                    flat_mask.sum(), 1.0)
                return loss, (preds, new_model_state)

            (loss, (preds, new_model_state)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
        opt_state = state.opt_state._replace(
            hyperparams={**state.opt_state.hyperparams,
                         "learning_rate": jnp.asarray(lr, jnp.float32)}
        )
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params,
            batch_stats=new_model_state.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
        )
        return new_state, {"loss": loss, "lr": jnp.asarray(lr, jnp.float32)}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_detection_forward(cfg, model) -> Callable:
    """Jitted (variables, inputs, boxes) → per-box class scores."""

    def fwd(variables, inputs, boxes):
        rois = _flatten_rois(boxes)
        return model.apply(variables, inputs, rois, train=False)

    return jax.jit(fwd)
