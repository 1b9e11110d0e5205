"""Device mesh + sharding layout.

Replaces the reference's per-GPU process spawn / DDP / NCCL stack
(reference: slowfast/utils/multiprocessing.py:9-50, utils/distributed.py,
models/build.py:39-43) with a single-process SPMD program:

- one `jax.sharding.Mesh` with a "data" axis over all devices (ICI within a
  slice, DCN across hosts via jax.distributed),
- the global batch sharded over "data"; parameters/optimizer state replicated,
- gradient reduction compiled into the jitted step by GSPMD (no DDP wrapper,
  no explicit all_reduce calls).

Multi-host (NUM_SHARDS > 1) uses `jax.distributed.initialize`, after which
`jax.devices()` spans all hosts and the same mesh/program runs everywhere.

`TPU.SPATIAL_SHARD = s` (s > 1) adds a second "space" mesh axis and shards
the frame HEIGHT dimension over it — GSPMD inserts the halo exchanges the
spatial convolutions need and reduces BN statistics globally, so the
program is bit-for-bit the same computation at a different layout. This is
the TPU-native escape hatch for activation-bound configs (AVA R101 64x2
style: huge T*H*W activations at tiny per-chip batch) that data
parallelism alone cannot fit; no reference counterpart (the reference is
DDP-only).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def init_distributed(cfg) -> None:
    """Multi-host init (reference NUM_SHARDS/SHARD_ID/init_method contract).

    Must not touch the backend before initialize: jax.process_count()
    (the old idempotence guard) itself initializes XLA, after which
    jax.distributed.initialize refuses to run — so idempotence is handled
    by catching the double-init error instead (found by the real
    2-process test, tests/test_multihost.py).
    """
    if cfg.NUM_SHARDS <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=cfg_init_addr(cfg),
            num_processes=cfg.NUM_SHARDS,
            process_id=cfg.SHARD_ID,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" not in msg and "once" not in msg:
            raise
    _warm_collective_context()


def _warm_collective_context() -> None:
    """Form the all-devices communicator clique while hosts are aligned.

    Collective-context setup bounds cross-host arrival skew — XLA:CPU's
    gloo rendezvous hard-caps it at ~30 s — but the job's first collective
    otherwise fires minutes into a train/eval step, where hosts drift
    freely (compile-cache asymmetry, OS scheduling). One sub-second
    all-device reduction right after the coordination-service rendezvous
    creates the clique when skew is at its minimum; the backend caches
    communicators per clique, so the real steps reuse it. (Observed
    without this: tests/test_multihost.py workers died in gloo context
    init, DEADLINE_EXCEEDED at 30 s.)
    """
    if jax.process_count() <= 1:
        return
    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), (DATA_AXIS,))
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    ones = jax.make_array_from_callback(
        (len(devs),), sharding, lambda idx: np.ones((1,), np.float32))
    host_barrier("collective_warmup", timeout_ms=300_000)
    import jax.numpy as jnp

    total = jax.jit(jnp.sum)(ones)  # sharded → replicated: an all-reduce
    got = float(np.asarray(total.addressable_data(0)))
    if got != float(len(devs)):
        raise RuntimeError(
            f"collective warmup all-reduce returned {got}, expected "
            f"{len(devs)} — cross-host collectives are broken")


_barrier_counts: dict = {}


def host_barrier(name: str, timeout_ms: int = 600_000) -> None:
    """Cross-host rendezvous via the coordination service.

    NOT a device collective: gloo context init tolerates only ~30 s of
    host skew, so device-collective barriers (multihost_utils.
    sync_global_devices) cannot fence phases whose durations differ per
    host — e.g. the master writing a checkpoint while other hosts wait.
    The coordination-service barrier takes an explicit timeout. Barrier
    names are one-shot per job; a per-name sequence number keeps repeat
    calls unique (all hosts call barriers in the same SPMD order).
    No-op single-process.
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    seq = _barrier_counts.get(name, 0)
    _barrier_counts[name] = seq + 1
    client.wait_at_barrier(f"esf_{name}_{seq}", timeout_in_ms=timeout_ms)


def compile_fence(jitfn, name: str = "compile_fence"):
    """Wrap a jitted callable for multi-host use: AOT-compile per input
    signature and host-barrier between compile and first dispatch.

    Collective-context setup at first execution tolerates only a bounded
    cross-host skew (XLA:CPU gloo context init hard-caps it at ~30 s),
    while first-call compiles can diverge by MINUTES across hosts — e.g.
    one host hits the persistent compile cache and another recompiles.
    A plain jit call therefore deadlocks the whole job at its first
    collective (observed in tests/test_multihost.py). Compiling ahead of
    time and fencing on the coordination service absorbs any compile
    skew. Identity when single-process.
    """
    if jax.process_count() <= 1:
        return jitfn
    cache: dict = {}

    def call(*args):
        key = tuple(
            (tuple(np.shape(leaf)),
             str(getattr(leaf, "dtype", type(leaf).__name__)))
            for leaf in jax.tree_util.tree_leaves(args)
        )
        exe = cache.get(key)
        if exe is None:
            exe = jitfn.lower(*args).compile()
            host_barrier(f"compiled_{name}")
            cache[key] = exe
        return exe(*args)

    return call


def fetch_local_rows(arr) -> np.ndarray:
    """This host's contiguous rows of a batch-sharded global array.

    Multi-host eval fetches per-clip outputs to pair them with the
    host-local batch metadata (labels, clip ids, padding mask);
    device_get of the GLOBAL array is not possible (non-addressable
    shards live on other hosts) and would be the wrong rows anyway.
    Identity (full fetch) on a single process.
    """
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(arr))
    if arr.is_fully_replicated:
        # XLA chose to replicate the output: every host holds all rows,
        # but this host's loader only produced its contiguous slice
        # (make_array_from_process_local_data ordering in shard_batch)
        per = arr.shape[0] // jax.process_count()
        start = jax.process_index() * per
        return np.asarray(arr.addressable_data(0))[start:start + per]
    seen = {}
    for s in arr.addressable_shards:  # dedupe partial replication
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    rows = np.concatenate([seen[k] for k in sorted(seen)])
    per = arr.shape[0] // jax.process_count()
    if rows.shape[0] != per:
        # e.g. the compiler sharded a non-batch dim — silently returning
        # these rows would mispair them with host-local metadata
        raise RuntimeError(
            f"fetch_local_rows: reconstructed {rows.shape[0]} rows, "
            f"expected {per} (global {arr.shape[0]} over "
            f"{jax.process_count()} hosts); output is not batch-sharded")
    return rows


def cfg_init_addr(cfg) -> str:
    # parser stores e.g. tcp://host:port; jax wants host:port
    addr = getattr(cfg, "INIT_METHOD", "tcp://localhost:9999")
    return addr.split("://")[-1]


def _spatial_shard(cfg) -> int:
    s = int(cfg.TPU.SPATIAL_SHARD) if cfg is not None else 0
    return s if s > 1 else 1


def build_mesh(cfg=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    s = _spatial_shard(cfg)
    n = len(devices) // s
    if cfg is not None and cfg.TPU.DATA_AXIS:
        n = min(n, cfg.TPU.DATA_AXIS)
    assert n >= 1, (
        f"TPU.SPATIAL_SHARD={s} needs at least {s} devices, "
        f"have {len(devices)}")
    if s > 1:
        # each (data-row × space) group must be host-local so a process's
        # rows carry the FULL height extent (shard_batch feeds full-H local
        # data; cross-host space shards would need H-sliced local data)
        ld = jax.local_device_count()
        assert ld % s == 0, (
            f"TPU.SPATIAL_SHARD={s} must divide the per-host device count "
            f"({ld}) so the space axis stays within a host")
        devices = devices[: n * s]
        return Mesh(np.array(devices).reshape(n, s), (DATA_AXIS, SPACE_AXIS))
    return Mesh(np.array(devices[:n]).reshape(n), (DATA_AXIS,))


def mesh_device_count(cfg=None) -> int:
    """Size of the DATA axis the mesh built by ``build_mesh`` will have.

    Every batch placed via ``shard_batch`` must have its leading axis
    divisible by this (NamedSharding over "data" requires it) — the loader
    pads eval batches to a multiple and validates train batches against it.
    With TPU.SPATIAL_SHARD=s the device pool is split (n//s) × s, so the
    batch divisor SHRINKS by s (that is the point: fewer, larger per-data-
    shard batches whose activations are split over the space axis).
    """
    n = jax.device_count() // _spatial_shard(cfg)
    if cfg is not None and cfg.TPU.DATA_AXIS:
        n = min(n, cfg.TPU.DATA_AXIS)
    return max(n, 1)


def per_host_batch_divisor(cfg=None) -> int:
    """Divisor a per-host batch must satisfy: local share of the data axis."""
    n = mesh_device_count(cfg)
    pc = max(jax.process_count(), 1)
    return max(n // pc, 1)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input pytrees (leading axis over "data")."""
    return NamedSharding(mesh, P(DATA_AXIS))


def frames_sharding(mesh: Mesh, ndim: int, h: int | None = None
                    ) -> NamedSharding:
    """Sharding for a frames tensor (B, T, H, W, C) / (B, T, H, W):
    batch over "data"; on a spatial mesh, HEIGHT over "space" (axis 2 —
    channels-last everywhere, CLAUDE.md). GSPMD propagates the split
    through the conv stack with halo exchanges.

    Pass ``h`` (the axis-2 extent) to fall back to batch-only sharding
    when H does not divide the space axis — raw host canvases have
    arbitrary short-side heights (data/datasets.py), so only the
    preprocessed CROP_SIZE tensors are height-sharded; ``constrain_spatial``
    re-pins the layout at the preprocess output."""
    if SPACE_AXIS in mesh.axis_names and ndim >= 4 and (
            h is None or h % mesh.shape[SPACE_AXIS] == 0):
        spec = [DATA_AXIS, None, SPACE_AXIS] + [None] * (ndim - 3)
        return NamedSharding(mesh, P(*spec))
    return data_sharding(mesh)


def constrain_spatial(cfg, pathways):
    """Inside-jit constraint pinning pathway tensors' HEIGHT to the "space"
    mesh axis when TPU.SPATIAL_SHARD is on (no-op otherwise).

    The device preprocess consumes raw canvases whose H is arbitrary (so
    they ride batch-only, see ``frames_sharding``); its OUTPUT is the fixed
    CROP_SIZE grid, which is where the split-activation layout must start
    for the model to run height-sharded (data/preprocess.py)."""
    if _spatial_shard(cfg) == 1:
        return pathways
    mesh = build_mesh(cfg)
    return [
        jax.lax.with_sharding_constraint(
            x, frames_sharding(mesh, x.ndim, h=x.shape[2]))
        for x in pathways
    ]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Place a host pytree onto the mesh with the batch axis sharded.

    Single-process: a plain ``device_put`` — the host array IS the global
    batch. Multi-process: every host holds only its local rows of the
    global batch (the loader shards indices per host, ``shard_indices``),
    so the global array must be assembled from the process-local data;
    ``device_put`` would misread the local batch as the global one and
    fail the mesh-divisibility check (found by the real 2-process CPU
    test, tests/test_multihost.py).

    ``spatial=True`` additionally shards rank>=4 leaves' HEIGHT over the
    "space" mesh axis — ONLY for tensors already on the fixed CROP_SIZE
    grid (preprocessed pathway tensors fed straight to the model, e.g.
    __graft_entry__). The default is batch-only for everything: raw host
    canvases must ride batch-only regardless of whether their arbitrary
    short-side height happens to divide the space axis — the height
    split is pinned at the jitted preprocess output (constrain_spatial),
    not at device_put (CLAUDE.md / tests/test_spatial_shard.py).
    """
    def sh(x):
        x = x if hasattr(x, "ndim") else np.asarray(x)
        if spatial and x.ndim >= 4:
            return frames_sharding(mesh, x.ndim, h=x.shape[2])
        return data_sharding(mesh)

    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh(x), np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh(x)), batch)
