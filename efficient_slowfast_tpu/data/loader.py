"""Host feeder: batching + threaded prefetch + device placement.

Replaces the reference's torch DataLoader worker processes + DistributedSampler
(reference: slowfast/datasets/loader.py:55-137) with:

- per-host index sharding (multi-host: each jax process loads 1/NUM_SHARDS of
  the global batch; reference's DistributedSampler equivalent),
- a thread pool decoding samples ahead of time into a bounded queue,
- device placement with the batch axis sharded over the mesh's "data" axis —
  the jitted preprocess + step consume device arrays and never stall on host.

The per-epoch shuffle is seeded (epoch, RNG_SEED) like
``loader.shuffle_dataset → sampler.set_epoch`` (reference: loader.py:119-137).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from .build import build_dataset


def shard_indices(indices: np.ndarray, process_count: int,
                  process_index: int) -> tuple:
    """Split a global sample order across hosts; never silently drops data.

    Every host receives exactly ``ceil(n / process_count)`` indices so all
    hosts execute the same number of jitted steps (an SPMD requirement —
    uneven step counts would hang the compiled collectives). When
    ``n % process_count != 0`` the order is wrap-padded with its head (the
    same policy as the reference's DistributedSampler,
    reference: slowfast/datasets/loader.py:104) and assigned round-robin, so
    each host's duplicates land at the TAIL of its list. Returns
    ``(host_indices, n_valid)`` where positions ``>= n_valid`` are the
    wrapped duplicates — eval masks them out so no sample is double-counted.
    """
    indices = np.asarray(indices)
    n = len(indices)
    pc = max(int(process_count), 1)
    pi = int(process_index)
    assert 0 <= pi < pc, (pi, pc)
    if pc == 1:
        return indices, n
    assert n > 0, "cannot shard an empty dataset"
    per = -(-n // pc)  # ceil
    # tile (np.resize) so padding works even when n < pc
    padded = np.resize(indices, per * pc)
    host = padded[pi::pc]
    # host pi holds global positions {pi + k*pc}; positions >= n are the
    # wrapped duplicates, and since positions increase with k they form
    # the TAIL of the host's list
    n_valid = max(0, -(-(n - pi) // pc)) if pi < n else 0
    return host, n_valid


def construct_loader(cfg, split: str):
    assert split in ("train", "val", "test")
    from ..parallel.mesh import per_host_batch_divisor

    divisor = per_host_batch_divisor(cfg)
    pad_to_full = False
    if split == "train":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE // cfg.NUM_SHARDS
        shuffle, drop_last = True, True
        if batch_size % divisor:
            raise ValueError(
                f"TRAIN.BATCH_SIZE per host ({batch_size}) must be divisible "
                f"by the data-axis shard size ({divisor}); adjust "
                f"TRAIN.BATCH_SIZE or TPU.DATA_AXIS."
            )
    elif split == "val":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE // cfg.NUM_SHARDS
        shuffle, drop_last = False, False
        pad_to_full = True
    else:
        dataset_name = cfg.TEST.DATASET
        batch_size = cfg.TEST.BATCH_SIZE // cfg.NUM_SHARDS
        shuffle, drop_last = False, False
        pad_to_full = True
    if pad_to_full and batch_size % divisor:
        # Round eval batches up to a shardable size; the tail of every batch
        # is padding flagged by the `_valid` mask, so (unlike a silent drop)
        # every sample is still evaluated exactly once
        # (reference: slowfast/datasets/loader.py:55-116 never drops eval data).
        batch_size = ((batch_size + divisor - 1) // divisor) * divisor
    dataset = build_dataset(dataset_name, cfg, split)
    batch_size_schedule = None
    if split == "train" and cfg.MULTIGRID.SHORT_CYCLE:
        from ..utils.multigrid import short_cycle_batch_sizes

        batch_size_schedule = [
            b // cfg.NUM_SHARDS for b in short_cycle_batch_sizes(cfg)
        ]
    return ClipLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=cfg.DATA_LOADER.NUM_WORKERS,
        prefetch=cfg.DATA_LOADER.PREFETCH_DEPTH,
        seed=cfg.RNG_SEED,
        batch_size_schedule=batch_size_schedule,
        pad_to_full=pad_to_full,
    )


class ClipLoader:
    """Iterable over collated numpy batches with background decode threads."""

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=False,
                 num_workers=4, prefetch=2, seed=0, batch_size_schedule=None,
                 pad_to_full=False):
        self.dataset = dataset
        self.batch_size = max(1, batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        # short-cycle: batch sizes cycled per iteration
        # (reference: datasets/multigrid_helper.py ShortCycleBatchSampler)
        self.batch_size_schedule = batch_size_schedule
        # pad every batch to exactly `batch_size` samples (repeating the last
        # index) and emit a `_valid` {1,0} mask — keeps one compiled shape and
        # one shardable batch size while never dropping eval samples
        self.pad_to_full = pad_to_full
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """reference: loader.shuffle_dataset → sampler.set_epoch."""
        self._epoch = epoch

    def __len__(self):
        import jax

        n = len(self.dataset)
        n = -(-n // max(jax.process_count(), 1))  # per-host share (wrap-padded)
        if self.batch_size_schedule:
            return len(self._schedule_batches(np.arange(n)))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _schedule_batches(self, indices):
        """Split indices into batches following the cycling size schedule;
        each batch carries its phase index as `_phase`."""
        batches = []
        pos = 0
        i = 0
        sched = self.batch_size_schedule
        while pos < len(indices):
            bs = sched[i % len(sched)]
            chunk = indices[pos: pos + bs]
            if len(chunk) < bs and self.drop_last:
                break
            batches.append((i % len(sched), chunk))
            pos += bs
            i += 1
        return batches

    def _indices(self) -> tuple:
        """Per-host (indices, n_valid); positions >= n_valid are wrap-padding."""
        n = len(self.dataset)
        idx = np.arange(n)
        weights = getattr(self.dataset, "sample_weights", None)
        if self.shuffle and weights is not None:
            # weighted random sampling with replacement
            # (reference: MODEL.WEIGHTED_RANDOM_SAMPLER, custom_config.py)
            rs = np.random.RandomState(self.seed + self._epoch)
            p = np.asarray(weights, np.float64)
            idx = rs.choice(n, size=n, replace=True, p=p / p.sum())
        elif self.shuffle:
            rs = np.random.RandomState(self.seed + self._epoch)
            rs.shuffle(idx)
        # per-host shard (multi-host data parallelism)
        import jax

        return shard_indices(idx, jax.process_count(), jax.process_index())

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices, n_valid = self._indices()
        # wrap-padded multi-host duplicates sit at the tail (shard_indices)
        sample_valid = np.arange(len(indices)) < n_valid
        if self.batch_size_schedule:
            batches = self._schedule_batches(indices)
            batches = [
                (ph, chunk, np.ones(len(chunk), bool)) for ph, chunk in batches
            ]
        else:
            nb = len(indices) // self.batch_size
            if not self.drop_last and len(indices) % self.batch_size:
                nb += 1
            batches = [
                (None,
                 indices[i * self.batch_size:(i + 1) * self.batch_size],
                 sample_valid[i * self.batch_size:(i + 1) * self.batch_size])
                for i in range(nb)
            ]
        if not batches:
            return

        out_q: "queue.Queue[Optional[tuple]]" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        # preallocated-batch fast path: workers paste frames straight into
        # the batch array (skips per-clip canvas alloc + np.stack — two
        # full passes over the frame bytes). Only taken when the dataset
        # does NOT override __getitem__ (getitem_into routes through the
        # base _fetch, so a custom __getitem__ would silently be bypassed).
        fill = None
        if not self.batch_size_schedule:
            base = type(self.dataset).__getitem__
            from .datasets import ClipDataset

            if (isinstance(self.dataset, ClipDataset)
                    and base is ClipDataset.__getitem__):
                fill = self.dataset.getitem_into

        def produce():
            try:
                for phase, batch_idx, batch_valid in batches:
                    if stop.is_set():
                        return
                    n_real = len(batch_idx)
                    if self.pad_to_full and n_real < self.batch_size:
                        pad = np.full(self.batch_size - n_real, batch_idx[-1])
                        batch_idx = np.concatenate([batch_idx, pad])
                    if fill is not None:
                        frames = np.empty(
                            (len(batch_idx),) + self.dataset.frames_shape(),
                            np.uint8)
                        scalars = list(pool.map(
                            lambda ji: fill(int(ji[1]), frames[ji[0]]),
                            enumerate(batch_idx)))
                        collated = _collate(scalars)
                        collated["frames"] = frames
                    else:
                        samples = list(
                            pool.map(lambda i: self.dataset[int(i)], batch_idx)
                        )
                        collated = _collate(samples)
                    if self.pad_to_full:
                        # invalid = batch-tail padding OR multi-host wrap dups
                        mask = np.zeros(len(batch_idx), np.float32)
                        mask[:n_real] = batch_valid.astype(np.float32)
                        collated["_valid"] = mask
                    if phase is not None:
                        collated["_phase"] = np.int32(phase)
                    out_q.put(("batch", collated))
            except BaseException as exc:  # propagate to the consumer thread
                out_q.put(("error", exc))
            finally:
                out_q.put(None)
                pool.shutdown(wait=False)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                kind, payload = item
                if kind == "error":
                    raise payload
                yield payload
        finally:
            stop.set()
            _drain_queue(out_q, t)


def _drain_queue(q, thread) -> None:
    """Unblock a producer stuck in q.put() after a consumer early-exit.

    Without this, breaking out of the iterator leaves the producer thread
    blocked forever on the full queue (leaking the worker pool plus the
    prefetched frame batches it holds).
    """
    while thread.is_alive():
        try:
            q.get_nowait()
        except queue.Empty:
            thread.join(timeout=0.05)


def _collate(samples) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0].keys():
        out[k] = np.stack([s[k] for s in samples])
    return out


def shuffle_dataset(loader: ClipLoader, cur_epoch: int):
    """reference: loader.py:119-137."""
    loader.set_epoch(cur_epoch)


def prefetch_to_device(loader, mesh,
                       keys=("frames", "width", "label", "portrait",
                             "crop_u"),
                       depth: int = 2, host_copy=()):
    """Iterate `loader`, device_put-ing the next batches ahead of consumption.

    Overlaps host→device transfer with device compute (the TPU equivalent of
    the reference's pin_memory + cuda(non_blocking=True),
    reference: tools/train_net.py:51-65). Non-tensor keys pass through on host.
    Keys in ``host_copy`` are placed on device AND retained on host under
    ``<key>_host`` — for values consumed by the jitted step that the caller
    also needs host-side (fetching them back off the device would pay a
    D2H round-trip for data the loader already produced on the host).
    """
    import queue as _queue
    import threading as _threading

    from ..parallel.mesh import shard_batch

    q: "_queue.Queue" = _queue.Queue(maxsize=max(1, depth))
    stop = _threading.Event()

    def produce():
        try:
            for batch in loader:
                if stop.is_set():
                    return
                device_part = shard_batch(
                    mesh, {k: batch[k] for k in keys if k in batch}
                )
                host_part = {k: v for k, v in batch.items() if k not in keys}
                for k in host_copy:
                    if k in batch:
                        host_part[f"{k}_host"] = batch[k]
                q.put(("batch", (device_part, host_part)))
        except BaseException as exc:  # propagate to the consumer thread
            q.put(("error", exc))
        finally:
            q.put(None)

    t = _threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            kind, payload = item
            if kind == "error":
                raise payload
            dev, host = payload
            dev.update(host)
            yield dev
    finally:
        stop.set()
        _drain_queue(q, t)
