"""Loader padding / masking / error-propagation regression tests.

Covers the round-1 silent-truncation bug: eval batches whose size is not a
multiple of the device count must be padded (with a `_valid` mask) rather
than crashing the producer thread and silently ending the epoch
(reference never drops eval data: slowfast/datasets/loader.py:55-116).
"""

import numpy as np
import pytest

from efficient_slowfast_tpu.config import get_cfg
from efficient_slowfast_tpu.data.loader import ClipLoader, construct_loader


class _ArrayDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2, 2), i, np.float32), "index": np.int64(i)}


class _FailingDataset(_ArrayDataset):
    def __getitem__(self, i):
        if i == 5:
            raise ValueError("decode failed for sample 5")
        return super().__getitem__(i)


def test_pad_to_full_masks_tail_batch():
    loader = ClipLoader(_ArrayDataset(30), batch_size=8, pad_to_full=True)
    batches = list(loader)
    assert len(batches) == 4
    # every batch is full-size (single compiled shape) with a mask
    for b in batches:
        assert b["x"].shape[0] == 8
        assert b["_valid"].shape == (8,)
    # every real sample appears exactly once among the valid rows
    seen = np.concatenate(
        [b["index"][b["_valid"] > 0] for b in batches]
    )
    assert sorted(seen.tolist()) == list(range(30))
    # mask accounting: 30 valid, 2 pad
    assert sum(float(b["_valid"].sum()) for b in batches) == 30.0
    assert float(batches[-1]["_valid"].sum()) == 6.0


def test_no_padding_when_divisible():
    loader = ClipLoader(_ArrayDataset(16), batch_size=8, pad_to_full=True)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert float(b["_valid"].sum()) == 8.0


def test_producer_exception_propagates():
    loader = ClipLoader(_FailingDataset(16), batch_size=8)
    with pytest.raises(ValueError, match="decode failed"):
        list(loader)


def test_prefetch_propagates_producer_exception():
    import jax

    from efficient_slowfast_tpu.data.loader import prefetch_to_device
    from efficient_slowfast_tpu.parallel.mesh import build_mesh

    mesh = build_mesh()
    loader = ClipLoader(_FailingDataset(16), batch_size=8)
    with pytest.raises(ValueError, match="decode failed"):
        list(prefetch_to_device(loader, mesh, keys=("x",)))


def test_construct_loader_pads_test_batches(tmp_path):
    """TEST.BATCH_SIZE=30 on 8 devices → batches rounded to 32 + mask."""
    import jax

    cfg = get_cfg()
    cfg.TEST.DATASET = "synthetic"
    cfg.TRAIN.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.TEST.BATCH_SIZE = 30
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.OUTPUT_DIR = str(tmp_path)
    loader = construct_loader(cfg, "test")
    dc = jax.device_count()
    assert loader.batch_size % dc == 0
    total_valid = 0
    total_rows = 0
    for b in loader:
        assert b["frames"].shape[0] % dc == 0
        total_valid += int(b["_valid"].sum())
        total_rows += b["frames"].shape[0]
    assert total_valid == len(loader.dataset)
    assert total_rows % dc == 0


def test_construct_loader_rejects_indivisible_train_batch(tmp_path):
    import jax

    dc = jax.device_count()
    if dc == 1:
        pytest.skip("needs >1 device to make an indivisible batch")
    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.TRAIN.BATCH_SIZE = dc + 1
    cfg.OUTPUT_DIR = str(tmp_path)
    with pytest.raises(ValueError, match="divisible"):
        construct_loader(cfg, "train")


# ---------------------------------------------------------------------------
# Multi-host sharding (VERDICT #7): the per-host index math must never drop
# the n % process_count tail, and all hosts must see equal step counts.
# ---------------------------------------------------------------------------

from efficient_slowfast_tpu.data.loader import shard_indices


@pytest.mark.parametrize("n,pc", [
    (30, 1), (30, 2), (30, 8),   # 30 % 8 = 6 → remainder tail
    (31, 2), (17, 8), (8, 8), (7, 8), (1, 2), (240, 8),
    (3, 8), (1, 8), (2, 3),      # n < pc: some hosts get only duplicates
])
def test_shard_indices_cover_all_samples_exactly_once(n, pc):
    order = np.random.RandomState(0).permutation(n)
    per_host = [shard_indices(order, pc, pi) for pi in range(pc)]
    lengths = {len(h) for h, _ in per_host}
    assert lengths == {-(-n // pc)}, "hosts must run equal step counts"
    valid_union = np.concatenate([h[:nv] for h, nv in per_host])
    # every sample exactly once across hosts' valid prefixes
    assert sorted(valid_union.tolist()) == sorted(order.tolist())
    # padding (if any) duplicates real indices and sits at the tail
    for h, nv in per_host:
        assert nv <= len(h)
        assert set(h[nv:].tolist()) <= set(order.tolist())


def test_shard_indices_single_host_identity():
    idx = np.arange(13)
    out, nv = shard_indices(idx, 1, 0)
    assert nv == 13 and np.array_equal(out, idx)


def test_loader_multihost_valid_mask(monkeypatch):
    """On a 2-host eval split of 9 samples, host 1's wrap duplicate must be
    masked invalid so it is never double-ensembled."""
    import jax

    for pi in (0, 1):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        loader = ClipLoader(_ArrayDataset(9), batch_size=5, pad_to_full=True)
        assert len(loader) == 1
        batches = list(loader)
        assert len(batches) == 1
        b = batches[0]
        assert b["x"].shape[0] == 5
        # host0: 5 valid of 5; host1: 4 valid + 1 wrap duplicate
        assert float(b["_valid"].sum()) == (5.0 if pi == 0 else 4.0)
        if pi == 1:
            assert b["_valid"][-1] == 0.0


def test_gather_across_hosts_unaligned(monkeypatch):
    """Stubbed process_allgather: variable per-host row counts concatenate to
    the full set (the reference's all_gather_unaligned semantics)."""
    import importlib

    import jax

    test_engine = importlib.import_module("efficient_slowfast_tpu.engine.test")

    host_rows = {0: 3, 1: 5}  # unaligned
    world = {
        pi: (np.arange(nr * 4, dtype=np.float32).reshape(nr, 4) + 100 * pi,
             (np.arange(nr) + 100 * pi).astype(np.int64),
             (np.arange(nr) * 2 + 100 * pi).astype(np.float64))
        for pi, nr in host_rows.items()
    }

    for pi in (0, 1):
        monkeypatch.setattr(jax, "process_count", lambda: 2)

        def fake_allgather(x, tiled=False):
            # emulate: every host contributes its own (equal-shaped) array;
            # arrays are disambiguated by dtype/ndim
            x = np.asarray(x)
            if x.ndim == 0:  # the count gather
                return np.asarray([host_rows[0], host_rows[1]])
            outs = []
            m = x.shape[0]
            for p in (0, 1):
                full = next(a for a in world[p]
                            if a.ndim == x.ndim and a.dtype == x.dtype)
                pad = [(0, m - host_rows[p])] + [(0, 0)] * (x.ndim - 1)
                outs.append(np.pad(full, pad))
            return np.stack(outs)

        import jax.experimental.multihost_utils as mhu

        monkeypatch.setattr(mhu, "process_allgather", fake_allgather)
        preds, labels, ids = world[pi]
        g_preds, g_labels, g_ids = test_engine.gather_across_hosts(
            preds, labels, ids)
        assert g_preds.shape == (8, 4)
        assert g_labels.shape == (8,) and g_ids.shape == (8,)
        # host order preserved, no padding rows leak through
        np.testing.assert_array_equal(g_labels[:3], world[0][1])
        np.testing.assert_array_equal(g_labels[3:], world[1][1])


def test_consumer_early_exit_stops_producer():
    """Breaking out of the iterator must unblock and finish the producer
    thread (it was left blocked on the full prefetch queue forever)."""
    import threading

    before = threading.active_count()
    loader = ClipLoader(_ArrayDataset(200), batch_size=4, prefetch=2)
    for i, _ in enumerate(loader):
        if i >= 1:
            break  # early exit with the queue full
    # generator finalization drains the queue and joins the producer
    deadline = 50
    while threading.active_count() > before and deadline:
        import time

        time.sleep(0.02)
        deadline -= 1
    assert threading.active_count() <= before + 1  # pool threads may linger


def test_decode_failure_in_test_mode_raises(tmp_path, monkeypatch):
    """Test mode must fail loudly on an undecodable clip instead of
    substituting a random video (which double-counts in the TestMeter)."""
    import pytest as _pytest

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset

    cfg = get_cfg()
    cfg.TEST.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.DATA.NUM_FRAMES = 4
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    ds = build_dataset("synthetic", cfg, "test")
    monkeypatch.setattr(type(ds), "_decode_clip", lambda self, i, t: None)
    with _pytest.raises(RuntimeError, match="Failed to fetch"):
        ds[0]

    # train mode still substitutes (reference kinetics.py:192-255)
    ds_train = build_dataset("synthetic", cfg, "train")
    calls = []
    orig = type(ds_train).__mro__[1]._decode_clip  # ClipDataset impl

    def flaky(self, i, t):
        calls.append(i)
        return None if len(calls) < 5 else orig(self, i, t)

    monkeypatch.setattr(type(ds_train), "_decode_clip", flaky)
    item = ds_train[0]
    assert "label" in item and len(calls) >= 5


def test_synthetic_clips_learnable_and_deterministic():
    """The synthetic dataset must be learnable by memorization: clips carry
    a label-keyed global color watermark (datasets.py::_decode_clip) so the
    int8 accuracy proxy (bench.py::_int8_accuracy_proxy) trains to
    confident, class-peaked logits. Content must also be a deterministic
    function of video id — NOT hash(path), which PYTHONHASHSEED would
    randomize across loader workers and multi-host peers."""
    import numpy as np

    from efficient_slowfast_tpu.config import get_cfg
    from efficient_slowfast_tpu.data.build import build_dataset

    cfg = get_cfg()
    cfg.TRAIN.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.DATA.NUM_FRAMES = 4
    cfg.MODEL.NUM_CLASSES = 4
    ds = build_dataset("synthetic", cfg, "train")

    # same video id decodes identically in a fresh dataset instance
    ds2 = build_dataset("synthetic", cfg, "train")
    np.testing.assert_array_equal(
        ds._decode_clip(0, 0), ds2._decode_clip(0, 0))

    # per-class mean colors are well separated; within-class (different
    # videos, same label) they agree closely — the signal survives any
    # crop because it is global
    means = {}
    for idx in range(16):  # videos 0..15, labels idx % 4
        clip = ds._decode_clip(idx * ds._num_clips, 0)
        means.setdefault(idx % 4, []).append(clip.mean(axis=(0, 1, 2)))
    centroids = np.stack([np.mean(means[c], axis=0) for c in range(4)])
    for c in range(4):
        spread = np.abs(np.stack(means[c]) - centroids[c]).max()
        assert spread < 3.0, f"class {c} within-class spread {spread}"
    dists = np.abs(centroids[:, None] - centroids[None, :]).max(-1)
    np.fill_diagonal(dists, np.inf)
    assert dists.min() > 8.0, f"classes not separable: {dists.min()}"


def test_multiview_decode_memo_dedupes_and_matches(monkeypatch):
    """Test-mode 30-view protocol: the 3 spatial crops of one temporal view
    share ONE decode (the reference decodes the same pts window once per
    item, kinetics.py:66-110 enumeration) — 3x less host decode with
    bit-identical batches."""
    from efficient_slowfast_tpu.data.build import build_dataset
    from efficient_slowfast_tpu.data.datasets import ClipDataset

    cfg = get_cfg()
    cfg.TEST.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.DATA.NUM_FRAMES = 4
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 3
    ds = build_dataset("synthetic", cfg, "test")

    calls = []
    orig = ClipDataset._decode_clip

    def spy(self, i, t):
        calls.append((self._path_to_videos[i], t))
        return orig(self, i, t)

    monkeypatch.setattr(ClipDataset, "_decode_clip", spy)
    batches = list(ClipLoader(ds, batch_size=6, num_workers=4))

    n_videos = len(ds) // 6  # 2 views x 3 crops per video
    assert sum(b["frames"].shape[0] for b in batches) == len(ds)
    # one decode per (video, temporal view), NOT per spatial crop
    assert len(calls) == n_videos * 2
    assert len(set(calls)) == len(calls)

    # bit-equality vs the memo-less path
    ds2 = build_dataset("synthetic", cfg, "test")
    ds2._test_decode_memo = None
    batches2 = list(ClipLoader(ds2, batch_size=6, num_workers=4))
    assert len(batches) == len(batches2)
    for b1, b2 in zip(batches, batches2):
        for k in b1:
            np.testing.assert_array_equal(b1[k], b2[k])


def test_multiview_memo_does_not_cache_failures(monkeypatch):
    """A failed decode (None) must not be memoized: the retry loop has to
    genuinely re-attempt the same video in test mode."""
    from efficient_slowfast_tpu.data.build import build_dataset
    from efficient_slowfast_tpu.data.datasets import ClipDataset

    cfg = get_cfg()
    cfg.TEST.DATASET = "synthetic"
    cfg.DATA.DECODING_BACKEND = "synthetic"
    cfg.DATA.NUM_FRAMES = 4
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    ds = build_dataset("synthetic", cfg, "test")

    calls = []
    orig = ClipDataset._decode_clip

    def flaky(self, i, t):
        calls.append(i)
        return None if len(calls) < 3 else orig(self, i, t)

    monkeypatch.setattr(ClipDataset, "_decode_clip", flaky)
    item = ds[0]
    assert "label" in item
    assert len(calls) >= 3  # two real retries hit the decoder again


def test_decode_memo_concurrent_single_flight():
    """Concurrent requests for one key run the decode exactly once; all
    callers get the same (read-only) array."""
    import threading

    from efficient_slowfast_tpu.data.datasets import _DecodeMemo

    memo = _DecodeMemo(capacity=2)
    n_calls = []
    gate = threading.Event()

    def slow_decode():
        gate.wait(2.0)
        n_calls.append(1)
        return np.arange(12, dtype=np.uint8).reshape(1, 2, 2, 3)

    out = [None] * 4

    def worker(j):
        out[j] = memo.get_or_compute(("vid", 0), slow_decode)

    threads = [threading.Thread(target=worker, args=(j,)) for j in range(4)]
    for t in threads:
        t.start()
    gate.set()
    for t in threads:
        t.join()
    assert len(n_calls) == 1
    assert all(o is out[0] for o in out)
    assert not out[0].flags.writeable

    # capacity eviction keeps the memo bounded
    for k in range(5):
        memo.get_or_compute(("vid", k + 1),
                            lambda: np.zeros((1, 1, 1, 3), np.uint8))
    assert len(memo._entries) <= 2
