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
