"""PrefetchLoader tests: ordering, backpressure, error propagation."""

import time

import numpy as np
import pytest

from teochat_tpu.data.loader import PrefetchLoader


class SlowDataset:
    def __init__(self, n, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError("boom")
        time.sleep(0.002)
        return i


def test_order_preserved():
    ds = SlowDataset(23)
    loader = PrefetchLoader(ds, collate=list, batch_size=4, num_workers=4)
    batches = list(loader)
    assert len(batches) == 5  # drop_last
    flat = [i for b in batches for i in b]
    assert flat == list(range(20))


def test_keep_last_partial():
    ds = SlowDataset(10)
    loader = PrefetchLoader(ds, collate=list, batch_size=4, drop_last=False)
    batches = list(loader)
    assert len(batches) == 3 and len(batches[-1]) == 2
    assert len(loader) == 3


def test_custom_sampler_order():
    ds = SlowDataset(8)
    order = [7, 6, 5, 4, 3, 2, 1, 0]
    loader = PrefetchLoader(ds, collate=list, batch_size=2, sampler=order)
    flat = [i for b in loader for i in b]
    assert flat == order


def test_error_propagates():
    ds = SlowDataset(8, fail_at=3)
    loader = PrefetchLoader(ds, collate=list, batch_size=4, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)
