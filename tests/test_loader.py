"""Prefetch loader tests."""

import numpy as np
import pytest

from eeg_image_decode_tpu.data.loader import PrefetchLoader


def test_prefetch_loader_covers_epoch(rng):
    n = 50
    arrays = {"x": rng.normal(size=(n, 4)).astype(np.float32),
              "y": np.arange(n, dtype=np.int32)}
    loader = PrefetchLoader(arrays, batch_size=8, seed=0)
    assert len(loader) == 6
    seen = []
    for batch in loader.epoch(0):
        assert batch["x"].shape == (8, 4)
        seen.extend(np.asarray(batch["y"]).tolist())
    assert len(seen) == 48 and len(set(seen)) == 48  # no duplicates


def test_prefetch_loader_deterministic_per_epoch(rng):
    arrays = {"y": np.arange(32, dtype=np.int32)}
    l1 = PrefetchLoader(arrays, batch_size=8, seed=3)
    a = [np.asarray(b["y"]) for b in l1.epoch(0)]
    b = [np.asarray(b["y"]) for b in l1.epoch(0)]
    c = [np.asarray(b["y"]) for b in l1.epoch(1)]
    np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
    assert not np.array_equal(np.concatenate(a), np.concatenate(c))


def test_prefetch_loader_length_mismatch():
    with pytest.raises(ValueError):
        PrefetchLoader({"a": np.zeros(4), "b": np.zeros(5)}, batch_size=2)
