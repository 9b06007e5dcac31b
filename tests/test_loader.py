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


def test_prefetch_loader_batches_match_numpy_indexing(rng):
    """Native-gather staging must produce exactly src[perm[i*B:(i+1)*B]]."""
    n = 37
    arrays = {"x": rng.normal(size=(n, 3, 5)).astype(np.float32),
              "y": np.arange(n, dtype=np.int32)}
    loader = PrefetchLoader(arrays, batch_size=5, seed=7,
                            drop_remainder=False)
    perm = np.random.default_rng(7 * 100003 + 2).permutation(n)
    for i, batch in enumerate(loader.epoch(2)):
        idx = perm[i * 5 : (i + 1) * 5]
        np.testing.assert_array_equal(np.asarray(batch["y"]), arrays["y"][idx])
        np.testing.assert_array_equal(np.asarray(batch["x"]), arrays["x"][idx])
    loader.close()


def test_native_gather_matches_numpy(rng):
    from eeg_image_decode_tpu.data.native_loader import GatherPool

    pool = GatherPool()
    src = rng.normal(size=(200, 17)).astype(np.float32)
    idx = rng.integers(0, 200, size=64)
    np.testing.assert_array_equal(pool.gather(src, idx), src[idx])
    # async path with several in-flight tickets
    dsts = [np.empty((64, 17), np.float32) for _ in range(4)]
    idxs = [rng.integers(0, 200, size=64) for _ in range(4)]
    tickets = [pool.submit(src, i, d) for i, d in zip(idxs, dsts)]
    for t, i, d in zip(tickets, idxs, dsts):
        pool.wait(t)
        np.testing.assert_array_equal(d, src[i])
    pool.close()


def test_npy_mmap_reads_numpy_file(rng, tmp_path):
    from eeg_image_decode_tpu.data.native_loader import NpyMmap

    for dtype in (np.float32, np.float64, np.int32):
        arr = (rng.normal(size=(11, 6, 4)) * 100).astype(dtype)
        p = str(tmp_path / f"a_{np.dtype(dtype).name}.npy")
        np.save(p, arr)
        m = NpyMmap(p)
        assert m.array.shape == arr.shape and m.array.dtype == arr.dtype
        np.testing.assert_array_equal(np.asarray(m.array), arr)
        m.willneed()
        m.close()


def test_npy_mmap_rejects_truncated_file(rng, tmp_path):
    """A half-written cache (shorter than the header promises) must fail
    through the catchable np.load fallback, not SIGBUS on first page touch."""
    from eeg_image_decode_tpu.data.native_loader import NpyMmap

    arr = rng.normal(size=(100, 64)).astype(np.float32)
    p = str(tmp_path / "full.npy")
    np.save(p, arr)
    with open(p, "rb") as f:
        blob = f.read()
    t = str(tmp_path / "truncated.npy")
    with open(t, "wb") as f:
        f.write(blob[: len(blob) // 2])
    # the native reader must refuse the short file; the numpy fallback then
    # raises a normal Python exception at construction — never a SIGBUS
    with pytest.raises(Exception):
        NpyMmap(t)


def test_shared_pool_reused_across_loaders():
    from eeg_image_decode_tpu.data.native_loader import shared_pool

    arrays = {"x": np.arange(40, dtype=np.float32).reshape(10, 4)}
    l1 = PrefetchLoader(arrays, batch_size=5)
    l2 = PrefetchLoader(arrays, batch_size=5)
    assert l1._pool is l2._pool is shared_pool()
    l1.close(); l2.close()  # must NOT kill the shared pool
    l3 = PrefetchLoader(arrays, batch_size=5)
    b = next(iter(l3.epoch(0)))
    assert np.asarray(b["x"]).shape == (5, 4)
    l3.close()


def test_epoch_restart_quiesces_slots(rng):
    """Starting a new epoch (or abandoning one mid-way) must not corrupt
    batches via staging-slot reuse races."""
    arrays = {"x": rng.normal(size=(64, 8)).astype(np.float32),
              "y": np.arange(64, dtype=np.int32)}
    loader = PrefetchLoader(arrays, batch_size=8, seed=5)
    it = loader.epoch(0)
    next(it); next(it)  # abandon mid-epoch with gathers in flight
    perm = np.random.default_rng(5 * 100003 + 1).permutation(64)
    for i, batch in enumerate(loader.epoch(1)):
        idx = perm[i * 8 : (i + 1) * 8]
        np.testing.assert_array_equal(np.asarray(batch["y"]), arrays["y"][idx])
        np.testing.assert_array_equal(np.asarray(batch["x"]), arrays["x"][idx])
    loader.close()


def test_native_gather_edge_cases(rng):
    from eeg_image_decode_tpu.data.native_loader import GatherPool

    pool = GatherPool()
    src = rng.normal(size=(50, 9)).astype(np.float32)
    # zero-length gather: the C++ path completes the ticket immediately
    dst = np.empty((4, 9), np.float32)
    t = pool.submit(src, np.asarray([], dtype=np.int64), dst)
    pool.wait(t)
    # dst larger than idx: only the first len(idx) rows are written
    marker = np.full((4, 9), -1.0, np.float32)
    idx = np.asarray([3, 7], np.int64)
    pool.wait(pool.submit(src, idx, marker))
    np.testing.assert_array_equal(marker[:2], src[idx])
    np.testing.assert_array_equal(marker[2:], -1.0)
    # non-contiguous source: submit takes a contiguous copy transparently
    nc = src[:, ::3]
    assert not nc.flags["C_CONTIGUOUS"]
    out = pool.gather(nc, np.asarray([0, 5, 5], np.int64))
    np.testing.assert_array_equal(out, nc[[0, 5, 5]])
    pool.close()


def test_npy_mmap_fortran_order_falls_back(rng, tmp_path):
    from eeg_image_decode_tpu.data.native_loader import NpyMmap

    arr = np.asfortranarray(rng.normal(size=(6, 8)).astype(np.float32))
    p = str(tmp_path / "f.npy")
    np.save(p, arr)
    m = NpyMmap(p)
    assert not m.is_native  # native reader only does C-contiguous
    np.testing.assert_array_equal(np.asarray(m.array), arr)
    m.close()


def test_gather_pool_concurrent_submitters(rng):
    """Race-hardening evidence for the native engine (SURVEY §5 row): many
    Python threads hammer ONE shared pool with interleaved submit/wait on
    overlapping source rows; every result must equal numpy's gather. Runs
    against whichever backend is available (native C++ or numpy fallback)."""
    import threading

    from eeg_image_decode_tpu.data.native_loader import GatherPool

    src = rng.normal(size=(512, 7, 11)).astype(np.float32)
    pool = GatherPool()
    errors = []

    def worker(seed):
        r = np.random.default_rng(seed)
        try:
            for _ in range(25):
                # out-of-order waits: submit a burst, wait in reverse
                batch = [
                    r.integers(0, len(src), size=int(r.integers(1, 64)))
                    for _ in range(4)
                ]
                dsts = [
                    np.empty((len(ix),) + src.shape[1:], src.dtype)
                    for ix in batch
                ]
                tickets = [
                    pool.submit(src, ix, dst)
                    for ix, dst in zip(batch, dsts)
                ]
                for t in reversed(tickets):
                    pool.wait(t)
                for ix, dst in zip(batch, dsts):
                    np.testing.assert_array_equal(dst, src[ix])
        except Exception as e:  # surface across the thread boundary
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    pool.close()
    assert not errors, errors[0]
