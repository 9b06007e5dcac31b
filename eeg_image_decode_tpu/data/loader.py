"""Host-side prefetching batch loader.

The default trainers keep the whole dataset in HBM (4.2 GB THINGS-EEG fits on
one v5e). For datasets that don't fit — multi-subject joint training at
10×4.2 GB, or the un-averaged VAE split — this loader streams batches from
host RAM with a two-stage pipeline:

1. **Batch assembly** (``src[idx]`` row gather) runs on the native C++
   worker pool (``native/eid_loader.cpp`` via ``data/native_loader.py``):
   submitted asynchronously for ``buffer_size`` batches ahead, so the gather
   for batch ``i+k`` overlaps both the device compute *and* the host→device
   transfer of earlier batches. numpy fancy indexing is single-threaded and
   would block the dispatch thread for exactly that long.
2. **Transfer**: ``jax.device_put`` is async — while the device computes
   step ``i``, batch ``i+1`` is already on the bus.

The reference's answer to the same problem is DataLoader worker processes
(``num_workers=64`` in the prior notebook, SURVEY.md §2.2); here it is
threads in one process — no fork, no pickle, shared memory by construction —
with a transparent numpy fallback when no C++ toolchain is available.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np

import jax

from eeg_image_decode_tpu.data.native_loader import GatherPool, shared_pool


class PrefetchLoader:
    """Iterate shuffled batches of a dict of host arrays, prefetching
    ``buffer_size`` device batches ahead.

    Gathers run on the process-wide shared native pool by default
    (``gather_threads > 0`` builds a private pool, released by ``close()``).
    """

    def __init__(
        self,
        arrays: dict[str, np.ndarray],
        batch_size: int,
        *,
        seed: int = 0,
        drop_remainder: bool = True,
        buffer_size: int = 2,
        sharding: Any | None = None,
        gather_threads: int = 0,
        host_dtype: str | np.dtype | None = None,
    ):
        """``host_dtype`` (e.g. ``"bfloat16"``) stores the FLOAT arrays
        host-side in that dtype, halving both the gather row bytes and the
        host→device transfer per batch — the whole streaming mode exists
        because data movement is the constraint (PCIe on real hosts, the
        tunnel here). Integer arrays (labels, indices) are untouched; the
        device step upcasts to its compute dtype as usual."""
        if host_dtype is not None:
            import ml_dtypes  # jax dependency; provides numpy bfloat16

            dt = (np.dtype(ml_dtypes.bfloat16)
                  if str(host_dtype) == "bfloat16" else np.dtype(host_dtype))
            arrays = {
                k: (v.astype(dt) if np.issubdtype(v.dtype, np.floating)
                    else v)
                for k, v in arrays.items()
            }
        n = {len(v) for v in arrays.values()}
        if len(n) != 1:
            raise ValueError(f"arrays disagree on length: { {k: len(v) for k, v in arrays.items()} }")
        self.n = n.pop()
        self.batch_size = batch_size
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.buffer_size = max(1, buffer_size)
        self.sharding = sharding
        self._own_pool = gather_threads > 0
        self._pool = (
            GatherPool(gather_threads) if self._own_pool else shared_pool()
        )
        # the native engine gathers raw rows — operands must be contiguous;
        # the numpy fallback handles any layout in place
        self.arrays = (
            {k: np.ascontiguousarray(v) for k, v in arrays.items()}
            if self._pool.is_native
            else dict(arrays)
        )
        # staging slots cycle; slot s holds batch i where i % n_slots == s.
        # In-flight bookkeeping lives on the INSTANCE (not the epoch
        # generator) so a new epoch — or an abandoned one — first quiesces
        # outstanding gathers/transfers before any slot is rewritten.
        self._n_slots = self.buffer_size + 1
        self._slots = [
            {
                k: np.empty((batch_size,) + v.shape[1:], v.dtype)
                for k, v in self.arrays.items()
            }
            for _ in range(self._n_slots)
        ]
        self._pending: dict[int, list[int]] = {}
        self._device_batches: dict[int, dict[str, jax.Array]] = {}

    @property
    def is_native(self) -> bool:
        return self._pool.is_native

    def __len__(self) -> int:
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def _quiesce(self) -> None:
        """Wait out every outstanding gather and device transfer so the
        staging slots are safe to rewrite (start of each epoch).

        ``block_until_ready`` is the correct PJRT barrier for transfer
        completion on real TPU hosts. (Known dev-harness caveat: this
        machine's remote-device runtime can return early from
        block_until_ready when several *executions* are queued — see
        docs/PERF.md. Streaming correctness is additionally pinned by the
        loss-trajectory parity tests, which run where the barrier is
        sound.)"""
        for tickets in self._pending.values():
            for t in tickets:
                self._pool.wait(t)
        self._pending.clear()
        for batch in self._device_batches.values():
            for v in batch.values():
                v.block_until_ready()
        self._device_batches.clear()

    def close(self) -> None:
        self._quiesce()
        if self._own_pool:
            self._pool.close()

    def epoch(self, epoch: int) -> Iterator[dict[str, jax.Array]]:
        self._quiesce()
        rng = np.random.default_rng(self.seed * 100003 + epoch)
        perm = rng.permutation(self.n)
        n_batches = len(self)
        pending = self._pending
        device_batches = self._device_batches

        def submit(i: int) -> None:
            slot = self._slots[i % self._n_slots]
            prior = i - self._n_slots
            if prior in device_batches:
                # the async put of the batch that used this slot must be done
                for v in device_batches.pop(prior).values():
                    v.block_until_ready()
            idx = perm[i * self.batch_size : (i + 1) * self.batch_size]
            pending[i] = [
                self._pool.submit(self.arrays[k], idx, slot[k])
                for k in self.arrays
            ]

        def put(i: int) -> dict[str, jax.Array]:
            for t in pending.pop(i):
                self._pool.wait(t)
            slot = self._slots[i % self._n_slots]
            real = len(
                perm[i * self.batch_size : (i + 1) * self.batch_size]
            )
            out = {}
            for k, staged in slot.items():
                host = staged if real == self.batch_size else staged[:real]
                out[k] = (
                    jax.device_put(host, self.sharding)
                    if self.sharding is not None
                    else jax.device_put(host)
                )
            device_batches[i] = out
            return out

        # prime: gathers for the first buffer_size batches start immediately
        for i in range(min(self.buffer_size, n_batches)):
            submit(i)
        for i in range(n_batches):
            batch = put(i)  # gather submitted buffer_size yields ago → done
            if i + self.buffer_size < n_batches:
                submit(i + self.buffer_size)  # runs during consumer compute
            yield batch
