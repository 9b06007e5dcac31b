"""Host-side prefetching batch loader.

The default trainers keep the whole dataset in HBM (4.2 GB THINGS-EEG fits on
one v5e). For datasets that don't fit — multi-subject joint training at
10×4.2 GB, or the un-averaged VAE split — this loader streams batches from
host RAM with double buffering: while the device computes step ``i``, batch
``i+1`` is already being transferred (``jax.device_put`` is async). The
reference's answer to the same problem is DataLoader worker processes
(``num_workers=64`` in the prior notebook, SURVEY.md §2.2); on TPU hosts a
single process with async transfers saturates PCIe without the fork overhead.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np

import jax


class PrefetchLoader:
    """Iterate shuffled batches of a dict of host arrays, prefetching
    ``buffer_size`` device batches ahead."""

    def __init__(
        self,
        arrays: dict[str, np.ndarray],
        batch_size: int,
        *,
        seed: int = 0,
        drop_remainder: bool = True,
        buffer_size: int = 2,
        sharding: Any | None = None,
    ):
        n = {len(v) for v in arrays.values()}
        if len(n) != 1:
            raise ValueError(f"arrays disagree on length: { {k: len(v) for k, v in arrays.items()} }")
        self.n = n.pop()
        self.arrays = arrays
        self.batch_size = batch_size
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.buffer_size = max(1, buffer_size)
        self.sharding = sharding

    def __len__(self) -> int:
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def epoch(self, epoch: int) -> Iterator[dict[str, jax.Array]]:
        rng = np.random.default_rng(self.seed * 100003 + epoch)
        perm = rng.permutation(self.n)
        n_batches = len(self)

        def put(i):
            idx = perm[i * self.batch_size : (i + 1) * self.batch_size]
            batch = {k: v[idx] for k, v in self.arrays.items()}
            if self.sharding is not None:
                return {
                    k: jax.device_put(v, self.sharding) for k, v in batch.items()
                }
            return {k: jax.device_put(v) for k, v in batch.items()}

        # prime the pipeline: device_put returns immediately (async transfer)
        buf = [put(i) for i in range(min(self.buffer_size, n_batches))]
        for i in range(n_batches):
            if i + self.buffer_size < n_batches:
                buf.append(put(i + self.buffer_size))
            yield buf.pop(0)
