"""Bench the native C++ gather engine vs numpy on THINGS-EEG batch shapes.

Measures the host-side batch-assembly step the PrefetchLoader pipelines:
gathering 1024 rows of (63, 250) fp32 out of the full 66160-row training
tensor. Every measurement uses a FRESH permutation per rep (cache-cold, the
loader's real access pattern — with a reused index the second rep reads
mostly from L3 and flatters both sides).

Measured on this machine: numpy 14.3 ms/batch cold (single-threaded, blocks
the dispatch thread); native pool 8.7 ms cold (1.65x) and asynchronous —
pipelined behind 12 ms of consumer work only ~2.8 ms stays exposed.

Run: python scripts/bench_loader.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eeg_image_decode_tpu.data.native_loader import (  # noqa: E402
    GatherPool,
    build_error,
    native_available,
)

N, BATCH = 66160, 1024
REPS = 12


def main():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(N, 63, 250)).astype(np.float32)
    idxs = [rng.permutation(N)[:BATCH] for _ in range(3 * REPS)]
    it = iter(idxs)
    dst = np.empty((BATCH, 63, 250), np.float32)
    mb = BATCH * 63 * 250 * 4 / 1e6

    def best(fn, reps=REPS):
        ts = []
        for _ in range(reps):
            idx = next(it)
            t0 = time.perf_counter()
            fn(idx)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_np = best(lambda idx: src[idx])
    print(f"numpy fancy index : {t_np*1e3:7.2f} ms  {mb/t_np/1e3:5.1f} GB/s")

    if not native_available():
        print(f"native unavailable: {build_error()}")
        return
    pool = GatherPool()
    t_nat = best(lambda idx: pool.wait(pool.submit(src, idx, dst)))
    print(
        f"native pool       : {t_nat*1e3:7.2f} ms  {mb/t_nat/1e3:5.1f} GB/s"
        f"  ({t_np/t_nat:.2f}x numpy, and asynchronous)"
    )

    # pipelined: submit-ahead like the loader. With consumer work per batch
    # >= the cold gather time, the exposed wait should be ~0.
    consumer_ms = max(12.0, t_nat * 1e3 * 1.2)
    pip_idxs = [rng.permutation(N)[:BATCH] for _ in range(REPS)]
    dsts = [np.empty_like(dst) for _ in range(3)]
    tickets = {}
    for i in range(2):
        tickets[i] = pool.submit(src, pip_idxs[i], dsts[i % 3])
    exposed = []
    for i in range(REPS):
        t0 = time.perf_counter()
        pool.wait(tickets.pop(i))
        exposed.append(time.perf_counter() - t0)
        if i + 2 < REPS:
            tickets[i + 2] = pool.submit(src, pip_idxs[i + 2], dsts[(i + 2) % 3])
        time.sleep(consumer_ms / 1e3)
    steady = exposed[2:]
    print(
        f"pipelined exposed : {np.mean(steady)*1e3:7.2f} ms/batch behind "
        f"{consumer_ms:.0f} ms of consumer work "
        f"(vs {t_np*1e3:.1f} ms the numpy path always exposes)"
    )
    pool.close()


if __name__ == "__main__":
    main()
