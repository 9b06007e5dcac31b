"""Bench host-side MVNN whitening vs the reference's per-epoch approach.

The reference computes a Ledoit-Wolf covariance per epoch with sklearn
inside a conditions × reps Python loop (``preprocessing_utils.py:160-178``)
— the preprocessing hot spot (minutes per subject over 4 sessions). The
framework's ``ledoit_wolf_cov_batched`` runs all epochs as chunked batched
BLAS gemms. This measures both on one reference-shaped training session
(1654 conditions × 2 reps, 63 ch, 250 samples) and checks they agree.

Run: python scripts/bench_preprocess.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eeg_image_decode_tpu.preprocess.mvnn import (  # noqa: E402
    ledoit_wolf_cov_batched,
    matrix_inverse_sqrt,
    mvnn_whiten,
)


def main():
    rng = np.random.default_rng(0)
    n_cond, n_rep, C, T = 1654, 2, 63, 250
    session = rng.normal(size=(n_cond, n_rep, C, T)).astype(np.float32)
    x = session.reshape(-1, C, T).transpose(0, 2, 1)  # (N, T, C)

    t0 = time.perf_counter()
    covs = ledoit_wolf_cov_batched(x)
    t_batched = time.perf_counter() - t0
    print(f"batched LW covariance ({x.shape[0]} epochs): {t_batched:.3f} s")

    try:
        from sklearn.covariance import ledoit_wolf as sk_lw
    except ImportError:
        print("sklearn unavailable — skipping reference loop")
        return
    # reference-style per-epoch loop (time a slice, extrapolate)
    n_probe = 200
    t0 = time.perf_counter()
    ref = [sk_lw(x[i])[0] for i in range(n_probe)]
    t_loop = (time.perf_counter() - t0) / n_probe * x.shape[0]
    print(
        f"per-epoch sklearn loop (extrapolated from {n_probe}): "
        f"{t_loop:.2f} s  → batched is {t_loop / t_batched:.0f}x"
    )
    np.testing.assert_allclose(covs[:n_probe], np.stack(ref), atol=1e-5)
    print("numerics: batched == sklearn per-epoch (atol 1e-5)")

    sigma = covs.mean(axis=0)
    t0 = time.perf_counter()
    matrix_inverse_sqrt(sigma)
    print(f"matrix inverse sqrt (63x63 eigh): {time.perf_counter()-t0:.4f} s")

    test = rng.normal(size=(200, 20, C, T)).astype(np.float32)
    t0 = time.perf_counter()
    mvnn_whiten([session], [test])
    print(f"full-session mvnn_whiten (cov + whitening both splits): "
          f"{time.perf_counter()-t0:.2f} s")


if __name__ == "__main__":
    main()
