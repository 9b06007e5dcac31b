"""Multivariate noise normalization (MVNN) — whitening by the inverse
matrix square root of the average epoch covariance.

Rebuilds ``EEG-preprocessing/preprocessing_utils.py:116-196`` without the
MNE/sklearn/scipy dependency chain:

- per-condition covariance = mean over epochs of the Ledoit-Wolf-shrunk
  channel covariance of each epoch (``mvnn_dim='epochs'``, ref ``:173-177``;
  LW is what sklearn's ``_cov(..., shrinkage='auto')`` computes)
- session covariance = mean over conditions, **training partition only**
  (ref ``:183`` — the author's fairness fix)
- whitener = Σ^{-1/2} via symmetric eigendecomposition with clamped
  eigenvalues (numerically safer than ``scipy.linalg.fractional_matrix_power``
  on near-singular Σ — SURVEY.md §7 hard parts), fp64 on host.
"""

from __future__ import annotations

import numpy as np


def ledoit_wolf_cov(x: np.ndarray) -> np.ndarray:
    """Ledoit-Wolf shrunk covariance of (n_samples, n_features) data.

    Implements the LW 2004 oracle-approximating shrinkage exactly as
    sklearn's ``ledoit_wolf`` (validated against it in tests):
    Σ_lw = (1−δ)·S + δ·μ·I with δ = min(β/Δ, 1).
    """
    x = np.asarray(x, np.float64)
    n, p = x.shape
    x = x - x.mean(axis=0, keepdims=True)
    s = x.T @ x / n
    mu = np.trace(s) / p

    # Δ = ||S − μI||_F² / p
    delta = ((s - mu * np.eye(p)) ** 2).sum() / p
    # β̂ = (1/n²)·Σ_k ||x_k x_kᵀ − S||_F² / p, computed without the k-loop
    x2 = x**2
    beta_raw = (x2.T @ x2).sum() / n - (s**2).sum()
    beta = beta_raw / (n * p)
    shrinkage = 0.0 if delta == 0 else float(np.clip(beta / delta, 0.0, 1.0))
    return (1.0 - shrinkage) * s + shrinkage * mu * np.eye(p)


def ledoit_wolf_cov_batched(x: np.ndarray, chunk: int = 256) -> np.ndarray:
    """Batched :func:`ledoit_wolf_cov`: (N, n_samples, n_features) →
    (N, n_features, n_features). Batched BLAS gemms instead of a per-epoch
    Python loop, processed in chunks so the fp64 temporaries stay
    cache-sized (measured ~5x the reference's per-epoch sklearn loop on a
    full THINGS train session — scripts/bench_preprocess.py; tested equal
    to the scalar version)."""
    x = np.asarray(x)
    n_total, n, p = x.shape
    eye = np.eye(p)
    out = np.empty((n_total, p, p), np.float64)
    for i in range(0, n_total, chunk):
        # explicit copy: the in-place centering/squaring below must never
        # alias the caller's buffer (np.asarray(fp64_view) would)
        xi = np.array(x[i : i + chunk], np.float64)
        xi -= xi.mean(axis=1, keepdims=True)
        s = np.matmul(xi.transpose(0, 2, 1), xi)
        s /= n
        mu = np.trace(s, axis1=1, axis2=2) / p
        delta = ((s - mu[:, None, None] * eye) ** 2).sum(axis=(1, 2)) / p
        # Σ_ij Σ_n x²[n,i]·x²[n,j] = Σ_n (Σ_i x²[n,i])² — O(n·p), not O(n·p²)
        np.multiply(xi, xi, out=xi)
        row2 = xi.sum(axis=2)
        beta_raw = (row2**2).sum(axis=1) / n - (s**2).sum(axis=(1, 2))
        beta = beta_raw / (n * p)
        with np.errstate(divide="ignore", invalid="ignore"):
            shrinkage = np.where(delta == 0, 0.0, beta / delta)
        shrinkage = np.clip(shrinkage, 0.0, 1.0)
        out[i : i + chunk] = (
            (1.0 - shrinkage)[:, None, None] * s
            + (shrinkage * mu)[:, None, None] * eye
        )
    return out


def matrix_inverse_sqrt(sigma: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Σ^{-1/2} for symmetric PSD Σ via eigh with eigenvalue clamping."""
    sigma = np.asarray(sigma, np.float64)
    sigma = 0.5 * (sigma + sigma.T)
    w, v = np.linalg.eigh(sigma)
    w = np.maximum(w, eps * w.max())
    return (v * (w**-0.5)) @ v.T


def session_covariance(epoched: np.ndarray) -> np.ndarray:
    """(conditions, reps, C, T) → (C, C): LW cov per epoch (channels over
    time samples), averaged over reps then conditions (ref ``:160-178``).
    All epochs go through one batched LW (~0.7 s for a full train session
    vs ~3 s for the reference's per-epoch sklearn loop — measured,
    scripts/bench_preprocess.py)."""
    n_cond, n_rep, n_ch, t = epoched.shape
    x = epoched.reshape(n_cond * n_rep, n_ch, t).transpose(0, 2, 1)  # (N,T,C)
    covs = ledoit_wolf_cov_batched(x)
    # mean over reps then conditions ≡ overall mean (equal rep counts)
    return covs.mean(axis=0)


def mvnn_whiten(
    epoched_train: list[np.ndarray],
    epoched_test: list[np.ndarray],
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Whiten each session's train+test epochs with that session's
    train-partition Σ^{-1/2} (ref ``:148-193``). Input arrays are
    (conditions, reps, C, T) per session."""
    out_train, out_test = [], []
    for tr, te in zip(epoched_train, epoched_test):
        sigma_inv = matrix_inverse_sqrt(session_covariance(tr))

        def whiten(x):
            # (..., C, T): apply on the channel axis — (XᵀΣ^{-1/2})ᵀ = Σ^{-1/2}X
            # since Σ^{-1/2} is symmetric (the ref's swapaxes dance, :188-193).
            # Batched np.matmul, NOT einsum: einsum serializes this contraction
            # (~5.5 s/session vs 0.15 s — measured, scripts/bench_preprocess.py).
            # The whitener applies in the data's dtype: promoting the epochs to
            # fp64 costs GBs of temporaries for precision the fp32 output
            # storage rounds away again (Σ^{-1/2} itself IS computed in fp64).
            flat = x.reshape(-1, *x.shape[-2:])
            out = np.matmul(sigma_inv.astype(x.dtype), flat).reshape(x.shape)
            return out.astype(x.dtype)

        out_train.append(whiten(tr))
        out_test.append(whiten(te))
    return out_train, out_test
