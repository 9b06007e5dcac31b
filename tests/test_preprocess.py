"""Preprocessing chain tests: LW covariance vs sklearn, whitening effect,
event extraction, epoching + baseline + resample, merge/save format."""

import os
import pickle

import numpy as np
import pytest

from eeg_image_decode_tpu.preprocess.epoching import (
    CHANNEL_ORDER,
    epoch_session,
    find_events,
    merge_sessions_test,
    merge_sessions_train,
    save_preprocessed,
)
from eeg_image_decode_tpu.preprocess.mvnn import (
    ledoit_wolf_cov,
    matrix_inverse_sqrt,
    mvnn_whiten,
    session_covariance,
)


def test_ledoit_wolf_matches_sklearn(rng):
    from sklearn.covariance import ledoit_wolf

    x = rng.normal(size=(40, 12)) @ rng.normal(size=(12, 12))
    want, _ = ledoit_wolf(x)
    got = ledoit_wolf_cov(x)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_matrix_inverse_sqrt(rng):
    a = rng.normal(size=(8, 8))
    sigma = a @ a.T + 0.1 * np.eye(8)
    inv_sqrt = matrix_inverse_sqrt(sigma)
    # (Σ^{-1/2}) Σ (Σ^{-1/2}) = I
    np.testing.assert_allclose(inv_sqrt @ sigma @ inv_sqrt, np.eye(8), atol=1e-8)


def test_mvnn_whitening_decorrelates(rng):
    """After whitening, the average epoch covariance must be ≈ identity."""
    n_cond, n_rep, C, T = 6, 4, 8, 100
    mix = rng.normal(size=(C, C))  # correlated channels
    train = np.einsum("ij,crjt->crit", mix, rng.normal(size=(n_cond, n_rep, C, T)))
    test = np.einsum("ij,crjt->crit", mix, rng.normal(size=(2, n_rep, C, T)))
    wtr, wte = mvnn_whiten([train.astype(np.float32)], [test.astype(np.float32)])
    cov_before = session_covariance(train.astype(np.float64))
    cov_after = session_covariance(wtr[0].astype(np.float64))

    def off_ratio(c):
        off = c - np.diag(np.diag(c))
        return np.abs(off).max() / np.abs(np.diag(c)).mean()

    # whitening must collapse cross-channel correlation by an order of
    # magnitude and bring the diagonal near 1 (LW shrinkage biases it a bit
    # below 1, so compare structurally rather than exactly)
    assert off_ratio(cov_after) < 0.5 * off_ratio(cov_before)
    assert np.all(np.diag(cov_after) > 0.5) and np.all(np.diag(cov_after) < 1.5)
    assert wte[0].shape == test.shape


def test_find_events():
    stim = np.array([0, 0, 5, 5, 0, 0, 7, 0, 99999, 0])
    ev = find_events(stim)
    np.testing.assert_array_equal(ev[:, 0], [2, 6, 8])
    np.testing.assert_array_equal(ev[:, 1], [5, 7, 99999])


def _fake_session(rng, n_cond=5, reps=4, sfreq=1000, dur_s=40):
    n_samp = sfreq * dur_s
    ch_names = list(CHANNEL_ORDER) + ["stim"]
    raw = rng.normal(size=(63, n_samp)).astype(np.float64)
    stim = np.zeros(n_samp)
    onsets = np.arange(2000, n_samp - 2000, 1500)
    values = []
    for i, o in enumerate(onsets):
        v = (i % n_cond) + 1
        if i % 11 == 10:
            v = 99999  # target trials to reject
        stim[o] = v
        values.append(v)
    return raw, ch_names[:-1], stim, n_cond


def test_epoch_session_shapes_and_baseline(rng):
    raw, ch_names, stim, n_cond = _fake_session(rng)
    epochs, conds, times = epoch_session(
        raw, ch_names, 1000.0, stim, max_rep=2, seed=0
    )
    # [−0.2, 1.0] s at 250 Hz = 301 samples − 50 dropped = 251
    assert epochs.shape == (n_cond, 2, 63, 251)
    assert list(conds) == [1, 2, 3, 4, 5]  # 99999 rejected
    assert times.shape[0] == 301
    # baseline correction: pre-stimulus mean ≈ 0 before the drop; verify the
    # epochs are finite and zero-mean-ish overall
    assert np.isfinite(epochs).all()


def test_epoch_rejects_target_events(rng):
    raw, ch_names, stim, n_cond = _fake_session(rng)
    _, conds, _ = epoch_session(raw, ch_names, 1000.0, stim, max_rep=2)
    assert 99999 not in conds


def test_merge_and_save_roundtrip(tmp_path, rng):
    s1 = rng.normal(size=(3, 2, 4, 10)).astype(np.float32)
    s2 = rng.normal(size=(3, 2, 4, 10)).astype(np.float32)
    merged_test = merge_sessions_test([s1, s2], seed=0)
    assert merged_test.shape == (3, 4, 4, 10)

    conds = [np.array([1, 2, 3]), np.array([1, 2, 3])]
    merged_train = merge_sessions_train([s1, s2], conds, seed=0)
    assert merged_train.shape == (3, 4, 4, 10)

    path = str(tmp_path / "sub-01" / "preprocessed_eeg_test.npy")
    save_preprocessed(path, merged_test, [f"c{i}" for i in range(4)],
                      np.linspace(0, 1, 10))
    with open(path, "rb") as f:
        loaded = pickle.load(f)
    np.testing.assert_array_equal(loaded["preprocessed_eeg_data"], merged_test)
    # and the training-data loader must accept this format
    from eeg_image_decode_tpu.data.things_eeg import _load_subject_file

    d = _load_subject_file(str(tmp_path), "sub-01", train=False)
    assert "preprocessed_eeg_data" in d


def test_ledoit_wolf_batched_equals_scalar():
    """The vectorized LW used by session_covariance vs the sklearn-validated
    scalar path, epoch by epoch."""
    from eeg_image_decode_tpu.preprocess.mvnn import (
        ledoit_wolf_cov,
        ledoit_wolf_cov_batched,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 40, 9))
    x[3] *= 1e-6  # near-degenerate epoch exercises the shrinkage clamp
    batched = ledoit_wolf_cov_batched(x)
    for i in range(7):
        np.testing.assert_allclose(batched[i], ledoit_wolf_cov(x[i]),
                                   rtol=1e-10, atol=1e-12)


def test_ledoit_wolf_batched_does_not_mutate_input():
    from eeg_image_decode_tpu.preprocess.mvnn import ledoit_wolf_cov_batched

    x = np.random.default_rng(1).normal(size=(3, 20, 5))  # fp64 — alias risk
    before = x.copy()
    ledoit_wolf_cov_batched(x)
    np.testing.assert_array_equal(x, before)
