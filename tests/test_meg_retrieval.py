"""THINGS-MEG pickles feed the retrieval pipeline end-to-end.

The reference's MEG story stops at the preprocessed pickles
(``MEG-preprocessing/pre_possess.ipynb`` cell 26 — its retrieval scripts only
read EEG). Here the same loader consumes both: ``meg_data`` pickles (the 5-D
notebook layout, 12 images/concept × 1 rep train, 12-rep zero-shot test) load
through ``load_things_eeg_subject`` / ``build_retrieval_data`` and train
through the normal CLI with ``--images-per-class 12 --train-reps 1``.
"""

import json
import os

import numpy as np
import pytest

from eeg_image_decode_tpu import cli
from eeg_image_decode_tpu.data.features import save_features
from eeg_image_decode_tpu.data.things_eeg import (
    build_retrieval_data,
    load_things_eeg_subject,
)
from eeg_image_decode_tpu.preprocess.meg import save_meg

N_CLS, IMGS, TEST_REPS, C, T = 4, 3, 5, 17, 60


def _write_meg_subject(tmp_path, subject, seed=0):
    rng = np.random.default_rng(seed)
    train = rng.normal(size=(N_CLS, IMGS, 1, C, T)).astype(np.float32)
    test = rng.normal(size=(N_CLS, 1, TEST_REPS, C, T)).astype(np.float32)
    times = np.linspace(0.0, 1.0, T)
    save_meg(str(tmp_path / subject), train, test,
             [f"MEG{i:03d}" for i in range(C)], times)
    return train, test


def test_meg_subject_loads_like_eeg(tmp_path):
    train, test = _write_meg_subject(tmp_path, "sub-01")

    eeg, labels = load_things_eeg_subject(str(tmp_path), "sub-01", train=True)
    assert eeg.shape == (N_CLS * IMGS, C, T)  # reps=1 folds away
    np.testing.assert_array_equal(
        labels, np.repeat(np.arange(N_CLS, dtype=np.int32), IMGS))
    # row order: class-major, image order preserved
    np.testing.assert_allclose(eeg[IMGS], train[1, 0, 0], rtol=1e-6)

    avg, lab = load_things_eeg_subject(str(tmp_path), "sub-01", train=False)
    assert avg.shape == (N_CLS, C, T)
    np.testing.assert_allclose(avg[2], test[2, 0].mean(axis=0), rtol=1e-5)

    per_rep, lab_r = load_things_eeg_subject(
        str(tmp_path), "sub-01", train=False, average_test_reps=False)
    assert per_rep.shape == (N_CLS * TEST_REPS, C, T)
    np.testing.assert_array_equal(
        lab_r, np.repeat(np.arange(N_CLS, dtype=np.int32), TEST_REPS))


def test_meg_sidecar_cache_roundtrip(tmp_path):
    """Second load goes through the mmap sidecar cache and must preserve the
    meg_data key + values."""
    _write_meg_subject(tmp_path, "sub-01")
    a, _ = load_things_eeg_subject(str(tmp_path), "sub-01", train=True)
    assert os.path.exists(
        tmp_path / "sub-01" / "preprocessed_meg_train.npy.raw.npy")
    b, _ = load_things_eeg_subject(str(tmp_path), "sub-01", train=True)
    np.testing.assert_array_equal(a, b)


def test_meg_retrieval_data_index_math(tmp_path):
    _write_meg_subject(tmp_path, "sub-01")
    D = 16
    img = np.arange(N_CLS * IMGS * D, dtype=np.float32).reshape(-1, D)
    txt = np.arange(N_CLS * D, dtype=np.float32).reshape(-1, D)
    data = build_retrieval_data(
        str(tmp_path), ["sub-01"], train=True,
        img_features=img, text_features=txt,
        images_per_class=IMGS, train_reps=1,
    )
    # row i is class i//IMGS, image i (1 rep) → img_idx == row index
    np.testing.assert_array_equal(
        data.img_idx, np.arange(N_CLS * IMGS, dtype=np.int32))
    np.testing.assert_array_equal(
        data.text_idx,
        np.repeat(np.arange(N_CLS, dtype=np.int32), IMGS))

    per_rep = build_retrieval_data(
        str(tmp_path), ["sub-01"], train=False,
        img_features=txt, text_features=txt,
        average_test_reps=False,
    )
    # un-averaged test reps derived from the data (5 here, not EEG's 80)
    np.testing.assert_array_equal(
        per_rep.text_idx,
        np.repeat(np.arange(N_CLS, dtype=np.int32), TEST_REPS))


def test_meg_cli_training_end_to_end(tmp_path, capsys):
    # NICE's conv/pool kernels assume reference-scale axes (63-channel
    # spatial conv, 250-sample time axis); write this subject at full dims —
    # the loader tests above cover the small-shape math
    rng = np.random.default_rng(0)
    cc, tt = 63, 250
    train = rng.normal(size=(N_CLS, IMGS, 1, cc, tt)).astype(np.float32)
    test = rng.normal(size=(N_CLS, 1, TEST_REPS, cc, tt)).astype(np.float32)
    save_meg(str(tmp_path / "sub-01"), train, test,
             [f"MEG{i:03d}" for i in range(cc)], np.linspace(0.0, 1.0, tt))
    rng = np.random.default_rng(1)
    D = 1024
    save_features(
        str(tmp_path / "f.npz"),
        img_features=rng.normal(size=(N_CLS * IMGS, D)).astype(np.float32),
        text_features=rng.normal(size=(N_CLS, D)).astype(np.float32),
        img_features_test=rng.normal(size=(N_CLS, D)).astype(np.float32),
        text_features_test=rng.normal(size=(N_CLS, D)).astype(np.float32),
    )
    capsys.readouterr()
    cli.main([
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "nice", "--subjects", "sub-01",
        "--images-per-class", str(IMGS), "--train-reps", "1",
        "--batch-size", "4", "--dtype", "float32", "--eval-ks", "2,4",
        "--epochs", "1", "--output-dir", str(tmp_path / "runs"),
    ])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(row["loss"])
    assert 0.0 <= row["top1_k2"] <= 1.0


def test_meg_without_layout_flags_fails_fast(tmp_path):
    """MEG data loaded with the EEG default images_per_class=10/train_reps=4
    must raise (not silently mis-pair EEG rows with wrong CLIP features)."""
    _write_meg_subject(tmp_path, "sub-01")
    D = 16
    img = np.zeros((N_CLS * IMGS, D), np.float32)
    txt = np.zeros((N_CLS, D), np.float32)
    with pytest.raises(ValueError, match="images-per-class"):
        build_retrieval_data(
            str(tmp_path), ["sub-01"], train=True,
            img_features=img, text_features=txt,
        )
