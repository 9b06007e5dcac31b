"""Data pipeline tests: reference file-format ingestion + index arithmetic."""

import os
import pickle

import numpy as np
import pytest

from eeg_image_decode_tpu.data.things_eeg import (
    build_retrieval_data,
    extract_subject_id,
    load_things_eeg_subject,
)
from eeg_image_decode_tpu.data.features import (
    cache_path,
    load_features,
    save_features,
)


def _write_subject(tmp_path, subject, *, n_cls, train, reps, C=63, T=300):
    """Write a pickled dict in the reference's preprocessing output format
    (preprocessing_utils.py:241-258): (conditions, reps, C, T) + times incl.
    the 50 pre-stimulus samples."""
    rng = np.random.default_rng(hash(subject) % 2**32)
    n_cond = n_cls * (10 if train else 1)
    data = rng.normal(size=(n_cond, reps, C, T)).astype(np.float32)
    # stored `times` includes the 50 pre-stimulus samples the loader skips;
    # the post-skip grid spans exactly [0, 1.0] like the real 250 Hz output
    times = np.concatenate(
        [np.linspace(-0.2, 0.0, 50, endpoint=False), np.linspace(0.0, 1.0, T)]
    )
    d = {
        "preprocessed_eeg_data": data,
        "ch_names": [f"ch{i}" for i in range(C)],
        "times": times,
    }
    sub_dir = tmp_path / subject
    os.makedirs(sub_dir, exist_ok=True)
    name = "preprocessed_eeg_training.npy" if train else "preprocessed_eeg_test.npy"
    with open(sub_dir / name, "wb") as f:
        pickle.dump(d, f, protocol=4)
    return data


@pytest.fixture
def fake_things(tmp_path):
    n_cls = 6
    for sub in ("sub-01", "sub-02"):
        _write_subject(tmp_path, sub, n_cls=n_cls, train=True, reps=4)
        _write_subject(tmp_path, sub, n_cls=n_cls, train=False, reps=8)
    return tmp_path, n_cls


def test_load_train_flattens_reps(fake_things):
    path, n_cls = fake_things
    eeg, labels = load_things_eeg_subject(str(path), "sub-01", train=True)
    assert eeg.shape[0] == n_cls * 10 * 4
    assert labels.shape == (n_cls * 10 * 4,)
    # labels repeat-interleaved over images*reps (ref :236-258)
    np.testing.assert_array_equal(labels[: 10 * 4], 0)
    np.testing.assert_array_equal(labels[10 * 4 : 20 * 4], 1)


def test_load_test_averages_reps(fake_things):
    path, n_cls = fake_things
    eeg, labels = load_things_eeg_subject(str(path), "sub-01", train=False)
    assert eeg.shape[0] == n_cls
    with open(path / "sub-01" / "preprocessed_eeg_test.npy", "rb") as f:
        raw = pickle.load(f)["preprocessed_eeg_data"]
    # time-window [0, 1.0] keeps all stored samples here
    np.testing.assert_allclose(eeg[0], raw[0].mean(axis=0), rtol=1e-6)


def test_load_test_unaveraged(fake_things):
    path, n_cls = fake_things
    eeg, labels = load_things_eeg_subject(
        str(path), "sub-01", train=False, average_test_reps=False
    )
    assert eeg.shape[0] == n_cls * 8
    np.testing.assert_array_equal(labels[:8], 0)


def test_subset_classes_and_pictures(fake_things):
    """The reference's analysis-only subset options
    (``eegdatasets_leaveone.py:40,168-216``): classes keeps whole classes
    with ORIGINAL labels; classes+pictures keeps single (class, picture)
    conditions; test-side classes filters concepts; val_size is a dead
    parameter there and ignored here."""
    path, n_cls = fake_things
    with open(path / "sub-01" / "preprocessed_eeg_training.npy", "rb") as f:
        raw = pickle.load(f)["preprocessed_eeg_data"]

    eeg, labels = load_things_eeg_subject(
        str(path), "sub-01", train=True, classes=[1, 4], val_size=0.1)
    assert eeg.shape[0] == 2 * 10 * 4
    np.testing.assert_array_equal(np.unique(labels), [1, 4])
    np.testing.assert_allclose(eeg[0], raw[1 * 10, 0], rtol=1e-6)

    # classes + pictures: one image per pair, at the INTENDED flat index
    # c*10+p (the reference's own c*1+p at :171 is a documented upstream
    # indexing bug)
    eeg, labels = load_things_eeg_subject(
        str(path), "sub-01", train=True, classes=[2, 5], pictures=[3, 0])
    assert eeg.shape[0] == 2 * 4
    np.testing.assert_array_equal(labels, [2, 2, 2, 2, 5, 5, 5, 5])
    np.testing.assert_allclose(eeg[0], raw[2 * 10 + 3, 0], rtol=1e-6)

    # test side: keep only the listed concepts
    eeg, labels = load_things_eeg_subject(
        str(path), "sub-01", train=False, classes=[0, 3])
    assert eeg.shape[0] == 2
    np.testing.assert_array_equal(labels, [0, 3])

    with pytest.raises(ValueError, match="pictures requires"):
        load_things_eeg_subject(str(path), "sub-01", train=True,
                                pictures=[0])
    with pytest.raises(ValueError, match="pair up"):
        load_things_eeg_subject(str(path), "sub-01", train=True,
                                classes=[0, 1], pictures=[0])


def test_build_retrieval_data_index_arithmetic(fake_things):
    path, n_cls = fake_things
    D = 16
    img = np.random.default_rng(0).normal(size=(n_cls * 10, D)).astype(np.float32)
    txt = np.random.default_rng(1).normal(size=(n_cls, D)).astype(np.float32)
    data = build_retrieval_data(
        str(path), ["sub-01"], train=True, img_features=img, text_features=txt
    )
    # sample i: img_idx = i//4, text_idx = i//40 (ref :326-360)
    assert data.img_idx[0] == 0 and data.img_idx[4] == 1
    assert data.text_idx[39] == 0 and data.text_idx[40] == 1
    # labels must agree with text_idx (both are the class id)
    np.testing.assert_array_equal(data.labels, data.text_idx)
    assert data.class_img_features().shape == (n_cls, D)
    np.testing.assert_array_equal(data.class_img_features()[1], img[10])


def test_leave_one_subject_semantics(fake_things):
    path, n_cls = fake_things
    img = np.zeros((n_cls * 10, 4), np.float32)
    txt = np.zeros((n_cls, 4), np.float32)
    train = build_retrieval_data(
        str(path), ["sub-01", "sub-02"], train=True,
        img_features=img, text_features=txt, exclude_subject="sub-02",
    )
    assert set(np.unique(train.subject_ids)) == {1}
    test = build_retrieval_data(
        str(path), ["sub-01", "sub-02"], train=False,
        img_features=img, text_features=txt, exclude_subject="sub-02",
    )
    assert set(np.unique(test.subject_ids)) == {2}


def test_extract_subject_id():
    assert extract_subject_id("sub-08") == 8
    assert extract_subject_id("sub-10") == 10
    assert extract_subject_id("nodigits") == -1


def test_feature_cache_content_keyed(tmp_path):
    imgs = ["a.jpg", "b.jpg"]
    p1 = cache_path(str(tmp_path), "ViT-H-14", "train", imgs)
    p2 = cache_path(str(tmp_path), "ViT-H-14", "train", ["a.jpg", "c.jpg"])
    assert p1 != p2  # different image lists → different cache files
    save_features(
        p1,
        img_features=np.ones((2, 4), np.float32),
        text_features=np.zeros((1, 4), np.float32),
    )
    loaded = load_features(p1)
    np.testing.assert_array_equal(loaded["img_features"], np.ones((2, 4)))


def test_subject_file_sidecar_cache_roundtrip(rng, tmp_path):
    """First load writes a raw-.npy sidecar; the mmap-cached reload must be
    byte-identical to the pickled-dict path."""
    import pickle

    from eeg_image_decode_tpu.data.things_eeg import load_things_eeg_subject

    sub = tmp_path / "sub-01"
    sub.mkdir()
    data = rng.normal(size=(40, 4, 63, 300)).astype(np.float32)
    times = np.linspace(-0.2, 1.0, 350)
    raw = {"preprocessed_eeg_data": data, "times": times, "ch_names": []}
    p = sub / "preprocessed_eeg_training.npy"
    with open(p, "wb") as f:
        pickle.dump(raw, f, protocol=4)

    e1, l1 = load_things_eeg_subject(str(tmp_path), "sub-01", train=True)
    assert (sub / "preprocessed_eeg_training.npy.raw.npy").exists()
    e2, l2 = load_things_eeg_subject(str(tmp_path), "sub-01", train=True)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(l1, l2)


def test_subject_file_survives_corrupted_sidecar(rng, tmp_path):
    """A truncated sidecar (killed writer) must fall back to the pickle and
    heal the cache, not crash."""
    import pickle

    from eeg_image_decode_tpu.data.things_eeg import load_things_eeg_subject

    sub = tmp_path / "sub-02"
    sub.mkdir()
    data = rng.normal(size=(40, 4, 63, 300)).astype(np.float32)
    raw = {"preprocessed_eeg_data": data,
           "times": np.linspace(-0.2, 1.0, 350), "ch_names": []}
    p = sub / "preprocessed_eeg_training.npy"
    with open(p, "wb") as f:
        pickle.dump(raw, f, protocol=4)

    e1, _ = load_things_eeg_subject(str(tmp_path), "sub-02", train=True)
    cache = str(p) + ".raw.npy"
    blob = open(cache, "rb").read()
    with open(cache, "wb") as f:
        f.write(blob[: len(blob) // 3])  # simulate a killed writer
    os.utime(cache)  # still newer than the pickle
    e2, _ = load_things_eeg_subject(str(tmp_path), "sub-02", train=True)
    np.testing.assert_array_equal(e1, e2)
