"""Tests for utils (logging, plotting, profiling timer) and MEG preprocessing."""

import numpy as np

from eeg_image_decode_tpu.preprocess.meg import (
    crop_time_window,
    split_meg_concepts,
    to_reference_layout,
)
from eeg_image_decode_tpu.utils.logging import MetricsLogger
from eeg_image_decode_tpu.utils.plotting import plot_training_summary


def test_metrics_logger_csv(tmp_path):
    log = MetricsLogger(str(tmp_path))
    log.log({"epoch": 0, "loss": 1.0, "top1_k200": 0.1})
    log.log({"epoch": 1, "loss": 0.5, "top1_k200": 0.2})
    path = log.write_csv()
    lines = open(path).read().splitlines()
    assert len(lines) == 3 and "loss" in lines[0]


def test_plot_training_summary(tmp_path):
    history = [
        {"epoch": i, "loss": 1.0 / (i + 1), "train_acc": 0.1 * i,
         "top1_k200": 0.05 * i, "top1_k2": 0.5, "top1_k4": 0.4,
         "top1_k10": 0.3}
        for i in range(5)
    ]
    out = plot_training_summary(history, str(tmp_path / "summary.png"))
    import os

    assert os.path.getsize(out) > 1000


def test_meg_fif_to_pickles_end_to_end(tmp_path, rng, capsys):
    """The complete THINGS-MEG ingest with no external tooling: a synthetic
    .fif-shaped fixture (the ``mne.Epochs`` duck interface the notebook
    reads, ``pre_possess.ipynb`` cells 2-5) → ``scripts/export_meg.py`` per
    session → concat → ``preprocess-meg`` CLI with the image→concept CSV →
    reference-layout pickles, with grouping verified by value."""
    import json
    import pickle
    import sys

    sys.path.insert(0, "scripts")
    from export_meg import concat_epoch_files, export_epochs

    from eeg_image_decode_tpu import cli

    C, T = 6, 40
    times = np.linspace(-0.1, 1.1, T)
    # THINGS-like image-level events: concepts 1..5 × 3 images each
    # (image ids 1..15). Concept 5 is zero-shot: its image 13 repeats
    # test_reps=4 times; its images 14/15 appear once in train and must be
    # dropped by the concept-overlap filter. Catch trials sprinkle 999999.
    image_concepts = np.asarray([1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4,
                                 5, 5, 5])
    all_events = ([im + 1 for im in range(12)]      # train images ×1
                  + [13] * 4                        # zs image ×4
                  + [14, 15]                        # overlap → dropped
                  + [999999] * 3)                   # catch
    order = rng.permutation(len(all_events))
    events = np.asarray(all_events)[order]
    # epoch value encodes its event id so grouping is checkable by value
    data = np.zeros((len(events), C, T), np.float32)
    data += events[:, None, None].astype(np.float32)

    class FakeEpochs:  # the mne.Epochs duck interface export_meg reads
        def __init__(self, sl):
            self._sl = sl
            self.events = np.stack(
                [np.zeros(len(events[sl])), np.zeros(len(events[sl])),
                 events[sl]], axis=1).astype(np.int64)
            self.times = times
            self.ch_names = [f"MEG{i:03d}" for i in range(C)]

        def get_data(self):
            return data[self._sl]

    # two "sessions", exported separately then concatenated
    half = len(events) // 2
    s1, s2 = str(tmp_path / "s1.npz"), str(tmp_path / "s2.npz")
    export_epochs(FakeEpochs(slice(0, half)), s1)
    export_epochs(FakeEpochs(slice(half, None)), s2)
    merged = str(tmp_path / "meg_epochs.npz")
    concat_epoch_files([s1, s2], merged)

    csv = tmp_path / "image_concept_index.csv"
    csv.write_text("\n".join(str(c) for c in image_concepts))

    out_dir = str(tmp_path / "out")
    cli.main([
        "preprocess-meg", "--epochs", merged, "--out", out_dir,
        "--test-reps", "4", "--train-reps", "3",
        "--image-concept-csv", str(csv),
    ])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    t_in = times[(times >= 0) & (times <= 1.0)]
    assert info["train_shape"] == [4, 3, 1, C, len(t_in)]
    assert info["test_shape"] == [1, 1, 4, C, len(t_in)]
    assert info["n_train_concepts"] == 4
    assert info["n_test_concepts"] == 1

    with open(f"{out_dir}/preprocessed_meg_train.npy", "rb") as f:
        tr = pickle.load(f)
    with open(f"{out_dir}/preprocessed_meg_test.npy", "rb") as f:
        te = pickle.load(f)
    # concept c (1..4) holds images 3c-2..3c, in image order
    for ci in range(4):
        want = np.asarray([3 * ci + 1, 3 * ci + 2, 3 * ci + 3], np.float32)
        np.testing.assert_array_equal(tr["meg_data"][ci, :, 0, 0, 0], want)
    np.testing.assert_array_equal(te["meg_data"][0, 0, :, 0, 0],
                                  np.full(4, 13.0))
    assert list(tr["ch_names"]) == [f"MEG{i:03d}" for i in range(C)]
    np.testing.assert_allclose(tr["times"], t_in)


def test_meg_crop_and_split(rng):
    C, T = 16, 120
    times = np.linspace(-0.2, 1.2, T)
    n_train_cls, n_test_cls = 10, 3
    events = []
    for c in range(n_train_cls):
        events += [c + 1] * 6  # train concepts: 6 reps
    for c in range(n_test_cls):
        events += [100 + c] * 12  # test concepts: 12 reps
    events += [999999] * 4  # catch trials
    events = np.asarray(events)
    epochs = rng.normal(size=(len(events), C, T)).astype(np.float32)

    cropped, t2 = crop_time_window(epochs, times)
    assert t2.min() >= 0 and t2.max() <= 1.0

    train, test, tc, zc = split_meg_concepts(
        cropped, events, test_reps=12, train_reps=6
    )
    assert train.shape[:2] == (n_train_cls, 6)
    assert test.shape[:2] == (n_test_cls, 12)
    assert set(zc) == {100, 101, 102}
    assert 999999 not in set(tc) | set(zc)

    tr5, te5 = to_reference_layout(train, test)
    assert tr5.shape[2] == 1 and te5.shape[1] == 1


def test_load_concept_index_formats(tmp_path):
    """The THINGS image→concept CSV parser must accept every layout pandas
    ``read_csv(header=None)`` would (the notebook's reader) and fail LOUDLY
    on garbage — ``np.genfromtxt`` on a comma-delimited file silently
    returns all −1, which used to degenerate the whole MEG split."""
    import pytest

    from eeg_image_decode_tpu.cli import _load_concept_index

    plain = tmp_path / "plain.csv"
    plain.write_text("1\n1\n2\n2\n")
    np.testing.assert_array_equal(_load_concept_index(str(plain)),
                                  [1, 1, 2, 2])

    # comma-delimited with extra columns + a header row (pandas to_csv)
    comma = tmp_path / "comma.csv"
    comma.write_text("concept,extra\n3,9\n4,9\n")
    np.testing.assert_array_equal(_load_concept_index(str(comma)), [3, 4])

    # non-integer row past the header fails with a file:line message
    bad = tmp_path / "bad.csv"
    bad.write_text("1\nxyz\n")
    with pytest.raises(SystemExit, match="bad.csv:2"):
        _load_concept_index(str(bad))

    # 0-based / negative indices fail instead of corrupting the split
    zero = tmp_path / "zero.csv"
    zero.write_text("0\n1\n")
    with pytest.raises(SystemExit, match="1-based"):
        _load_concept_index(str(zero))

    empty = tmp_path / "empty.csv"
    empty.write_text("header\n")
    with pytest.raises(SystemExit, match="no concept"):
        _load_concept_index(str(empty))

    # a CORRUPT first DATA row ('NaN', a float, a mangled token) is NOT a
    # header — silently skipping it would shift every image→concept mapping
    # by one row; it must fail loudly with file:line
    for garbage in ("NaN,9\n3,9\n4,9\n", "1.5\n2\n", "12a\n2\n", "inf\n2\n"):
        corrupt = tmp_path / "corrupt.csv"
        corrupt.write_text(garbage)
        with pytest.raises(SystemExit, match="corrupt.csv:1"):
            _load_concept_index(str(corrupt))
