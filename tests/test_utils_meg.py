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
