"""Epoching: raw THINGS-EEG sessions → sorted condition×rep epoch tensors.

Rebuilds ``EEG-preprocessing/preprocessing_utils.py:1-113`` without MNE:
channel selection in the canonical 63-channel order, stim-channel event
extraction, target-trial rejection (event 99999), epoch slicing [−0.2, 1.0] s
with baseline correction over the pre-stimulus window, polyphase resampling
to 250 Hz, per-condition seeded rep selection (max 20 test / 2 train), and
the post-epoch drop of the first 50 samples (``:108``).
"""

from __future__ import annotations

import numpy as np

CHANNEL_ORDER = [
    "Fp1", "Fp2", "AF7", "AF3", "AFz", "AF4", "AF8", "F7", "F5", "F3",
    "F1", "F2", "F4", "F6", "F8", "FT9", "FT7", "FC5", "FC3", "FC1",
    "FCz", "FC2", "FC4", "FC6", "FT8", "FT10", "T7", "C5", "C3", "C1",
    "Cz", "C2", "C4", "C6", "T8", "TP9", "TP7", "CP5", "CP3", "CP1",
    "CPz", "CP2", "CP4", "CP6", "TP8", "TP10", "P7", "P5", "P3", "P1",
    "Pz", "P2", "P4", "P6", "P8", "PO7", "PO3", "POz", "PO4", "PO8",
    "O1", "Oz", "O2",
]
TARGET_EVENT = 99999


def find_events(stim: np.ndarray) -> np.ndarray:
    """0→value onsets on the stim channel → (n_events, 2): (sample, value)."""
    stim = np.asarray(stim)
    prev = np.concatenate([[0], stim[:-1]])
    onsets = np.nonzero((prev == 0) & (stim != 0))[0]
    return np.stack([onsets, stim[onsets].astype(np.int64)], axis=1)


def resample_poly(x: np.ndarray, up: int, down: int) -> np.ndarray:
    """Polyphase resampling along the last axis (scipy's resample_poly)."""
    from scipy.signal import resample_poly as _rp

    return _rp(x, up, down, axis=-1)


def epoch_session(
    raw: np.ndarray,
    ch_names: list[str],
    sfreq: float,
    stim: np.ndarray,
    *,
    target_sfreq: float = 250.0,
    tmin: float = -0.2,
    tmax: float = 1.0,
    max_rep: int = 2,
    seed: int = 20200220,
    drop_initial: int = 50,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One session → (epochs (conditions, max_rep, 63, T'), conditions, times).

    ``raw``: (n_channels, n_samples) EEG; ``stim``: (n_samples,) event channel.
    Mirrors ``epoching()`` step by step; resampling is polyphase instead of
    MNE's FFT resampler (numerically close for these band-limited signals).
    """
    # channel selection in canonical order (ref :70)
    idx = [ch_names.index(ch) for ch in CHANNEL_ORDER if ch in ch_names]
    data = np.asarray(raw, np.float64)[idx]

    events = find_events(stim)
    events = events[events[:, 1] != TARGET_EVENT]  # ref :72-73

    n_pre = int(round(-tmin * sfreq))
    n_post = int(round(tmax * sfreq))
    onsets, values = events[:, 0], events[:, 1]
    keep = (onsets - n_pre >= 0) & (onsets + n_post < data.shape[1])
    onsets, values = onsets[keep], values[keep]

    # epoch + baseline-correct over [tmin, 0] (mne baseline=(None, 0))
    win = np.arange(-n_pre, n_post + 1)
    epochs = data[:, onsets[:, None] + win[None, :]]  # (C, n_ev, T)
    epochs = np.moveaxis(epochs, 1, 0)  # (n_ev, C, T)
    baseline = epochs[:, :, :n_pre].mean(axis=2, keepdims=True)
    epochs = epochs - baseline

    # resample to 250 Hz
    if target_sfreq < sfreq:
        up, down = int(target_sfreq), int(sfreq)
        g = np.gcd(up, down)
        epochs = resample_poly(epochs, up // g, down // g)
    t_len = epochs.shape[-1]
    times = np.linspace(tmin, tmax, t_len)

    # sort by condition, seeded rep subsample (ref :89-106)
    conditions = np.unique(values)
    rng = np.random.RandomState(seed)
    sorted_data = np.zeros(
        (len(conditions), max_rep, epochs.shape[1], t_len), np.float32
    )
    for i, cond in enumerate(conditions):
        cond_idx = np.nonzero(values == cond)[0]
        pick = rng.permutation(len(cond_idx))[:max_rep]
        sorted_data[i] = epochs[cond_idx[pick]]

    return sorted_data[..., drop_initial:], conditions, times


def merge_sessions_test(whitened: list[np.ndarray], seed: int = 20200220):
    """Concatenate session reps and shuffle them (ref ``save_prepr`` :231-238)."""
    merged = np.concatenate(whitened, axis=1)
    rng = np.random.RandomState(seed)
    return merged[:, rng.permutation(merged.shape[1])]


def merge_sessions_train(
    whitened: list[np.ndarray],
    conditions: list[np.ndarray],
    seed: int = 20200220,
):
    """Group per-condition reps across sessions (conditions are 1-based ids in
    the reference, ref :272-282) then shuffle reps."""
    data = np.concatenate(whitened, axis=0)
    cond = np.concatenate(conditions, axis=0)
    uniq = np.unique(cond)
    reps_total = data.shape[1] * int(np.sum(cond == uniq[0]))
    merged = np.zeros(
        (len(uniq), reps_total, data.shape[2], data.shape[3]), data.dtype
    )
    for i, c in enumerate(uniq):
        merged[i] = np.concatenate(list(data[cond == c]), axis=0)
    rng = np.random.RandomState(seed)
    return merged[:, rng.permutation(merged.shape[1])]


def save_preprocessed(path: str, data: np.ndarray, ch_names, times) -> None:
    """Write the reference's pickled-dict format (``:241-258``)."""
    import os
    import pickle

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "preprocessed_eeg_data": data,
                "ch_names": list(ch_names),
                "times": np.asarray(times),
            },
            f,
            protocol=4,
        )
