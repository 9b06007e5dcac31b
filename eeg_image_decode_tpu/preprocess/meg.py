"""THINGS-MEG preprocessing (C3) — the array-level pipeline of
``MEG-preprocessing/pre_possess.ipynb`` (cells 2-36), decoupled from MNE.

The notebook reads ``*-epo.fif`` epochs via MNE, crops to [0, 1.0] s, drops
the catch event (999999), identifies the 200 zero-shot test concepts (the
ones with 12 repetitions), removes their overlap from train, and reshapes to

    train: (1654, 12, 1, C, T)   test: (200, 1, 12, C, T)

then pickles dicts per subject. MNE is not a TPU-host dependency, so this
module takes the already-epoched arrays (epochs × C × T plus event ids) —
obtainable from any .fif reader — and reproduces the sorting/reshaping/save
logic exactly.
"""

from __future__ import annotations

import numpy as np

CATCH_EVENT = 999999


def crop_time_window(
    epochs: np.ndarray, times: np.ndarray, tmin: float = 0.0, tmax: float = 1.0
) -> tuple[np.ndarray, np.ndarray]:
    mask = (times >= tmin) & (times <= tmax)
    return epochs[..., mask], times[mask]


def split_meg_concepts(
    epochs: np.ndarray,
    event_ids: np.ndarray,
    *,
    test_reps: int = 12,
    train_reps: int = 12,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Sort epochs by concept; concepts seen ``test_reps`` times are the
    zero-shot test set (cells 24-30), the rest are training concepts.

    Returns (train (n_train_cls, reps, C, T), test (n_test_cls, reps, C, T),
    train_concept_ids, test_concept_ids).
    """
    keep = event_ids != CATCH_EVENT
    epochs, event_ids = epochs[keep], event_ids[keep]
    concepts, counts = np.unique(event_ids, return_counts=True)

    test_concepts = concepts[counts == test_reps]
    # the THINGS-MEG test set is exactly 200 concepts; when more match (e.g.
    # synthetic data), keep the first 200 like the notebook's fixed list
    test_concepts = test_concepts[:200]
    train_concepts = np.setdiff1d(concepts, test_concepts)

    def gather(cs, reps):
        out = []
        for c in cs:
            idx = np.nonzero(event_ids == c)[0][:reps]
            out.append(epochs[idx])
        return np.stack(out) if out else np.zeros((0,))

    return (
        gather(train_concepts, train_reps),
        gather(test_concepts, test_reps),
        train_concepts,
        test_concepts,
    )


def to_reference_layout(
    train: np.ndarray, test: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Insert the singleton axes of the notebook's saved layout (cell 36):
    train (n, reps, C, T) → (n, reps, 1, C, T); test → (n, 1, reps, C, T)."""
    return train[:, :, None], test[:, None]


def save_meg(path: str, train: np.ndarray, test: np.ndarray, ch_names, times):
    import os
    import pickle

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    for name, arr in (("train", train), ("test", test)):
        with open(os.path.join(path, f"preprocessed_meg_{name}.npy"), "wb") as f:
            pickle.dump(
                {
                    "meg_data": arr,
                    "ch_names": list(ch_names),
                    "times": np.asarray(times),
                },
                f,
                protocol=4,
            )
