"""Export THINGS-MEG ``*-epo.fif`` epochs to the framework's npz format.

The reference's MEG pipeline starts inside MNE
(``MEG-preprocessing/pre_possess.ipynb`` cells 2-5: ``mne.read_epochs`` on
``preprocessed_P{N}-epo.fif``), which the TPU-side preprocessing
(``eeg_image_decode_tpu/preprocess/meg.py``) deliberately does not depend
on. This host-side script is the bridge: it reads the fif epochs with MNE
(an OPTIONAL import — install ``mne`` wherever raw THINGS-MEG lives) and
writes one npz per subject with exactly the arrays ``preprocess-meg``
consumes:

    epochs    (N, C, T) float32   event-sorted epoch data
    event_ids (N,)      int64     the concept id per epoch (events[:, 2])
    times     (T,)      float64   epoch time grid in seconds
    ch_names  (C,)      object    channel names

Usage:
    python scripts/export_meg.py --fif preprocessed_P1-epo.fif \
        --out sub-01_meg_epochs.npz
    python -m eeg_image_decode_tpu.cli preprocess-meg \
        --epochs sub-01_meg_epochs.npz --out Preprocessed/sub-01/

Multiple ``--fif`` files (sessions) concatenate along the epoch axis.
"""

from __future__ import annotations

import argparse

import numpy as np


def export_epochs(epochs_like, out_path: str) -> dict:
    """Epochs-like object (``mne.Epochs`` or anything with ``get_data()``,
    ``events`` (N, 3), ``times``, ``ch_names``) → npz. Separated from the
    fif reading so the conversion logic is testable without MNE."""
    data = np.asarray(epochs_like.get_data(), np.float32)
    events = np.asarray(epochs_like.events)
    out = {
        "epochs": data,
        "event_ids": events[:, 2].astype(np.int64),
        "times": np.asarray(epochs_like.times, np.float64),
        "ch_names": np.asarray(list(epochs_like.ch_names), dtype=object),
    }
    if data.shape[0] != out["event_ids"].shape[0]:
        raise ValueError(
            f"epochs ({data.shape[0]}) and events ({out['event_ids'].shape[0]})"
            " disagree"
        )
    np.savez(out_path, **out)
    return out


def concat_epoch_files(paths: list[str], out_path: str) -> dict:
    """Concatenate already-exported npz sessions along the epoch axis."""
    parts = [dict(np.load(p, allow_pickle=True)) for p in paths]
    ref = parts[0]
    for p in parts[1:]:
        if list(p["ch_names"]) != list(ref["ch_names"]):
            raise ValueError("sessions disagree on ch_names")
        if p["times"].shape != ref["times"].shape:
            raise ValueError("sessions disagree on the time grid")
    out = {
        "epochs": np.concatenate([p["epochs"] for p in parts], axis=0),
        "event_ids": np.concatenate([p["event_ids"] for p in parts], axis=0),
        "times": ref["times"],
        "ch_names": ref["ch_names"],
    }
    np.savez(out_path, **out)
    return out


def read_fif(path: str):
    try:
        import mne
    except ImportError:
        raise SystemExit(
            "reading .fif needs the `mne` package (host-side only): "
            "pip install mne — or export the epochs to npz on a machine "
            "that has it; the TPU-side pipeline never imports MNE"
        ) from None
    return mne.read_epochs(path, preload=True, verbose="ERROR")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--fif", nargs="+", required=True,
                    help="one or more *-epo.fif files (sessions)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args(argv)

    if len(args.fif) == 1:
        out = export_epochs(read_fif(args.fif[0]), args.out)
    else:
        import os
        import tempfile

        tmps = []
        try:
            for p in args.fif:
                f = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
                tmps.append(f.name)
                f.close()
                export_epochs(read_fif(p), tmps[-1])
            out = concat_epoch_files(tmps, args.out)
        finally:
            for t in tmps:
                os.unlink(t)
    print(
        f"wrote {args.out}: epochs {out['epochs'].shape}, "
        f"{len(np.unique(out['event_ids']))} concepts"
    )


if __name__ == "__main__":
    main()
