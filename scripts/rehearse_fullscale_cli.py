"""Full-scale CLI rehearsal: the real user path at the real THINGS-EEG size.

Generates a synthetic subject at the exact reference dimensions — train
(16540 conditions, 4 reps, 63, 300) ≈ 5 GB pickle, test (200, 80, 63, 300),
ViT-H-width feature caches — then drives the actual `train-retrieval` CLI
end-to-end on the chip: pickle ingest → sidecar mmap cache → time-window →
rep flattening → HBM residency → scan epochs with the 1654-way probe →
seeded k-way eval → orbax checkpoints → CSV/plot, and a `--resume-dir`
continuation. This is the rehearsal of everything `bench.py` skips (bench
synthesizes data directly in HBM).

Run: python scripts/rehearse_fullscale_cli.py [workdir]
(~6 GB of disk in workdir, reused across runs; results printed + recorded
in docs/PERF.md.)
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLS, IPC, REPS_TRAIN, REPS_TEST = 1654, 10, 4, 80
C, T_STORED = 63, 300  # stored grid incl. 50 pre-stimulus samples
D = 1024


def write_subject(root: str, subject: str) -> None:
    sub_dir = os.path.join(root, subject)
    os.makedirs(sub_dir, exist_ok=True)
    times = np.concatenate([
        np.linspace(-0.2, 0.0, 50, endpoint=False),
        np.linspace(0.0, 1.0, T_STORED - 50),
    ])
    rng = np.random.default_rng(0)
    for train in (True, False):
        name = ("preprocessed_eeg_training.npy" if train
                else "preprocessed_eeg_test.npy")
        path = os.path.join(sub_dir, name)
        if os.path.exists(path):
            print(f"reusing {path}")
            continue
        n_cond = N_CLS * (IPC if train else 1) // (1 if train else IPC)
        n_cond = N_CLS * IPC if train else 200
        reps = REPS_TRAIN if train else REPS_TEST
        t0 = time.perf_counter()
        data = rng.standard_normal(
            (n_cond, reps, C, T_STORED), dtype=np.float32
        )
        with open(path, "wb") as f:
            pickle.dump(
                {"preprocessed_eeg_data": data,
                 "ch_names": [f"ch{i}" for i in range(C)],
                 "times": times},
                f, protocol=4,
            )
        print(f"wrote {path} {data.shape} in {time.perf_counter() - t0:.1f}s")
        del data


def write_features(root: str) -> tuple[str, str]:
    rng = np.random.default_rng(1)
    train_f = os.path.join(root, "features_train.npz")
    test_f = os.path.join(root, "features_test.npz")
    if not os.path.exists(train_f):
        img = rng.standard_normal((N_CLS * IPC, D), dtype=np.float32)
        img /= np.linalg.norm(img, axis=1, keepdims=True)
        txt = rng.standard_normal((N_CLS, D), dtype=np.float32)
        txt /= np.linalg.norm(txt, axis=1, keepdims=True)
        np.savez(train_f, img_features=img, text_features=txt)
    if not os.path.exists(test_f):
        img = rng.standard_normal((200, D), dtype=np.float32)
        img /= np.linalg.norm(img, axis=1, keepdims=True)
        txt = rng.standard_normal((200, D), dtype=np.float32)
        txt /= np.linalg.norm(txt, axis=1, keepdims=True)
        np.savez(test_f, img_features=img, text_features=txt)
    return train_f, test_f


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fullscale_things"
    os.makedirs(workdir, exist_ok=True)
    write_subject(workdir, "sub-01")
    train_f, test_f = write_features(workdir)

    from eeg_image_decode_tpu import cli

    out_dir = os.path.join(workdir, "runs")
    common = [
        "--data-path", workdir, "--features", train_f,
        "--test-features", test_f, "--encoder", "atms",
        "--subjects", "sub-01", "--batch-size", "1024",
        "--output-dir", out_dir,
    ]
    t0 = time.perf_counter()
    cli.main(["train-retrieval", *common, "--epochs", "2"])
    wall = time.perf_counter() - t0
    print(f"cold 2-epoch CLI run (ingest+compile+train): {wall:.1f}s")

    import glob

    run_dir = sorted(glob.glob(
        os.path.join(out_dir, "contrast", "atms", "*", "*")))[-1]
    t0 = time.perf_counter()
    cli.main(["train-retrieval", *common, "--epochs", "4",
              "--resume-dir", run_dir])
    wall2 = time.perf_counter() - t0
    print(f"resumed +2-epoch CLI run (warm cache): {wall2:.1f}s")

    import csv

    with open(os.path.join(run_dir, "results.csv"), newline="") as f:
        rows = list(csv.DictReader(f))
    assert [int(r["epoch"]) for r in rows] == [0, 1, 2, 3]
    print(json.dumps({
        "epochs": len(rows),
        "samples_per_s_last": float(rows[-1]["samples_per_s"]),
        "cold_run_s": round(wall, 1),
        "resumed_run_s": round(wall2, 1),
    }))


if __name__ == "__main__":
    main()
