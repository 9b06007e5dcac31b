"""Kill-and-resume training (VERDICT item 8).

The reference restarts from scratch (bare state_dict, no optimizer state —
SURVEY.md §5). Here a killed run resumes from the latest orbax checkpoint
and must reproduce the uninterrupted run's remaining history exactly:
per-epoch permutations and RNG keys derive from (seed, epoch), and the full
TrainState (params, BN stats, optimizer, step) round-trips.
"""

import numpy as np
import pytest

from eeg_image_decode_tpu.core.checkpoint import Checkpointer
from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train import ContrastiveTrainer


def _make(tmp_path, tag):
    train, test = make_synthetic_retrieval_data(
        n_classes=8, images_per_class=2, train_reps=2, clip_dim=32, snr=2.0,
    )
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=16, epochs=6, lr=1e-3, eval_ks=(2, 8),
        ckpt_every_epochs=2, seed=3,
    )
    out = tmp_path / tag
    ckpt = Checkpointer(str(out / "ckpt"))
    trainer = ContrastiveTrainer(
        build_encoder("nice", proj_dim=32), cfg, train, test,
        output_dir=str(out), checkpointer=ckpt,
    )
    return trainer, ckpt


def test_kill_and_resume_reproduces_history(tmp_path):
    # uninterrupted reference run
    full, _ = _make(tmp_path, "full")
    full.fit(log_fn=None)
    assert len(full.history) == 6

    # "killed" run: stop after 4 epochs (checkpoint lands at step 4)
    part, part_ckpt = _make(tmp_path, "part")
    part.fit(epochs=4, log_fn=None)
    part_ckpt.close()
    assert (tmp_path / "part" / "results.csv").exists()

    # fresh process stand-in: brand-new trainer on the same run directory
    resumed, _ = _make(tmp_path, "part")
    start = resumed.resume()
    assert start == 4
    assert len(resumed.history) == 4  # completed rows reloaded from CSV
    resumed.fit(log_fn=None)
    assert len(resumed.history) == 6
    assert [r["epoch"] for r in resumed.history] == list(range(6))

    # remaining epochs must match the uninterrupted run exactly
    for e in (4, 5):
        for k in ("loss", "train_acc"):
            np.testing.assert_allclose(
                resumed.history[e][k], full.history[e][k], rtol=1e-6,
                err_msg=f"epoch {e} {k}",
            )
    for k in full.history[5]:
        if k in ("epoch_time_s", "samples_per_s"):
            continue
        np.testing.assert_allclose(resumed.history[5][k], full.history[5][k],
                                   rtol=1e-6, err_msg=k)


def test_resume_without_checkpoint_raises(tmp_path):
    trainer, ckpt = _make(tmp_path, "empty")
    with pytest.raises(FileNotFoundError):
        trainer.resume()


def test_cli_resume_flag(tmp_path):
    """End-to-end through the CLI surface with a fake THINGS tree."""
    from test_data import _write_subject

    from eeg_image_decode_tpu import cli
    from eeg_image_decode_tpu.data.features import save_features

    n_cls = 6
    _write_subject(tmp_path, "sub-01", n_cls=n_cls, train=True, reps=4)
    _write_subject(tmp_path, "sub-01", n_cls=n_cls, train=False, reps=8)
    rng = np.random.default_rng(0)
    D = 1024  # the CLI's encoders project to the real ViT-H width
    save_features(
        str(tmp_path / "f.npz"),
        img_features=rng.normal(size=(n_cls * 10, D)).astype(np.float32),
        text_features=rng.normal(size=(n_cls, D)).astype(np.float32),
        img_features_test=rng.normal(size=(n_cls, D)).astype(np.float32),
        text_features_test=rng.normal(size=(n_cls, D)).astype(np.float32),
    )
    common = [
        "--data-path", str(tmp_path), "--features", str(tmp_path / "f.npz"),
        "--encoder", "nice", "--subjects", "sub-01",
        "--batch-size", "16", "--dtype", "float32", "--eval-ks", "2,6",
        "--output-dir", str(tmp_path / "runs"),
    ]
    cli.main(["train-retrieval", *common, "--epochs", "2"])
    import glob

    run_dir = glob.glob(str(tmp_path / "runs" / "contrast" / "nice" / "*" / "*"))[0]
    # continue the same run for two more epochs
    cli.main(["train-retrieval", *common, "--epochs", "4",
              "--resume-dir", run_dir])
    import csv

    with open(f"{run_dir}/results.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert [int(r["epoch"]) for r in rows] == [0, 1, 2, 3]
