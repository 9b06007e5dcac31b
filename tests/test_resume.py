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


def _prior_data(rng):
    c = rng.normal(size=(64, 24)).astype(np.float32)
    h = rng.normal(size=(64, 16)).astype(np.float32)
    return c, h


def _prior_pipe():
    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.train.prior import PriorPipe

    return PriorPipe(PriorConfig(
        embed_dim=16, cond_dim=24, hidden_dims=(16, 8), time_embed_dim=8,
        epochs=6, batch_size=16, warmup_steps=4, seed=5,
    ))


def test_prior_kill_and_resume_reproduces_history(tmp_path, rng):
    """The 150-epoch prior job is now resumable: full PriorState (params +
    Adam incl. schedule step) round-trips, (seed, epoch)-keyed permutations
    make the resumed trajectory identical (VERDICT r2 item 4)."""
    c, h = _prior_data(rng)

    full = _prior_pipe()
    h_full = full.train(c, h, log_fn=None)

    part = _prior_pipe()
    # the killed job was LAUNCHED as a 6-epoch run (the LR schedule spans
    # total_steps of the full job) and dies after epoch 4
    part.init(total_steps=(64 // 16) * 6)
    ckpt = Checkpointer(str(tmp_path / "prior" / "ckpt"))
    part.train(c, h, epochs=4, log_fn=None, checkpointer=ckpt,
               ckpt_every_epochs=2)
    ckpt.close()

    resumed = _prior_pipe()
    ckpt2 = Checkpointer(str(tmp_path / "prior" / "ckpt"))
    h_res = resumed.train(c, h, log_fn=None, checkpointer=ckpt2, resume=True)
    ckpt2.close()
    assert [r["epoch"] for r in h_res] == list(range(6))
    for e in range(6):
        np.testing.assert_allclose(
            h_res[e]["loss"], h_full[e]["loss"], rtol=1e-5,
            err_msg=f"epoch {e}",
        )


def test_lowlevel_kill_and_resume_reproduces_history(tmp_path, rng):
    from eeg_image_decode_tpu.core.config import LowLevelConfig
    from eeg_image_decode_tpu.models.lowlevel import EncoderLowLevel
    from eeg_image_decode_tpu.train.lowlevel import LowLevelTrainer

    stages = (32, 16, 8, 8, 8, 8)
    eeg = rng.normal(size=(16, 63, 250)).astype(np.float32)
    lat = rng.normal(size=(16, 4, 64, 64)).astype(np.float32) * 0.1

    def make():
        return LowLevelTrainer(
            LowLevelConfig(batch_size=8, epochs=6, lr=2e-3, time_proj_dim=8),
            model=EncoderLowLevel(stage_channels=stages, time_proj_dim=8),
        )

    h_full = make().train(eeg, lat, seed=7, log_fn=None)

    ckpt = Checkpointer(str(tmp_path / "ll" / "ckpt"))
    part = make()
    part.init(total_steps=(16 // 8) * 6, seed=7)  # launched as 6 epochs
    part.train(eeg, lat, seed=7, epochs=4, log_fn=None, checkpointer=ckpt,
               ckpt_every_epochs=2)
    ckpt.close()

    ckpt2 = Checkpointer(str(tmp_path / "ll" / "ckpt"))
    h_res = make().train(eeg, lat, seed=7, log_fn=None, checkpointer=ckpt2,
                         resume=True)
    ckpt2.close()
    assert [r["epoch"] for r in h_res] == list(range(6))
    for e in range(6):
        np.testing.assert_allclose(
            h_res[e]["loss"], h_full[e]["loss"], rtol=1e-5,
            err_msg=f"epoch {e}",
        )


def test_prior_checkpoint_config_guard(tmp_path, rng):
    """A config-carrying prior pickle refuses to load into a mismatched
    architecture with a one-line diff (not a deep flax shape error), and
    from_checkpoint() reconstructs the right config by itself
    (VERDICT r2 item 8)."""
    import pytest

    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.train.prior import PriorPipe

    pipe = _prior_pipe()
    pipe.init(total_steps=1)
    path = str(tmp_path / "prior.pkl")
    pipe.save_with_config(path)

    wrong = PriorPipe(PriorConfig(
        embed_dim=16, cond_dim=24, hidden_dims=(32, 8), time_embed_dim=8,
    ))
    with pytest.raises(ValueError, match="hidden_dims"):
        wrong.load(path)

    # from_checkpoint ignores a wrong default and rebuilds the stored config
    rebuilt = PriorPipe.from_checkpoint(
        path, default_cfg=PriorConfig(hidden_dims=(99,))
    )
    assert rebuilt.cfg.hidden_dims == (16, 8)
    out = rebuilt.generate(rng.normal(size=(2, 24)).astype(np.float32),
                           num_inference_steps=2)
    assert out.shape == (2, 16)


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


def test_finetune_after_load_rebuilds_lr_schedule(tmp_path, rng):
    """Training from load()ed params must not inherit the total_steps=1
    schedule that load()/from_checkpoint() init with — fine-tuning would
    silently run at ~zero LR after warmup_steps+1 steps."""
    from eeg_image_decode_tpu.train.prior import PriorPipe

    pipe = _prior_pipe()
    pipe.init(total_steps=1)
    path = str(tmp_path / "prior.pkl")
    pipe.save_with_config(path)

    import jax

    ft = PriorPipe.from_checkpoint(path)
    assert ft._schedule_total_steps == 1
    c = rng.normal(size=(64, 24)).astype(np.float32)
    h = rng.normal(size=(64, 16)).astype(np.float32)
    before = jax.tree_util.tree_leaves(ft.state.params)[0].copy()
    hist = ft.train(c, h, epochs=3, batch_size=16, log_fn=None)
    # schedule rebuilt for the real run length (4 steps/epoch × 3)
    assert ft._schedule_total_steps == 12
    assert len(hist) == 3
    # params actually moved well past warmup (nonzero LR throughout)
    after = jax.tree_util.tree_leaves(ft.state.params)[0]
    assert float(np.abs(np.asarray(after - before)).max()) > 1e-4

    # a mid-run state (resume path: step > 0) must NOT be rebuilt
    step_before = int(ft.state.step)
    assert step_before == 12
    ft.train(c, h, epochs=3, batch_size=16, log_fn=None)
    assert int(ft.state.step) == 24  # continued, not reset
