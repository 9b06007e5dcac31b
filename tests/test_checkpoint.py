"""Checkpoint round-trip: params + optimizer state + step must resume exactly
(the reference cannot resume at all — SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.checkpoint import Checkpointer, run_directory
from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train import ContrastiveTrainer


def test_train_state_roundtrip(tmp_path):
    train, test = make_synthetic_retrieval_data(
        n_classes=8, images_per_class=2, train_reps=2, clip_dim=32
    )
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=16, epochs=1, eval_ks=(8,),
        ckpt_every_epochs=1,
    )
    model = build_encoder("nice", proj_dim=32)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    trainer = ContrastiveTrainer(model, cfg, train, test, checkpointer=ckpt)
    trainer.fit(log_fn=None)
    ckpt.manager.wait_until_finished()

    assert ckpt.latest_step() == 1
    restored = ckpt.restore(1, trainer.state)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(trainer.state)),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_directory_layout():
    d = run_directory("/runs", "atms", "sub-08", "2026-08-16")
    assert d == "/runs/contrast/atms/sub-08/2026-08-16"
