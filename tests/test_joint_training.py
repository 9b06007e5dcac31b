"""Joint-subject training (C18): one model over many subjects with
per-subject value embeddings + subject tokens, leave-one-subject-out eval."""

import numpy as np
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import ATMSConfig, ContrastiveTrainConfig
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.data.things_eeg import EEGRetrievalData
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train import ContrastiveTrainer


def _multi_subject_data(n_subjects=3):
    """Stack synthetic per-subject splits that share class structure (same
    seed → same anchors/mixing, different noise comes from subject_id)."""
    trains, tests = [], []
    for sid in range(n_subjects):
        tr, te = make_synthetic_retrieval_data(
            n_classes=12, images_per_class=2, train_reps=2, clip_dim=48,
            n_timepoints=64, snr=2.0, seed=20200220, subject_id=sid,
        )
        trains.append(tr)
        tests.append(te)

    def stack(splits):
        first = splits[0]
        return EEGRetrievalData(
            eeg=np.concatenate([s.eeg for s in splits]),
            labels=np.concatenate([s.labels for s in splits]),
            subject_ids=np.concatenate([s.subject_ids for s in splits]),
            img_idx=np.concatenate([s.img_idx for s in splits]),
            text_idx=np.concatenate([s.text_idx for s in splits]),
            img_features=first.img_features,
            text_features=first.text_features,
            n_classes=first.n_classes,
            images_per_class=first.images_per_class,
        )

    return stack(trains), tests[0]  # test on subject 0 only (leave-one style)


def test_joint_training_mixed_subject_batches():
    train, test = _multi_subject_data()
    assert set(np.unique(train.subject_ids)) == {0, 1, 2}
    cfg = ContrastiveTrainConfig(
        encoder="atms", batch_size=24, epochs=3, lr=1e-3, eval_ks=(12,), seed=0,
    )
    model = build_encoder(
        "atms",
        config=ATMSConfig(joint_train=True, num_subjects=3, proj_dim=48,
                          seq_len=64, d_model=64, temporal_kernel=9,
                          pool_size=16, pool_stride=4),
    )
    trainer = ContrastiveTrainer(model, cfg, train, test)
    history = trainer.fit(log_fn=None)
    assert history[-1]["loss"] < history[0]["loss"]
    # 12-way chance = 0.083; joint model must still decode subject 0
    assert history[-1]["top1_k12"] > 0.3, history[-1]


def test_joint_training_on_mesh(mesh8):
    train, test = _multi_subject_data(n_subjects=2)
    cfg = ContrastiveTrainConfig(
        encoder="atms", batch_size=16, epochs=1, lr=1e-3, eval_ks=(12,), seed=1,
    )
    model = build_encoder(
        "atms", config=ATMSConfig(joint_train=True, num_subjects=2, proj_dim=48,
                                  seq_len=64, d_model=64, temporal_kernel=9,
                                  pool_size=16, pool_stride=4)
    )
    trainer = ContrastiveTrainer(model, cfg, train, test, mesh=mesh8)
    history = trainer.fit(log_fn=None)
    assert np.isfinite(history[-1]["loss"])
