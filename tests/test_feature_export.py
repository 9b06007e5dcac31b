"""Feature export (the prior's input artifact) + prior checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig, PriorConfig
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train import ContrastiveTrainer
from eeg_image_decode_tpu.train.prior import PriorPipe


def test_export_features_npz(tmp_path):
    train, test = make_synthetic_retrieval_data(
        n_classes=8, images_per_class=2, train_reps=2, clip_dim=32
    )
    cfg = ContrastiveTrainConfig(encoder="nice", batch_size=16, epochs=1,
                                 eval_ks=(8,))
    trainer = ContrastiveTrainer(build_encoder("nice", proj_dim=32), cfg,
                                 train, test)
    trainer.fit(log_fn=None)
    path = trainer.export_features(str(tmp_path / "feats.npz"))
    d = np.load(path)
    assert d["eeg_features"].shape == (train.n, 32)
    assert d["eeg_features_test"].shape == (test.n, 32)
    assert d["img_features"].shape == (train.n, 32)  # aligned per-sample targets
    np.testing.assert_array_equal(d["labels_test"], test.labels)


def test_prior_save_load_roundtrip(tmp_path, rng):
    cfg = PriorConfig(embed_dim=16, cond_dim=16, hidden_dims=(32, 16),
                      time_embed_dim=16, epochs=2, batch_size=8,
                      num_inference_steps=5, warmup_steps=2)
    pipe = PriorPipe(cfg)
    c = rng.normal(size=(16, 16)).astype(np.float32)
    h = rng.normal(size=(16, 16)).astype(np.float32) * 0.3
    pipe.train(c, h, log_fn=None)
    path = pipe.save(str(tmp_path / "prior.pkl"))

    pipe2 = PriorPipe(cfg)
    pipe2.load(path)
    g1 = pipe.generate(jnp.asarray(c[:4]), key=jax.random.key(0))
    g2 = pipe2.generate(jnp.asarray(c[:4]), key=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
