"""Serving-layer tests: retrieval top-k and full reconstruction chain."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig, PriorConfig
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.gen.sdxl import Generator4Embeds, GeneratorConfig
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.serve import ReconstructionService, RetrievalService
from eeg_image_decode_tpu.train import ContrastiveTrainer
from eeg_image_decode_tpu.train.prior import PriorPipe


def _trained():
    train, test = make_synthetic_retrieval_data(
        n_classes=12, images_per_class=2, train_reps=2, clip_dim=64,
        n_timepoints=64, snr=2.0,
    )
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=24, epochs=4, lr=1e-3, eval_ks=(12,),
    )
    model = build_encoder("nice", proj_dim=64, temporal_kernel=9,
                          pool_size=16, pool_stride=4)
    trainer = ContrastiveTrainer(model, cfg, train, test)
    trainer.fit(log_fn=None)
    return model, trainer, train, test


def test_retrieval_service_topk():
    model, trainer, train, test = _trained()
    svc = RetrievalService(
        model,
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        test.class_img_features(),
        max_batch=16,
    )
    scores, idx = svc.top_k(test.eeg[:8], test.subject_ids[:8], k=3)
    assert scores.shape == (8, 3) and idx.shape == (8, 3)
    # trained model: true class should usually top the list
    top1_acc = float(np.mean(idx[:, 0] == test.labels[:8]))
    assert top1_acc >= 0.5, top1_acc
    # scores sorted descending
    assert np.all(np.diff(scores, axis=1) <= 0)


def test_reconstruction_service_chain():
    model, trainer, train, test = _trained()
    prior = PriorPipe(PriorConfig(
        embed_dim=64, cond_dim=64, hidden_dims=(32, 16), time_embed_dim=16,
        epochs=2, batch_size=16, warmup_steps=2, num_inference_steps=5,
        guidance_scale=2.0,
    ))
    feats = trainer.extract_features(train.eeg[:32], train.subject_ids[:32])
    prior.train(feats, train.img_features[train.img_idx[:32]] * 0.1,
                log_fn=None)
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    svc = ReconstructionService(
        model,
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        prior, gen, max_batch=4,
    )
    imgs = svc.reconstruct(test.eeg[:3], test.subject_ids[:3])
    assert imgs.shape == (3, 16, 16, 3)
    assert imgs.min() >= 0 and imgs.max() <= 1
