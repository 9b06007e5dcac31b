"""Serving-layer tests: retrieval top-k and full reconstruction chain."""

import numpy as np
import pytest

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
    # requests compile at BUCKETED shapes only (small request → small
    # dispatch; a coalesced burst → one big dispatch): the 8-row call used
    # bucket 8, the 24-row call chunks 16+8 adding only bucket 16, and a
    # repeat adds nothing
    assert svc.buckets == (8, 16)
    assert svc._query._cache_size() == 1
    eeg24 = np.concatenate([test.eeg] * 2)[:24]  # 1.5× max_batch
    sid24 = np.concatenate([test.subject_ids] * 2)[:24]
    s2, i2 = svc.top_k(eeg24, sid24, k=3)
    assert s2.shape == (24, 3)
    assert svc._query._cache_size() == 2
    svc.top_k(eeg24, sid24, k=3)
    assert svc._query._cache_size() == 2
    np.testing.assert_allclose(s2[:8], scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(i2[:8], idx)
    # warmup compiles every bucket up front so live requests never pay an
    # XLA compile; afterwards any request size at ANY k ≤ k_cap adds no
    # traces (the device computes top-k_cap once; the host slices)
    c, t = test.eeg.shape[1:]
    svc.warmup((c, t), ks=(3,))
    n_warm = svc._query._cache_size()
    svc.top_k(test.eeg[:13], test.subject_ids[:13], k=3)
    assert svc._query._cache_size() == n_warm
    # k_cap clamps to the gallery size (12 here); every k ≤ k_cap rides the
    # shared program AND must equal the specialized answer's prefix
    assert svc.k_cap == 12
    s12, i12 = svc.top_k(test.eeg[:8], test.subject_ids[:8], k=12)
    for k in (1, 5, 12):
        sk, ik = svc.top_k(test.eeg[:8], test.subject_ids[:8], k=k)
        assert sk.shape == (8, k)
        np.testing.assert_array_equal(ik, i12[:, :k])
        np.testing.assert_allclose(sk, s12[:, :k], rtol=1e-6, atol=1e-6)
    assert svc._query._cache_size() == n_warm
    # k is validated against [1, gallery] BEFORE any dispatch — out-of-range
    # values get a clear ValueError, not a lax.top_k trace error
    for bad_k in (0, -3, 13):
        with pytest.raises(ValueError, match="k must be in"):
            svc.top_k(test.eeg[:2], test.subject_ids[:2], k=bad_k)
    # k above a small k_cap rides ONE shared full-top-gallery program (at
    # most two programs per bucket, whatever k values clients send) and
    # still matches the top-k_cap program's prefix
    svc4 = RetrievalService(
        model,
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        test.class_img_features(), max_batch=16, k_cap=4,
    )
    assert svc4.k_cap == 4
    s5, i5 = svc4.top_k(test.eeg[:8], test.subject_ids[:8], k=5)
    svc4.top_k(test.eeg[:8], test.subject_ids[:8], k=2)   # top-k_cap program
    n_progs = svc4._query._cache_size()
    assert n_progs == 2
    s7, i7 = svc4.top_k(test.eeg[:8], test.subject_ids[:8], k=7)
    svc4.top_k(test.eeg[:8], test.subject_ids[:8], k=3)   # rides top-k_cap
    svc4.top_k(test.eeg[:8], test.subject_ids[:8], k=11)  # rides full-rank
    assert svc4._query._cache_size() == n_progs
    np.testing.assert_array_equal(i5, i12[:, :5])
    np.testing.assert_array_equal(i7, i12[:, :7])
    # float16 wire format (transfer-bound coalesced dispatch lever): same
    # decisions, scores at reduced-precision resolution
    svc16 = RetrievalService(
        model,
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        test.class_img_features(),
        max_batch=16, transfer_dtype="float16",
    )
    s16, i16 = svc16.top_k(test.eeg[:8], test.subject_ids[:8], k=3)
    np.testing.assert_array_equal(i16[:, 0], idx[:, 0])
    np.testing.assert_allclose(s16, scores, rtol=5e-2, atol=5e-2)


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
    # startup warmup (what `cli serve` runs) compiles the chunk shape; the
    # live request after it must hit the same compiled program
    svc.warmup(test.eeg.shape[1:])
    imgs = svc.reconstruct(test.eeg[:3], test.subject_ids[:3])
    assert imgs.shape == (3, 16, 16, 3)
    assert imgs.min() >= 0 and imgs.max() <= 1
    # a caller-supplied row_seeds array that disagrees with the request's
    # row count fails with a clear ValueError, not a jit shape mismatch
    with pytest.raises(ValueError, match="row_seeds must have shape"):
        svc.reconstruct(test.eeg[:3], test.subject_ids[:3],
                        row_seeds=np.zeros((2, 2), np.uint32))
    with pytest.raises(ValueError, match="row_seeds must have shape"):
        svc.reconstruct(test.eeg[:3], test.subject_ids[:3],
                        row_seeds=np.zeros(3, np.uint32))


def test_reconstruction_service_chunks_oversized_requests():
    """A request of 2.5× max_batch must be served by chunking at the single
    compiled shape — no new jit trace per distinct padded size (the round-2
    behavior padded to the next multiple of max_batch and retraced the whole
    SDXL graph per size)."""
    model, trainer, train, test = _trained()
    prior = PriorPipe(PriorConfig(
        embed_dim=64, cond_dim=64, hidden_dims=(32, 16), time_embed_dim=16,
        epochs=2, batch_size=16, warmup_steps=2, num_inference_steps=3,
        guidance_scale=2.0,
    ))
    prior.init(total_steps=1)
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    svc = ReconstructionService(
        model,
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        prior, gen, max_batch=4,
    )
    # warm the compiled shape with an in-budget request
    first = svc.reconstruct(test.eeg[:2], test.subject_ids[:2])
    traces_after_warm = svc._fused_fn._cache_size()
    # 10 = 2.5 × max_batch → 3 chunks (4, 4, 2-padded-to-4)
    imgs = svc.reconstruct(test.eeg[:10], test.subject_ids[:10])
    assert imgs.shape == (10, 16, 16, 3)
    assert svc._fused_fn._cache_size() == traces_after_warm == 1
    # chunking must not change per-sample results vs a small request
    # (same chunk-relative seed → first chunk identical)
    np.testing.assert_allclose(imgs[:2], first, rtol=1e-5, atol=1e-5)


def test_reconstruction_fused_matches_staged():
    """The fused one-dispatch path (encoder → prior scan → UNet steps → VAE
    in a single jit) must produce the same images as the three-dispatch
    staged path — same keys, same math, only the jit boundaries differ."""
    model, trainer, train, test = _trained()
    prior = PriorPipe(PriorConfig(
        embed_dim=64, cond_dim=64, hidden_dims=(32, 16), time_embed_dim=16,
        epochs=2, batch_size=16, warmup_steps=2, num_inference_steps=3,
        guidance_scale=2.0,
    ))
    prior.init(total_steps=1)
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    common = dict(
        variables={"params": trainer.state.params,
                   "batch_stats": trainer.state.batch_stats},
        prior_pipe=prior, generator=gen, max_batch=4,
    )
    svc_fused = ReconstructionService(model, fused=True, **common)
    svc_staged = ReconstructionService(model, fused=False, **common)
    a = svc_fused.reconstruct(test.eeg[:6], test.subject_ids[:6], seed=7)
    b = svc_staged.reconstruct(test.eeg[:6], test.subject_ids[:6], seed=7)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_caption_service_chain():
    """EEG → encoder → prior → PixelProjector → GIT greedy → strings, with
    the padded fixed batch (n=3 on max_batch=4)."""
    from eeg_image_decode_tpu.data.tokenizers import WordPieceTokenizer
    from eeg_image_decode_tpu.models.git_caption import (
        GITCaptioner,
        GITConfig,
        PixelProjector,
    )
    from eeg_image_decode_tpu.serve import CaptionService

    model, trainer, train, test = _trained()
    prior = PriorPipe(PriorConfig(
        embed_dim=16, cond_dim=64, hidden_dims=(32, 16), time_embed_dim=16,
        epochs=1, batch_size=16, warmup_steps=2, num_inference_steps=3,
        guidance_scale=2.0,
    ))
    prior.init(total_steps=1)

    gcfg = GITConfig.tiny()  # visual_dim 16 matches the prior's embed_dim
    cap = GITCaptioner(gcfg)
    git_params = cap.init(
        jax.random.key(0),
        jnp.zeros((1, gcfg.num_visual_tokens, gcfg.visual_dim)),
        jnp.zeros((1, 2), jnp.int32),
    )["params"]
    proj = PixelProjector(num_tokens=gcfg.num_visual_tokens,
                          out_dim=gcfg.visual_dim)
    proj_params = proj.init(jax.random.key(1),
                            jnp.zeros((1, gcfg.visual_dim)))["params"]
    vocab = ["[PAD]", "[CLS]", "[SEP]", "[UNK]"] + [
        f"tok{i}" for i in range(4, gcfg.vocab_size)
    ]
    svc = CaptionService(
        model,
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        prior, cap, git_params, proj_params,
        WordPieceTokenizer(vocab),
        max_batch=4, max_new_tokens=4,
    )
    svc.warmup(test.eeg.shape[1:])  # startup compile (cli serve semantics)
    caps = svc.caption(test.eeg[:3], test.subject_ids[:3])
    assert len(caps) == 3
    assert all(isinstance(c, str) for c in caps)
    # deterministic given the same seed
    assert svc.caption(test.eeg[:3], test.subject_ids[:3]) == caps


def test_request_validation_fails_fast():
    """Zero-row / malformed requests raise a clear ValueError up front
    instead of crashing in np.concatenate after the empty chunk loop."""
    import pytest

    model, trainer, train, test = _trained()
    svc = RetrievalService(
        model,
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        test.class_img_features(),
        max_batch=16,
    )
    with pytest.raises(ValueError, match="zero EEG rows"):
        svc.top_k(test.eeg[:0], test.subject_ids[:0], k=3)
    with pytest.raises(ValueError, match=r"must be \(B, C, T\)"):
        svc.top_k(test.eeg[0], 1, k=3)  # missing batch dim
    with pytest.raises(ValueError, match="does not match"):
        svc.top_k(test.eeg[:4], test.subject_ids[:3], k=3)
