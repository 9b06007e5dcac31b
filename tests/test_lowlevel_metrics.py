"""Low-level (VAE-latent) pipeline + reconstruction metric suite tests."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import LowLevelConfig
from eeg_image_decode_tpu.eval.recon_metrics import (
    feature_distance,
    pixcorr,
    reconstruction_metrics,
    ssim,
    two_way_identification,
)
from eeg_image_decode_tpu.models.lowlevel import EncoderLowLevel
from eeg_image_decode_tpu.train.lowlevel import LowLevelTrainer


TINY_STAGES = (32, 16, 8, 8, 8, 8)


def test_lowlevel_encoder_shape(rng):
    model = EncoderLowLevel(stage_channels=TINY_STAGES, time_proj_dim=8)
    x = jnp.asarray(rng.normal(size=(2, 63, 250)).astype(np.float32))
    v = model.init(jax.random.key(0), x, deterministic=True)
    out = model.apply(v, x, deterministic=True)
    assert out.shape == (2, 64, 64, 4)  # NHWC of the (4, 64, 64) SDXL latent


def test_lowlevel_full_size_param_shapes():
    """Full-size config matches the reference's 8064→…→4 ladder without
    paying a full compile: check shapes via eval_shape only."""
    import jax

    model = EncoderLowLevel()
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 63, 250)), deterministic=True
        )
    )
    p = shapes["params"]
    assert p["subject_linear"]["kernel"].shape == (250, 128)
    assert p["up_0"]["kernel"].shape == (4, 4, 8064, 1024)
    assert p["proj_out"]["kernel"].shape == (1, 1, 16, 4)


def test_lowlevel_images_to_previews_end_to_end(rng, tmp_path, capsys):
    """The complete low-level pipeline with no external tooling: image dir →
    ``latents`` CLI (flax VAE cache builder) → LowLevelTrainer with the
    frozen-VAE preview decode → PNG previews on disk (the reference needs
    externally-built ``image_latent_512.pt`` and decodes previews in
    ``train_vae_latent_512_low_level_no_average.py:309-323``)."""
    import json
    import pickle

    from PIL import Image

    from eeg_image_decode_tpu import cli
    from eeg_image_decode_tpu.gen.vae import VAE, VAEConfig

    # image tree in the THINGS images_set layout (class dirs)
    img_dir = tmp_path / "images"
    for c in range(2):
        d = img_dir / f"class_{c:02d}"
        d.mkdir(parents=True)
        for j in range(2):
            arr = (rng.uniform(size=(128, 128, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{j}.png")

    vae = VAE(VAEConfig.tiny())
    vparams = vae.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))[
        "params"
    ]
    vae_pkl = tmp_path / "vae.pkl"
    with open(vae_pkl, "wb") as f:
        pickle.dump(vparams, f)

    cli.main([
        "latents", "--images-dir", str(img_dir), "--vae-params", str(vae_pkl),
        "--cache-dir", str(tmp_path / "cache"), "--split", "train",
        "--tiny", "--image-size", "128", "--batch-size", "2",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_images"] == 4
    # tiny VAE: 2 stages → 2× downsample; 128² → 64×64×4 NHWC latents
    assert out["latent_shape"] == [4, 64, 64, 4]
    import os

    assert os.path.exists(out["cache"])
    latents = np.load(out["cache"])["latents"]

    # a second run must hit the cache (no recompute): same result
    cli.main([
        "latents", "--images-dir", str(img_dir), "--vae-params", str(vae_pkl),
        "--cache-dir", str(tmp_path / "cache"), "--split", "train",
        "--tiny", "--image-size", "128", "--batch-size", "2",
    ])
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )["cache"] == out["cache"]

    # train on the produced cache with training-time preview decode
    cfg = LowLevelConfig(batch_size=4, epochs=2, lr=2e-3, time_proj_dim=8)
    trainer = LowLevelTrainer(
        cfg,
        model=EncoderLowLevel(stage_channels=TINY_STAGES, time_proj_dim=8),
    )
    eeg = rng.normal(size=(4, 63, 250)).astype(np.float32)
    trainer.init(total_steps=2)
    trainer.set_preview_decoder(
        vae, vparams, preview_dir=str(tmp_path / "previews"),
        preview_every=1, n_previews=2,
    )
    writes: list[int] = []
    orig_write = trainer._write_previews
    trainer._write_previews = lambda ep, e: (writes.append(ep),
                                             orig_write(ep, e))
    trainer.train(eeg, latents, log_fn=None)
    # one decode per due epoch, no duplicate final write when the loop
    # already wrote epochs-1 (epochs % preview_every == 0)
    assert writes == [0, 1]
    for epoch in (0, 1):
        p = tmp_path / "previews" / f"epoch_{epoch:04d}" / "00.png"
        assert p.exists(), p
        im = np.asarray(Image.open(p))
        assert im.shape == (128, 128, 3)


def test_lowlevel_trainer_l1_decreases(rng):
    cfg = LowLevelConfig(batch_size=8, epochs=6, lr=2e-3, time_proj_dim=8)
    n = 16
    eeg = rng.normal(size=(n, 63, 250)).astype(np.float32)
    latents = rng.normal(size=(n, 4, 64, 64)).astype(np.float32) * 0.1  # NCHW cache layout
    trainer = LowLevelTrainer(
        cfg,
        model=EncoderLowLevel(stage_channels=TINY_STAGES, time_proj_dim=8),
    )
    history = trainer.train(eeg, latents, log_fn=None)
    assert history[-1]["loss"] < history[0]["loss"]
    pred = trainer.predict(eeg[:2])
    assert pred.shape == (2, 64, 64, 4)


def test_pixcorr_perfect_and_anticorrelated(rng):
    a = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32))
    np.testing.assert_allclose(float(pixcorr(a, a)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(pixcorr(a, -a)), -1.0, atol=1e-5)


def test_ssim_identity_and_noise(rng):
    a = jnp.asarray(rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32))
    assert float(ssim(a, a)) > 0.999
    b = jnp.asarray(rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32))
    assert float(ssim(a, b)) < 0.5


def test_ssim_matches_reference_formula_on_shifted_images(rng):
    """Sanity anchor: adding constant brightness keeps structure high."""
    a = jnp.asarray(rng.uniform(0.2, 0.8, size=(1, 32, 32, 3)).astype(np.float32))
    b = jnp.clip(a + 0.05, 0, 1)
    assert float(ssim(a, b)) > 0.8


def test_two_way_identification_extremes(rng):
    feats = jnp.asarray(rng.normal(size=(10, 64)).astype(np.float32))
    # identical features: every pair wins → 100%
    assert float(two_way_identification(feats, feats)) == 1.0
    # random vs random ≈ 50%
    g = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(200, 64)).astype(np.float32))
    assert abs(float(two_way_identification(g, t)) - 0.5) < 0.05


def test_feature_distance_zero_for_identical(rng):
    f = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32))
    assert float(feature_distance(f, f)) < 1e-5


def test_reconstruction_metrics_suite(rng):
    gen = jnp.asarray(rng.uniform(0, 1, size=(6, 16, 16, 3)).astype(np.float32))
    gt = jnp.clip(gen + 0.1 * rng.normal(size=gen.shape).astype(np.float32), 0, 1)
    out = reconstruction_metrics(
        gen, gt,
        feature_extractors={"flat": lambda x: x.reshape(x.shape[0], -1)},
    )
    assert set(out) == {"pixcorr", "ssim", "2way_flat", "dist_flat"}
    assert out["pixcorr"] > 0.8 and out["2way_flat"] > 0.9


def test_lowlevel_training_mesh_matches_single_device(rng, mesh8):
    """dp-sharded low-level training must track single-device training.

    Element-exact parity is not achievable here: the L1 subgradient is
    sign(pred-target) and Adam's early steps are ~sign(g)·lr, so the 8-way
    reduction-order noise flips signs of near-floor gradient elements and
    produces lr-scale param deltas that are NOT sharding bugs. The robust
    invariants: identical loss trajectory (catches wrong batch semantics /
    missing grad sync) and params agreeing to a few lr-steps.
    """
    import jax

    from eeg_image_decode_tpu.core.config import LowLevelConfig
    from eeg_image_decode_tpu.train.lowlevel import LowLevelTrainer

    eeg = rng.normal(size=(32, 63, 250)).astype(np.float32)
    lat = (rng.normal(size=(32, 4, 64, 64)) * 0.1).astype(np.float32)
    cfg = LowLevelConfig(epochs=3, batch_size=16, lr=1e-3, time_proj_dim=8)

    def make():
        return LowLevelTrainer(
            cfg,
            model=EncoderLowLevel(stage_channels=TINY_STAGES, time_proj_dim=8),
        )

    single = make()
    h_s = single.train(eeg, lat, seed=3, log_fn=None)
    sharded = make()
    sharded.mesh = mesh8
    h_m = sharded.train(eeg, lat, seed=3, log_fn=None)
    np.testing.assert_allclose(
        [h["loss"] for h in h_m], [h["loss"] for h in h_s], rtol=1e-2
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(
            {"p": single.state.params, "bs": single.state.batch_stats}
        ),
        jax.tree_util.tree_leaves(
            {"p": sharded.state.params, "bs": sharded.state.batch_stats}
        ),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-2
        )
