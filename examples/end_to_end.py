"""End-to-end walkthrough: retrieval training → feature export → diffusion
prior → image generation → reconstruction metrics.

Runs on synthetic data so it works without THINGS-EEG downloads; swap
``make_synthetic_retrieval_data`` for ``build_retrieval_data`` (+ a CLIP
feature cache) on real data. On CPU use:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python examples/end_to_end.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import (
    ContrastiveTrainConfig,
    PriorConfig,
)
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.eval import reconstruction_metrics
from eeg_image_decode_tpu.gen.sdxl import Generator4Embeds, GeneratorConfig
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train import ContrastiveTrainer
from eeg_image_decode_tpu.train.evaluator import retrieval_eval
from eeg_image_decode_tpu.train.prior import PriorPipe


def main():
    # — 1. data (synthetic THINGS-EEG-shaped) —
    train, test = make_synthetic_retrieval_data(
        n_classes=16, images_per_class=4, train_reps=2, clip_dim=64, snr=2.0
    )

    # — 2. contrastive encoder, reconstruction objective (the generation
    #      pipeline's encoder; use recon_loss=False for pure retrieval) —
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=32, epochs=4, lr=1e-3,
        recon_loss=True, eval_ks=(2, 16),
    )
    trainer = ContrastiveTrainer(
        build_encoder("nice", proj_dim=64), cfg, train, test
    )
    trainer.fit()
    print("retrieval eval:", trainer.evaluate())

    # — 3. export EEG features (the prior's training pairs) —
    feats_path = trainer.export_features("/tmp/eeg_features.npz")
    d = np.load(feats_path)

    # — 4. diffusion prior: EEG features → CLIP image-embedding space —
    h = d["img_features"]
    hmax = np.abs(h).max()
    pipe = PriorPipe(PriorConfig(
        embed_dim=64, cond_dim=64, hidden_dims=(256, 128, 64),
        time_embed_dim=64, epochs=200, batch_size=64, lr=1e-3,
        warmup_steps=100, num_inference_steps=50, guidance_scale=5.0,
    ))
    pipe.train(d["eeg_features"], h / hmax, log_fn=None)
    pipe.save("/tmp/diffusion_prior.pkl")

    gen_emb = pipe.generate(
        jnp.asarray(d["eeg_features_test"]), key=jax.random.key(0)
    )
    out = retrieval_eval(
        gen_emb, jnp.asarray(test.img_features / hmax),
        jnp.asarray(d["labels_test"]), ks=(2, 16), key=jax.random.key(1),
    )
    print("generated-embedding retrieval:",
          {k: round(float(v), 3) for k, v in out.items()})

    # — 5. images via the SDXL-style generator (tiny config; use
    #      GeneratorConfig() + gen/convert.py with real SDXL-turbo weights) —
    gen = Generator4Embeds(GeneratorConfig.tiny(), dtype=jnp.float32)
    gen.init(jax.random.key(0))
    # pad the 64-d demo embeddings to the generator's expected width
    emb = jnp.zeros((4, gen.config.unet.ip_image_embed_dim))
    emb = emb.at[:, :64].set(gen_emb[:4])
    imgs = gen.generate(emb, key=jax.random.key(2))
    print("generated images:", imgs.shape)

    # — 6. reconstruction metrics (vs themselves here, for demonstration) —
    print("metrics:", reconstruction_metrics(imgs, imgs))

    # — 7. semantic-level captions (random tiny GIT weights here; convert
    #      git-large-coco + the trained PixelProjector for real captions) —
    from eeg_image_decode_tpu.data.tokenizers import WordPieceTokenizer
    from eeg_image_decode_tpu.models.git_caption import (
        GITCaptioner,
        GITConfig,
        PixelProjector,
        caption_embeddings,
    )

    gcfg = GITConfig.tiny()
    cap = GITCaptioner(gcfg)
    variables = cap.init(
        jax.random.key(3),
        jnp.zeros((1, gcfg.num_visual_tokens, gcfg.visual_dim)),
        jnp.zeros((1, 2), jnp.int32),
    )
    proj_params = PixelProjector(
        num_tokens=gcfg.num_visual_tokens, out_dim=gcfg.visual_dim
    ).init(jax.random.key(4), jnp.zeros((1, 64)))["params"]
    vocab = ["[PAD]", "[CLS]", "[SEP]", "[UNK]"] + [
        f"word{i}" for i in range(4, gcfg.vocab_size)
    ]
    captions = caption_embeddings(
        cap, variables, proj_params, gen_emb[:4],
        WordPieceTokenizer(vocab), max_new_tokens=6,
    )
    print("captions:", captions)


if __name__ == "__main__":
    main()
