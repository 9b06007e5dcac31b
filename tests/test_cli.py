"""CLI retrieval-split plumbing.

The reference computes a SEPARATE test-split feature cache from the 200
zero-shot test concepts (``Retrieval/eegdatasets_leaveone.py:60-74``); those
concepts are disjoint from the 1654 train concepts, so the test gallery must
never be derived from the train features. These tests pin that the CLI
refuses train-only features and scores against the real test gallery.
"""

import argparse
import glob
import os

import numpy as np
import pytest

from eeg_image_decode_tpu import cli
from eeg_image_decode_tpu.data.features import save_features

from test_data import _write_subject


def _make_args(**kw):
    ns = argparse.Namespace(
        data_config=None, data_path=None, features=None, test_features=None,
        output_dir="./runs", epochs=1, batch_size=8, lr=1e-3, seed=0,
        dtype="float32",
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture
def things_with_features(tmp_path):
    """Fake THINGS tree + DISJOINT train/test feature sets with recognisable
    values (train features are all +1, test features all -1)."""
    n_cls = 6
    _write_subject(tmp_path, "sub-01", n_cls=n_cls, train=True, reps=4)
    _write_subject(tmp_path, "sub-01", n_cls=n_cls, train=False, reps=8)
    D = 16
    train_img = np.full((n_cls * 10, D), 1.0, np.float32)
    train_txt = np.full((n_cls, D), 1.0, np.float32)
    test_img = np.full((n_cls, D), -1.0, np.float32)
    test_txt = np.full((n_cls, D), -1.0, np.float32)
    train_file = tmp_path / "feat_train.npz"
    test_file = tmp_path / "feat_test.npz"
    save_features(str(train_file), img_features=train_img, text_features=train_txt)
    save_features(str(test_file), img_features=test_img, text_features=test_txt)
    return tmp_path, n_cls, str(train_file), str(test_file)


def test_split_uses_separate_test_gallery(things_with_features):
    path, n_cls, train_file, test_file = things_with_features
    args = _make_args(data_path=str(path), features=train_file,
                      test_features=test_file)
    train, test = cli._build_retrieval_splits(args, ["sub-01"])
    # the evaluator's gallery is test.class_img_features(); it must come from
    # the TEST feature file (-1s), never a slice of the train features (+1s)
    np.testing.assert_array_equal(test.class_img_features(),
                                  np.full((n_cls, 16), -1.0, np.float32))
    np.testing.assert_array_equal(test.text_features[0],
                                  np.full((16,), -1.0, np.float32))
    np.testing.assert_array_equal(train.img_features[0],
                                  np.full((16,), 1.0, np.float32))
    assert test.images_per_class == 1
    assert test.n == n_cls  # averaged reps → one trial per test concept


def test_split_accepts_multisplit_cache(things_with_features, tmp_path):
    path, n_cls, _, _ = things_with_features
    D = 16
    multi = tmp_path / "feat_multi.npz"
    save_features(
        str(multi),
        img_features=np.full((n_cls * 10, D), 1.0, np.float32),
        text_features=np.full((n_cls, D), 1.0, np.float32),
        img_features_test=np.full((n_cls, D), -2.0, np.float32),
        text_features_test=np.full((n_cls, D), -2.0, np.float32),
    )
    args = _make_args(data_path=str(path), features=str(multi))
    _, test = cli._build_retrieval_splits(args, ["sub-01"])
    np.testing.assert_array_equal(test.class_img_features(),
                                  np.full((n_cls, D), -2.0, np.float32))


def test_split_refuses_train_only_features(things_with_features):
    path, _, train_file, _ = things_with_features
    args = _make_args(data_path=str(path), features=train_file)
    with pytest.raises(SystemExit, match="test-split features"):
        cli._build_retrieval_splits(args, ["sub-01"])


def test_evaluator_scores_against_test_gallery(things_with_features):
    """End-to-end: the trainer's k-way eval must rank against the test
    gallery. With EEG-uncorrelated features, aligning the test gallery to a
    degenerate single direction makes all similarities equal — detectable
    only if the evaluator truly consumed the test features."""
    import jax

    from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train import ContrastiveTrainer

    path, n_cls, train_file, test_file = things_with_features
    args = _make_args(data_path=str(path), features=train_file,
                      test_features=test_file)
    train, test = cli._build_retrieval_splits(args, ["sub-01"])
    cfg = ContrastiveTrainConfig(encoder="nice", batch_size=16, epochs=1,
                                 lr=1e-3, eval_ks=(2, n_cls))
    trainer = ContrastiveTrainer(
        build_encoder("nice", proj_dim=16), cfg, train, test
    )
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(trainer.test_class_img_feat)),
        test.class_img_features(),
    )
    trainer.fit()
    assert np.isfinite(trainer.history[-1]["loss"])


# ————————————————— caption + metrics subcommands (ref notebooks) —————————————————


def _tiny_vocab_file(tmp_path, size=64):
    """vocab.txt whose ids cover the tiny GITConfig's 64-token space."""
    toks = ["[PAD]", "[CLS]", "[SEP]", "[UNK]"]
    toks += [f"tok{i}" for i in range(len(toks), size)]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(toks) + "\n")
    return str(p)


def test_cli_caption_tiny(tmp_path):
    """`caption --tiny`: embeddings → PixelProjector → greedy GIT → decoded
    lines, exercising the padded last batch (n=4, batch=3)."""
    emb = tmp_path / "emb.npy"
    np.save(emb, np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    out = tmp_path / "semantic_level_caption.txt"
    cli.main([
        "caption", "--embeddings", str(emb), "--tiny",
        "--vocab", _tiny_vocab_file(tmp_path),
        "--out", str(out), "--max-new-tokens", "5", "--caption-batch", "3",
    ])
    lines = out.read_text().splitlines()
    assert len(lines) == 4
    # padding must not leak: rows 3 (second batch) decoded independently of
    # the pad copies; determinism across runs
    cli.main([
        "caption", "--embeddings", str(emb), "--tiny",
        "--vocab", _tiny_vocab_file(tmp_path),
        "--out", str(out), "--max-new-tokens", "5", "--caption-batch", "4",
    ])
    assert out.read_text().splitlines() == lines


def test_cli_caption_token_ids_without_vocab(tmp_path):
    emb = tmp_path / "emb.npy"
    np.save(emb, np.zeros((2, 8), np.float32))
    out = tmp_path / "caps.txt"
    cli.main(["caption", "--embeddings", str(emb), "--tiny",
              "--out", str(out), "--max-new-tokens", "3"])
    lines = out.read_text().splitlines()
    assert len(lines) == 2
    assert all(tok.isdigit() for tok in lines[0].split())


def test_cli_metrics_identical_images(tmp_path, capsys):
    """Identical gen/GT → pixcorr == 1, ssim == 1; CSV written; directory
    layouts: cmd_generate class tree vs flat sorted dir."""
    from PIL import Image

    rng = np.random.default_rng(1)
    imgs = (rng.uniform(size=(3, 32, 32, 3)) * 255).astype(np.uint8)
    gen_dir, gt_dir = tmp_path / "gen", tmp_path / "gt"
    for i in range(3):
        d = gen_dir / f"class_{i:04d}"
        d.mkdir(parents=True)
        Image.fromarray(imgs[i]).save(d / "0.png")
        gt_dir.mkdir(exist_ok=True)
        Image.fromarray(imgs[i]).save(gt_dir / f"img_{i:03d}.png")
    csv = tmp_path / "metrics.csv"
    cli.main(["metrics", "--generated", str(gen_dir),
              "--ground-truth", str(gt_dir),
              "--image-size", "32", "--out", str(csv)])
    rows = dict(line.split(",") for line in
                csv.read_text().splitlines()[1:])
    assert float(rows["pixcorr"]) > 0.999
    assert float(rows["ssim"]) > 0.999


def test_cli_metrics_npy_inputs_and_mismatch(tmp_path):
    gen = tmp_path / "gen.npy"
    gt = tmp_path / "gt.npy"
    rng = np.random.default_rng(2)
    np.save(gen, rng.uniform(size=(4, 16, 16, 3)).astype(np.float32))
    np.save(gt, rng.uniform(size=(4, 16, 16, 3)).astype(np.float32))
    cli.main(["metrics", "--generated", str(gen), "--ground-truth", str(gt),
              "--image-size", "16"])
    np.save(gt, rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
    with pytest.raises(SystemExit, match="counts differ"):
        cli.main(["metrics", "--generated", str(gen),
                  "--ground-truth", str(gt), "--image-size", "16"])


def test_cli_generate_semantic_recombination(tmp_path):
    """Full C31 surface through the CLI: prior sampling + per-class caption
    prompts (encoded, not zeros) + low-level init latents, with a padded last
    batch (n=3, gen-batch=2). Ref ``1x1024_reconstruct_sdxl.ipynb`` 20-27."""
    import json
    import pickle

    import jax

    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.data.tokenizers import bytes_to_unicode
    from eeg_image_decode_tpu.gen.sdxl import GeneratorConfig
    from eeg_image_decode_tpu.gen.text_encoder import (
        SDXLTextEncoder,
        tiny_text_encoder_config,
    )
    from eeg_image_decode_tpu.train.prior import PriorPipe

    rng = np.random.default_rng(0)
    feats = tmp_path / "eeg_feats.npz"
    np.savez(feats, eeg_features_test=rng.normal(size=(3, 64)).astype(np.float32))

    pipe = PriorPipe(PriorConfig.tiny())
    pipe.init(total_steps=1)
    prior_file = tmp_path / "prior.pkl"
    with open(prior_file, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, pipe.state.params), f)

    # byte-level CLIP vocab (as in test_sdxl_text_encoder)
    chars = list(bytes_to_unicode().values())
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")

    gcfg = GeneratorConfig.tiny()
    te_cfg = tiny_text_encoder_config(gcfg.unet, str(tmp_path))
    te_params = SDXLTextEncoder(te_cfg).init(jax.random.key(3))
    te_file = tmp_path / "te.pkl"
    with open(te_file, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, te_params), f)

    caps = tmp_path / "caps.txt"
    caps.write_text("a cat\na dog\na house\n")
    lat = tmp_path / "latents.npy"
    h, w = gcfg.latent_size
    np.save(lat, rng.normal(size=(3, h, w, gcfg.unet.in_channels))
            .astype(np.float32))

    out = tmp_path / "imgs"
    cli.main([
        "generate", "--eeg-features", str(feats),
        "--prior-params", str(prior_file), "--tiny",
        "--text-encoder-params", str(te_file),
        "--tokenizer-dir", str(tmp_path),
        "--captions-file", str(caps),
        "--init-latents", str(lat), "--img2img-strength", "0.5",
        "--output-dir", str(out), "--seeds", "1", "--gen-batch", "2",
    ])
    for i in range(3):
        assert (out / f"class_{i:04d}" / "0.png").exists()

    # --resolution scales the latent grid (the reference's 1024² stage,
    # scaled to tiny: default 16px → 32px means 16×16 latents) and the
    # output pixels; init latents at the OLD size must be refused clearly
    from PIL import Image

    out2 = tmp_path / "imgs_hi"
    cli.main([
        "generate", "--eeg-features", str(feats),
        "--prior-params", str(prior_file), "--tiny",
        "--resolution", "32",
        "--output-dir", str(out2), "--seeds", "1", "--gen-batch", "2",
    ])
    im = Image.open(out2 / "class_0000" / "0.png")
    assert im.size == (32, 32), im.size
    with pytest.raises(SystemExit, match="latent size"):
        cli.main([
            "generate", "--eeg-features", str(feats),
            "--prior-params", str(prior_file), "--tiny",
            "--resolution", "32", "--init-latents", str(lat),
            "--output-dir", str(out2), "--seeds", "1", "--gen-batch", "2",
        ])
    with pytest.raises(SystemExit, match="multiple of"):
        cli.main([
            "generate", "--eeg-features", str(feats),
            "--prior-params", str(prior_file), "--tiny",
            "--resolution", "33",
            "--output-dir", str(out2), "--seeds", "1",
        ])


def test_cli_generate_reference_layout_and_metrics_interop(tmp_path, capsys):
    """``generate --class-names --sub`` writes the reference's
    ``generated_imgs/<sub>/<class-name>/<j>.png`` tree
    (``Generation_metrics_sub8.ipynb`` cell 9) and ``metrics --class-names``
    scores it in TEST-CLASS order (class names that don't sort
    alphabetically would silently misalign otherwise)."""
    import json
    import pickle

    import jax

    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.train.prior import PriorPipe

    rng = np.random.default_rng(1)
    feats = tmp_path / "f.npz"
    np.savez(feats,
             eeg_features_test=rng.normal(size=(3, 64)).astype(np.float32))
    pipe = PriorPipe(PriorConfig.tiny())
    pipe.init(total_steps=1)
    prior_file = tmp_path / "prior.pkl"
    pipe.save_with_config(str(prior_file))

    names = tmp_path / "names.txt"
    # deliberately NOT in alphabetical order
    names.write_text("zebra\naardvark_01\nmug\n")

    out = tmp_path / "generated_imgs"
    cli.main([
        "generate", "--eeg-features", str(feats),
        "--prior-params", str(prior_file), "--tiny",
        "--class-names", str(names), "--sub", "sub-08",
        "--output-dir", str(out), "--seeds", "1", "--gen-batch", "2",
    ])
    capsys.readouterr()
    for cls in ("zebra", "aardvark_01", "mug"):
        assert (out / "sub-08" / cls / "0.png").exists()

    # ground truth = the generated images themselves, in test-class order →
    # perfect scores only if the metrics reader follows the names file order
    from PIL import Image

    gt = np.stack([
        np.asarray(
            Image.open(out / "sub-08" / cls / "0.png"), np.float32
        ) / 255.0
        for cls in ("zebra", "aardvark_01", "mug")
    ])
    gt_file = tmp_path / "gt.npy"
    np.save(gt_file, gt)
    cli.main([
        "metrics", "--generated", str(out / "sub-08"),
        "--ground-truth", str(gt_file),
        "--class-names", str(names), "--image-size", "16",
    ])
    scores = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert scores["pixcorr"] > 0.999  # aligned ⇒ identical pairs


def test_cli_generate_refuses_misaligned_captions(tmp_path):
    import pickle

    import jax

    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.train.prior import PriorPipe

    feats = tmp_path / "f.npz"
    np.savez(feats, eeg_features_test=np.zeros((3, 64), np.float32))
    pipe = PriorPipe(PriorConfig.tiny())
    pipe.init(total_steps=1)
    prior_file = tmp_path / "prior.pkl"
    with open(prior_file, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, pipe.state.params), f)
    caps = tmp_path / "caps.txt"
    caps.write_text("only one line\n")
    with pytest.raises(SystemExit, match="needs --text-encoder-params"):
        cli.main(["generate", "--eeg-features", str(feats),
                  "--prior-params", str(prior_file), "--tiny",
                  "--captions-file", str(caps),
                  "--output-dir", str(tmp_path / "o")])


# ———————————————— train-adapter subcommand (image_adapter.ipynb) ————————————————


def test_cli_train_adapter_precomputed_grids(tmp_path, capsys):
    """`train-adapter` on precomputed embeddings + grids: trains, saves the
    params pickle, reports a held-out test MSE, and the loss decreases."""
    import json as _json
    import pickle

    rng = np.random.default_rng(0)
    emb = tmp_path / "emb.npz"
    grids = tmp_path / "grids.npz"
    # learnable mapping: grids derived linearly from the embeddings
    x = rng.normal(size=(12, 8)).astype(np.float32)
    w = rng.normal(size=(8, 3 * 16)).astype(np.float32) * 0.1
    y = (x @ w).reshape(12, 3, 16)
    np.savez(emb, img_features=x)
    np.savez(grids, grids=y)
    out = tmp_path / "proj.pkl"
    cli.main([
        "train-adapter", "--embeddings", str(emb), "--grids", str(grids),
        "--test-embeddings", str(emb), "--test-grids", str(grids),
        "--epochs", "5", "--batch-size", "4", "--out", str(out),
    ])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(out)
    with open(out, "rb") as f:
        params = pickle.load(f)
    assert "tokens" in params or len(params) > 0
    assert np.isfinite(res["final_train_loss"])
    assert res["test_mse"] <= res["final_train_loss"] * 2 + 1e-3


def test_cli_train_adapter_mismatched_counts(tmp_path):
    emb = tmp_path / "emb.npy"
    grids = tmp_path / "grids.npz"
    np.save(emb, np.zeros((4, 8), np.float32))
    np.savez(grids, grids=np.zeros((5, 3, 16), np.float32))
    with pytest.raises(SystemExit, match="counts differ"):
        cli.main(["train-adapter", "--embeddings", str(emb),
                  "--grids", str(grids), "--epochs", "1",
                  "--batch-size", "2", "--out", str(tmp_path / "p.pkl")])


def test_cli_train_adapter_from_images(tmp_path, capsys):
    """`train-adapter --images-dir`: grids encoded natively through the tiny
    flax GIT vision tower and content-key cached, then the adapter trains
    against them (the full in-framework replacement for the reference's
    external ViT-L-14_features_GIT_train.pt)."""
    import glob
    import json as _json
    import pickle

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from eeg_image_decode_tpu.models.clip_vit import (
        CLIPVisionConfig,
        CLIPVisionTower,
    )

    rng = np.random.default_rng(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(5):
        arr = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img_{i}.png")

    tower = CLIPVisionTower(CLIPVisionConfig.tiny())
    vparams = tower.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    vp_file = tmp_path / "vision.pkl"
    with open(vp_file, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, vparams), f)

    emb = tmp_path / "emb.npy"
    np.save(emb, rng.normal(size=(5, 8)).astype(np.float32))
    out = tmp_path / "proj.pkl"
    cache_dir = tmp_path / "cache"
    cli.main([
        "train-adapter", "--embeddings", str(emb),
        "--images-dir", str(img_dir), "--git-vision-params", str(vp_file),
        "--cache-dir", str(cache_dir), "--grid-batch", "2", "--tiny",
        "--epochs", "2", "--batch-size", "5", "--out", str(out),
    ])
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(res["final_train_loss"])
    caches = glob.glob(str(cache_dir / "ViT-L-14-GIT-grid*.npz"))
    assert len(caches) == 1  # content-keyed grid cache written
    grids = np.load(caches[0])["grids"]
    assert grids.shape == (5, 17, 64)  # (N, 1+ (32/8)², width)
    with open(out, "rb") as f:
        params = pickle.load(f)
    assert params  # trained adapter params saved


def test_cli_export_features_flag(tmp_path):
    """`train-retrieval --export-features`: after training, the CLI writes
    the EEG-feature npz the prior trainer consumes (the reference's
    ATM_S_eeg_features_sub-08{,_test}.pt hand-off, ATMS_reconstruction.py)."""
    from test_data import _write_subject
    from eeg_image_decode_tpu.data.features import save_features

    n_cls = 6
    _write_subject(tmp_path, "sub-01", n_cls=n_cls, train=True, reps=4)
    _write_subject(tmp_path, "sub-01", n_cls=n_cls, train=False, reps=8)
    rng = np.random.default_rng(0)
    D = 1024
    save_features(
        str(tmp_path / "f.npz"),
        img_features=rng.normal(size=(n_cls * 10, D)).astype(np.float32),
        text_features=rng.normal(size=(n_cls, D)).astype(np.float32),
        img_features_test=rng.normal(size=(n_cls, D)).astype(np.float32),
        text_features_test=rng.normal(size=(n_cls, D)).astype(np.float32),
    )
    exported = tmp_path / "eeg_feats.npz"
    cli.main([
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "nice", "--subjects", "sub-01",
        "--batch-size", "16", "--dtype", "float32", "--eval-ks", "2,6",
        "--epochs", "1", "--output-dir", str(tmp_path / "runs"),
        "--export-features", str(exported),
    ])
    d = np.load(exported)
    n_train = n_cls * 10 * 4  # images/class × reps
    assert d["eeg_features"].shape == (n_train, D)
    assert d["eeg_features_test"].shape == (n_cls, D)  # test reps averaged
    assert d["img_features"].shape == (n_train, D)
    assert d["labels_test"].shape == (n_cls,)
    assert np.isfinite(d["eeg_features"]).all()
    # img_features is already rep-aligned with eeg_features (the prior
    # trainer's (c, h) pair needs no further expansion)
    assert d["img_features"].shape == d["eeg_features"].shape


def _write_two_subject_tree(tmp_path, n_cls=6):
    from test_data import _write_subject
    from eeg_image_decode_tpu.data.features import save_features

    for sub in ("sub-01", "sub-02"):
        _write_subject(tmp_path, sub, n_cls=n_cls, train=True, reps=4)
        _write_subject(tmp_path, sub, n_cls=n_cls, train=False, reps=8)
    rng = np.random.default_rng(0)
    D = 1024  # NICE projects to the CLIP width
    save_features(
        str(tmp_path / "f.npz"),
        img_features=rng.normal(size=(n_cls * 10, D)).astype(np.float32),
        text_features=rng.normal(size=(n_cls, D)).astype(np.float32),
        img_features_test=rng.normal(size=(n_cls, D)).astype(np.float32),
        text_features_test=rng.normal(size=(n_cls, D)).astype(np.float32),
    )
    return n_cls


def test_cli_sweep_per_subject(tmp_path, capsys):
    """`--sweep` = the reference's main loop (ATMS_retrieval.py:544-583):
    one FRESH model per listed subject, plus an aggregate summary CSV."""
    import csv as _csv

    n_cls = _write_two_subject_tree(tmp_path)
    cli.main([
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "nice", "--subjects", "sub-01,sub-02", "--sweep",
        "--batch-size", "16", "--dtype", "float32", "--eval-ks", "2,6",
        "--epochs", "1", "--output-dir", str(tmp_path / "runs"),
        "--export-features", str(tmp_path / "feats"),
    ])
    with open(tmp_path / "runs" / "sweep_summary.csv") as f:
        rows = list(_csv.DictReader(f))
    assert [r["subject"] for r in rows] == ["sub-01", "sub-02"]
    assert all(float(r["loss"]) > 0 for r in rows)
    # per-subject exports land as <dir>/<subject>.npz
    for sub in ("sub-01", "sub-02"):
        d = np.load(tmp_path / "feats" / f"{sub}.npz")
        assert d["eeg_features_test"].shape[0] == n_cls


def test_cli_sweep_cross_subject(tmp_path):
    """`--sweep --cross-subject` = leave-one-out per subject: each round
    trains on the OTHER subjects and tests on the held-out one (reference
    else-branch, ATMS_retrieval.py:553-555)."""
    import csv as _csv

    _write_two_subject_tree(tmp_path)
    cli.main([
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "nice", "--subjects", "sub-01,sub-02",
        "--sweep", "--cross-subject",
        "--batch-size", "16", "--dtype", "float32", "--eval-ks", "2,6",
        "--epochs", "1", "--output-dir", str(tmp_path / "runs"),
    ])
    with open(tmp_path / "runs" / "sweep_summary.csv") as f:
        rows = list(_csv.DictReader(f))
    assert [r["subject"] for r in rows] == ["sub-01", "sub-02"]
    # each round leaves its subject out of training: run dirs are tagged
    runs = os.listdir(tmp_path / "runs" / "contrast" / "nice")
    assert sorted(runs) == ["cross_exclude_sub-01", "cross_exclude_sub-02"]


def test_cli_train_retrieval_shard_data(tmp_path):
    """`--mesh --shard-data`: the dp-sharded resident mode through the full
    user path (the sample arrays live N/dp per device; the run must train
    and write the normal results.csv)."""
    import csv as _csv

    _write_two_subject_tree(tmp_path)
    cli.main([
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "nice", "--subjects", "sub-01",
        "--batch-size", "16", "--dtype", "float32", "--eval-ks", "2,6",
        "--epochs", "2", "--output-dir", str(tmp_path / "runs"),
        "--mesh", "--shard-data",
    ])
    path = glob.glob(
        str(tmp_path / "runs" / "**" / "results.csv"), recursive=True
    )[0]
    with open(path, newline="") as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 2
    assert all(np.isfinite(float(r["loss"])) for r in rows)


def test_cli_sweep_rejects_bad_compositions(tmp_path):
    _write_two_subject_tree(tmp_path)
    base = [
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "nice", "--subjects", "sub-01,sub-02", "--sweep",
        "--batch-size", "16", "--dtype", "float32", "--epochs", "1",
        "--output-dir", str(tmp_path / "runs"),
    ]
    with pytest.raises(SystemExit, match="resume"):
        cli.main(base + ["--resume-dir", str(tmp_path / "runs")])
    with pytest.raises(SystemExit, match="joint"):
        cli.main(base + ["--joint", "--test-subject", "sub-01"])


def test_cli_evaluate_trained_checkpoint(tmp_path, capsys):
    """`evaluate`: restore a train-retrieval checkpoint and score the k-way
    table standalone — deterministic across invocations, and a clear error
    when the encoder does not match the checkpoint."""
    import json as _json

    _write_two_subject_tree(tmp_path)
    cli.main([
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "nice", "--subjects", "sub-01",
        "--batch-size", "16", "--dtype", "float32", "--eval-ks", "2,6",
        "--epochs", "1", "--output-dir", str(tmp_path / "runs"),
    ])
    run_dir = None
    base = tmp_path / "runs" / "contrast" / "nice" / "sub-01"
    run_dir = str(base / os.listdir(base)[0])

    def score():
        capsys.readouterr()
        cli.main([
            "evaluate", "--run-dir", run_dir,
            "--data-path", str(tmp_path),
            "--features", str(tmp_path / "f.npz"),
            "--encoder", "nice", "--subjects", "sub-01",
            "--dtype", "float32", "--eval-ks", "2,6",
            "--csv", str(tmp_path / "eval.csv"),
        ])
        return _json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    row1, row2 = score(), score()
    assert row1 == row2  # seeded distractors → reproducible table
    assert row1["step"] == 1 and row1["n_test"] == 6
    assert 0.0 <= row1["top1_k2"] <= 1.0 and 0.0 <= row1["top1_k6"] <= 1.0
    assert os.path.exists(tmp_path / "eval.csv")

    with pytest.raises(SystemExit, match="does not match encoder"):
        cli.main([
            "evaluate", "--run-dir", run_dir,
            "--data-path", str(tmp_path),
            "--features", str(tmp_path / "f.npz"),
            "--encoder", "eegnetv4", "--subjects", "sub-01",
            "--dtype", "float32", "--eval-ks", "2,6",
        ])


def test_cli_features_things_layout(tmp_path, capsys):
    """`features`: THINGS class-dir tree → content-keyed CLIP cache with
    one prompt per class ("This picture is <concept>") and one row per
    image, loadable by the retrieval split machinery."""
    import json as _json
    import pickle

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from eeg_image_decode_tpu.data.features import load_features
    from eeg_image_decode_tpu.data.tokenizers import bytes_to_unicode
    from eeg_image_decode_tpu.models.clip_vit import (
        CLIPTextConfig, CLIPTextTower, CLIPVisionConfig, CLIPVisionTower,
    )

    rng = np.random.default_rng(0)
    img_root = tmp_path / "training_images"
    for c, name in enumerate(["00001_aardvark", "00002_abacus", "oddball"]):
        d = img_root / name
        d.mkdir(parents=True)
        for j in range(2):
            arr = rng.integers(0, 255, size=(24, 24, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{j}.jpg")

    # tiny tokenizer files (byte vocab + specials, no merges)
    chars = list(bytes_to_unicode().values())
    vocab = {c: i for i, c in enumerate(chars)}
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(_json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")

    vcfg = CLIPVisionConfig.tiny()
    tcfg = CLIPTextConfig(vocab_size=len(vocab), context_length=16, width=32,
                          layers=2, heads=2, embed_dim=vcfg.embed_dim)
    vt, tt = CLIPVisionTower(vcfg), CLIPTextTower(tcfg)
    vp = vt.init(jax.random.key(0),
                 jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))["params"]
    tp = tt.init(jax.random.key(1), jnp.zeros((1, 16), jnp.int32))["params"]
    with open(tmp_path / "clip.pkl", "wb") as f:
        pickle.dump({"vision": vp, "text": tp}, f)

    capsys.readouterr()
    cli.main([
        "features", "--images-dir", str(img_root),
        "--clip-params", str(tmp_path / "clip.pkl"),
        "--vocab", str(tmp_path / "vocab.json"),
        "--merges", str(tmp_path / "merges.txt"),
        "--cache-dir", str(tmp_path / "cache"), "--split", "train",
        "--tiny", "--batch-size", "4",
    ])
    info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["n_images"] == 6 and info["n_classes"] == 3
    d = load_features(info["cache"])
    assert d["img_features"].shape == (6, vcfg.embed_dim)
    assert d["text_features"].shape == (3, vcfg.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(d["img_features"], axis=-1), 1.0, atol=1e-5)

    # --raw: generation-pipeline embeddings, not L2-normalized, separate key
    capsys.readouterr()
    cli.main([
        "features", "--images-dir", str(img_root),
        "--clip-params", str(tmp_path / "clip.pkl"),
        "--vocab", str(tmp_path / "vocab.json"),
        "--merges", str(tmp_path / "merges.txt"),
        "--cache-dir", str(tmp_path / "cache"), "--split", "train",
        "--tiny", "--raw",
    ])
    raw_info = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert raw_info["cache"] != info["cache"]
    raw = load_features(raw_info["cache"])
    assert not np.allclose(np.linalg.norm(raw["img_features"], axis=-1), 1.0)


def test_cli_features_rejects_bad_params_pickle(tmp_path):
    import pickle

    (tmp_path / "imgs" / "00001_x").mkdir(parents=True)
    from PIL import Image
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        tmp_path / "imgs" / "00001_x" / "a.jpg")
    with open(tmp_path / "bad.pkl", "wb") as f:
        pickle.dump({"vision_only": 1}, f)
    (tmp_path / "vocab.json").write_text("{}")
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    with pytest.raises((SystemExit, KeyError)):
        cli.main([
            "features", "--images-dir", str(tmp_path / "imgs"),
            "--clip-params", str(tmp_path / "bad.pkl"),
            "--vocab", str(tmp_path / "vocab.json"),
            "--merges", str(tmp_path / "merges.txt"),
            "--cache-dir", str(tmp_path / "cache"), "--tiny",
        ])


def test_cli_evaluate_missing_checkpoint_clear_error(tmp_path):
    (tmp_path / "empty_run").mkdir()
    _write_two_subject_tree(tmp_path)
    with pytest.raises(SystemExit, match="no checkpoints"):
        cli.main([
            "evaluate", "--run-dir", str(tmp_path / "empty_run"),
            "--data-path", str(tmp_path),
            "--features", str(tmp_path / "f.npz"),
            "--encoder", "nice", "--subjects", "sub-01",
            "--dtype", "float32", "--eval-ks", "2,6",
        ])


def test_cli_subjects_all_expands_from_data_dir(tmp_path):
    """`--subjects all` scans sub-* dirs (reference hardcodes the list)."""
    _write_two_subject_tree(tmp_path)
    args = argparse.Namespace(subjects="all", data_config=None,
                              data_path=str(tmp_path))
    assert cli._resolve_subjects(args) == ["sub-01", "sub-02"]
    args.subjects = "sub-02"
    assert cli._resolve_subjects(args) == ["sub-02"]
    empty = tmp_path / "none"
    empty.mkdir()
    args.subjects, args.data_path = "all", str(empty)
    with pytest.raises(SystemExit, match="no sub-"):
        cli._resolve_subjects(args)


def test_cli_export_checkpoint_roundtrip(tmp_path):
    """`export-checkpoint`: a run trained HERE exports to the reference's
    state_dict format and loads back through the import converter with the
    identical forward (the reverse-migration path)."""
    import pickle

    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.config import ATMSConfig
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.utils.convert import convert_atms_state_dict

    _write_two_subject_tree(tmp_path)
    cli.main([
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "atms", "--subjects", "sub-01",
        "--batch-size", "16", "--dtype", "float32", "--eval-ks", "2,6",
        "--epochs", "1", "--output-dir", str(tmp_path / "runs"),
    ])
    base = tmp_path / "runs" / "contrast" / "atms" / "sub-01"
    run_dir = str(base / os.listdir(base)[0])
    out = tmp_path / "exported.pth"
    cli.main(["export-checkpoint", "--run-dir", run_dir, "--out", str(out)])

    try:
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(out, weights_only=True).items()}
    except ImportError:
        with open(out, "rb") as f:
            sd = pickle.load(f)
    assert "logit_scale" in sd and "proj_eeg.2.bias" in sd

    variables = convert_atms_state_dict(sd)
    # the fixture subjects carry 300 post-window timepoints (test_data's
    # _write_subject grid), so the trained/exported value embedding is
    # (300, 250) — rebuild at that seq_len
    model = build_encoder("atms", config=ATMSConfig(seq_len=300))
    rng_l = np.random.default_rng(0)
    x = rng_l.normal(size=(2, 63, 300)).astype(np.float32)
    feats, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.ones((2,), jnp.int32), deterministic=True,
    )
    assert np.isfinite(np.asarray(feats)).all()


def test_cli_serve_caption_end_to_end(tmp_path, monkeypatch):
    """`cli serve --git-params ...` exposes /v1/caption: a trained run dir +
    tiny prior/GIT/projector artifacts serve caption strings over HTTP, with
    all three services warmed at startup (no compile on the live path)."""
    import dataclasses
    import json
    import pickle
    import urllib.request

    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu import server as server_mod
    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.models.git_caption import (
        GITCaptioner,
        GITConfig,
        PixelProjector,
    )
    from eeg_image_decode_tpu.train.prior import PriorPipe

    _write_two_subject_tree(tmp_path)
    cli.main([
        "train-retrieval", "--data-path", str(tmp_path),
        "--features", str(tmp_path / "f.npz"),
        "--encoder", "atms", "--subjects", "sub-01",
        "--batch-size", "16", "--dtype", "float32", "--eval-ks", "2,6",
        "--epochs", "1", "--output-dir", str(tmp_path / "runs"),
    ])
    base = tmp_path / "runs" / "contrast" / "atms" / "sub-01"
    run_dir = str(base / os.listdir(base)[0])

    # config-carrying prior pickle: cond 1024 (the encoder's CLIP width),
    # embed 64 (what GeneratorConfig.tiny's IP-adapter projection accepts)
    pcfg = PriorConfig(
        embed_dim=64, cond_dim=1024, hidden_dims=(32, 16),
        time_embed_dim=16, num_inference_steps=3, guidance_scale=2.0,
    )
    pipe = PriorPipe(pcfg)
    pipe.init(total_steps=1)
    prior_file = tmp_path / "prior.pkl"
    with open(prior_file, "wb") as f:
        pickle.dump({
            "params": jax.tree.map(np.asarray, pipe.state.params),
            "config": dataclasses.asdict(pcfg),
        }, f)

    gcfg = GITConfig.tiny()
    cap = GITCaptioner(gcfg)
    git_params = cap.init(
        jax.random.key(0),
        jnp.zeros((1, gcfg.num_visual_tokens, gcfg.visual_dim)),
        jnp.zeros((1, 2), jnp.int32),
    )["params"]
    proj = PixelProjector(num_tokens=gcfg.num_visual_tokens,
                          out_dim=gcfg.visual_dim)
    proj_params = proj.init(jax.random.key(1),
                            jnp.zeros((1, 64)))["params"]
    git_file = tmp_path / "git.pkl"
    proj_file = tmp_path / "proj.pkl"
    with open(git_file, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, git_params), f)
    with open(proj_file, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, proj_params), f)

    holder = {}

    def fake_serve_forever(self, host="127.0.0.1", port=8080):
        holder["port"] = self.start(host, 0)
        holder["srv"] = self

    monkeypatch.setattr(server_mod.EEGDecodeServer, "serve_forever",
                        fake_serve_forever)
    cli.main([
        "serve", "--run-dir", run_dir, "--features", str(tmp_path / "f.npz"),
        "--encoder", "atms", "--channels", "63", "--timepoints", "300",
        "--dtype", "float32", "--tiny", "--max-batch", "8",
        "--gen-batch", "2",
        "--prior-params", str(prior_file), "--git-params", str(git_file),
        "--projector-params", str(proj_file),
        "--vocab", _tiny_vocab_file(tmp_path), "--max-new-tokens", "4",
    ])
    try:
        rng = np.random.default_rng(0)
        eeg = rng.normal(size=(2, 63, 300)).astype(np.float32)
        body = json.dumps({"eeg": eeg.tolist(), "subject_ids": [1, 1]},
                          ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{holder['port']}/v1/caption", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["captions"]) == 2
        assert all(isinstance(c, str) for c in out["captions"])
        # health endpoint lists all three services
        with urllib.request.urlopen(
            f"http://127.0.0.1:{holder['port']}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert set(health["services"]) >= {"retrieval", "reconstruction",
                                           "caption"}
    finally:
        holder["srv"].stop()
