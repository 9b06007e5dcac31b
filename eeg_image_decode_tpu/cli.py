"""Command-line interface.

One entry point replaces the reference's six argparse scripts
(``ATMS_retrieval.py``, ``ATMS_retrieval_joint_train.py``,
``contrast_retrieval.py``, ``ATMS_reconstruction.py``, ``diffusion_prior``
notebook cells, ``train_vae_latent_512_low_level_no_average.py``,
``preprocessing.py``):

    python -m eeg_image_decode_tpu.cli train-retrieval --encoder atms --subjects sub-01
    python -m eeg_image_decode_tpu.cli train-retrieval --joint --test-subject sub-01
    python -m eeg_image_decode_tpu.cli train-recon    --encoder atms --subjects sub-08
    python -m eeg_image_decode_tpu.cli train-prior    --eeg-features f.npz --out prior/
    python -m eeg_image_decode_tpu.cli train-lowlevel --subjects sub-08 --latents l.npz
    python -m eeg_image_decode_tpu.cli preprocess     --sub 1 --data-root Raw/
    python -m eeg_image_decode_tpu.cli caption        --eeg-features f.npz --prior-params p.pkl
    python -m eeg_image_decode_tpu.cli metrics        --generated imgs/ --ground-truth gt/
    python -m eeg_image_decode_tpu.cli smoke          # synthetic end-to-end

Dataset paths come from ``--data-config`` (the reference's
``data_config.json`` format) or explicit flags.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

import numpy as np


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--data-config", default=None,
                   help="path to data_config.json (reference format)")
    p.add_argument("--data-path", default=None)
    p.add_argument("--features", default=None,
                   help=".npz with img_features/text_features (see data.features)")
    p.add_argument("--test-features", default=None,
                   help=".npz with the 200 disjoint TEST-concept features "
                        "(img_features/text_features); alternatively embed "
                        "img_features_test/text_features_test in --features")
    p.add_argument("--output-dir", default="./runs")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--eval-ks", default=None,
                   help="comma-separated k-way eval sizes (default 2,4,10,"
                        "50,100,200 — shrink for small test galleries)")


def _resolve_data_path(args) -> str:
    if args.data_path:
        return args.data_path
    if args.data_config:
        with open(args.data_config) as f:
            return json.load(f)["data_path"]
    raise SystemExit("need --data-path or --data-config")


def _load_feature_file(path: str):
    from eeg_image_decode_tpu.data.features import load_features

    d = load_features(path)
    return d["img_features"], d["text_features"]


def _resolve_test_features(args, train_dict):
    """Test-split CLIP features for the retrieval gallery.

    THINGS test classes are 200 zero-shot concepts DISJOINT from the 1654
    train concepts, each with its own image + text feature
    (ref ``Retrieval/eegdatasets_leaveone.py:60-74`` computes a separate
    ``ViT-H-14_features_test.pt``). Accepted sources, in order:

    1. ``--test-features test.npz`` (img_features/text_features for the 200
       test concepts);
    2. ``img_features_test``/``text_features_test`` keys inside the main
       ``--features`` file (one multi-split cache).

    Deriving a gallery by slicing the *train* features is wrong on real data
    and is refused.
    """
    if getattr(args, "test_features", None):
        return _load_feature_file(args.test_features)
    if "img_features_test" in train_dict and "text_features_test" in train_dict:
        return train_dict["img_features_test"], train_dict["text_features_test"]
    raise SystemExit(
        "need test-split features: pass --test-features test.npz, or include "
        "img_features_test/text_features_test in the --features file (THINGS "
        "test concepts are disjoint from train concepts — the train features "
        "cannot stand in for the test gallery)"
    )


def _build_retrieval_splits(
    args, subjects, *, train_exclude=None, test_subject=None, average_test=True
):
    """Three protocols (ref scripts):
    - in-subject (default): subjects=[one], no exclusions
    - joint (C18): train on ALL subjects (the reference keeps the test
      subject in training — the skip is commented out,
      eegdatasets_joint_subjects.py:153-154); test on ``test_subject``
    - cross-subject / leave-one-out: ``train_exclude`` drops the test subject
      from training; test on it
    """
    from eeg_image_decode_tpu.data.features import load_features
    from eeg_image_decode_tpu.data.things_eeg import build_retrieval_data

    data_path = _resolve_data_path(args)
    if not args.features:
        raise SystemExit(
            "need --features (precomputed CLIP cache .npz; see "
            "eeg_image_decode_tpu.data.features.load_or_compute_clip_features)"
        )
    feats = load_features(args.features)
    img, txt = feats["img_features"], feats["text_features"]
    test_img, test_txt = _resolve_test_features(args, feats)
    kw = {}
    if getattr(args, "images_per_class", None):
        kw["images_per_class"] = args.images_per_class  # MEG: 12
    if getattr(args, "train_reps", None):
        kw["train_reps"] = args.train_reps  # MEG: 1
    train = build_retrieval_data(
        data_path, subjects, train=True, img_features=img, text_features=txt,
        exclude_subject=train_exclude, **kw,
    )
    test = build_retrieval_data(
        data_path, subjects, train=False,
        img_features=test_img, text_features=test_txt,
        exclude_subject=test_subject, average_test_reps=average_test,
    )
    return train, test


def _resolve_subjects(args) -> list[str]:
    """``--subjects all`` → every ``sub-*`` directory under the data path
    (the reference hardcodes the sub-01..sub-10 list, ``ATMS_retrieval.py:527``)."""
    if args.subjects != "all":
        return args.subjects.split(",")
    root = _resolve_data_path(args)
    subs = sorted(
        d for d in os.listdir(root)
        if d.startswith("sub-") and os.path.isdir(os.path.join(root, d))
    )
    if not subs:
        raise SystemExit(f"--subjects all: no sub-* directories under {root}")
    return subs


def cmd_train_retrieval(args):
    subjects = _resolve_subjects(args)
    if getattr(args, "sweep", False):
        return _train_retrieval_sweep(args, subjects)
    _train_retrieval_one(args, subjects)


def _train_retrieval_sweep(args, subjects):
    """Per-subject sweep: a FRESH model per subject, like the reference's
    main loop (ATMS_retrieval.py:544-583 — in-subject trains/tests on each
    subject in turn; cross-subject leaves each one out of training and
    tests on it). Writes ``<output-dir>/sweep_summary.csv`` with one row
    per subject plus the per-run CSVs each trainer already produces."""
    if args.resume_dir:
        raise SystemExit(
            "--sweep does not compose with --resume-dir "
            "(resume the individual run instead)"
        )
    if args.joint:
        raise SystemExit(
            "--sweep is for the in-subject/cross-subject protocols; "
            "joint training is one model over all subjects already"
        )
    os.makedirs(args.output_dir, exist_ok=True)
    summary = os.path.join(args.output_dir, "sweep_summary.csv")
    rows = []
    for sub in subjects:
        if getattr(args, "cross_subject", False):
            row = _train_retrieval_one(
                args, subjects, sweep_subject=sub, protocol="cross"
            )
        else:
            row = _train_retrieval_one(args, [sub], sweep_subject=sub)
        rows.append({"subject": sub, **row})
        # rewrite after every subject: a crash in round k must not discard
        # the k-1 completed rounds' aggregate
        with open(summary, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    print(f"sweep summary: {summary}")
    print(json.dumps(rows))


def _train_retrieval_one(args, subjects, *, sweep_subject=None, protocol=None):
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.checkpoint import Checkpointer, run_directory
    from eeg_image_decode_tpu.core.config import ATMSConfig, ContrastiveTrainConfig
    from eeg_image_decode_tpu.core.mesh import create_mesh
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train import ContrastiveTrainer

    kw = {}
    if getattr(args, "eval_ks", None):
        kw["eval_ks"] = tuple(int(k) for k in args.eval_ks.split(","))
    cfg = ContrastiveTrainConfig(
        encoder=args.encoder,
        batch_size=args.batch_size or (16 if args.joint else 1024),
        epochs=args.epochs or 40,
        lr=args.lr or 3e-4,
        recon_loss=args.recon,
        seed=args.seed,
        host_dtype=getattr(args, "host_dtype", None),
        **kw,
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.encoder == "atms":
        model = build_encoder(
            "atms", config=ATMSConfig(joint_train=args.joint), dtype=dtype
        )
    else:
        model = build_encoder(args.encoder, dtype=dtype)

    test_subject = sweep_subject if protocol == "cross" else args.test_subject
    if protocol == "cross" or getattr(args, "cross_subject", False):
        # leave-one-out: drop the test subject from training
        train, test = _build_retrieval_splits(
            args, subjects,
            train_exclude=test_subject, test_subject=test_subject,
        )
    elif args.joint:
        # joint: all subjects train (incl. the test subject), eval on one
        train, test = _build_retrieval_splits(
            args, subjects, test_subject=args.test_subject
        )
    else:
        train, test = _build_retrieval_splits(args, subjects)
    mesh = create_mesh() if args.mesh else None
    if args.resume_dir:
        out = args.resume_dir
    else:
        run_id = time.strftime("%Y-%m-%d_%H-%M-%S")
        # in a sweep the round's subject names the run dir — never a stray
        # --test-subject, which would collapse all rounds into one directory
        sub_tag = sweep_subject or test_subject or subjects[0]
        if protocol == "cross":
            sub_tag = f"cross_exclude_{sub_tag}"
        out = run_directory(args.output_dir, args.encoder, sub_tag, run_id)
    ckpt = Checkpointer(os.path.join(out, "ckpt"))
    trainer = ContrastiveTrainer(
        model, cfg, train, test, mesh=mesh, output_dir=out, checkpointer=ckpt,
        streaming=getattr(args, "streaming", False),
        shard_samples=getattr(args, "shard_data", False),
    )
    if args.resume_dir:
        start = trainer.resume()
        print(f"resumed {out} at epoch {start}")
    trainer.fit()
    if getattr(args, "export_features", None):
        # the reconstruction pipeline's hand-off artifact (ref
        # ATMS_reconstruction.py saves emb_eeg/emb_eeg_test .pt pairs);
        # in a sweep each subject gets its own file under the given dir
        dest = args.export_features
        if sweep_subject is not None:
            os.makedirs(dest, exist_ok=True)
            dest = os.path.join(dest, f"{sweep_subject}.npz")
        print(f"exported {trainer.export_features(dest)}")
    print(json.dumps(trainer.history[-1]))
    return trainer.history[-1]


def cmd_evaluate(args):
    """Score a TRAINED retrieval checkpoint on the k-way table without
    retraining: restore the orbax TrainState from a run directory, extract
    test-set features, run the seeded evaluator. The reference can only
    produce these numbers inside its training loop
    (``ATMS_retrieval.py:262-362``); here any saved run re-scores in
    seconds (e.g. with new ``--eval-ks`` or another subject's test split)."""
    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.checkpoint import Checkpointer
    from eeg_image_decode_tpu.core.config import ATMSConfig, ContrastiveTrainConfig
    from eeg_image_decode_tpu.data.features import load_features
    from eeg_image_decode_tpu.data.things_eeg import build_retrieval_data
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train.contrastive import (
        create_train_state,
        make_eval_features_fn,
    )
    from eeg_image_decode_tpu.train.evaluator import retrieval_eval

    subjects = _resolve_subjects(args)
    data_path = _resolve_data_path(args)
    if not args.features:
        raise SystemExit("need --features (CLIP cache with a test split)")
    feats = load_features(args.features)
    test_img, test_txt = _resolve_test_features(args, feats)
    test = build_retrieval_data(
        data_path, subjects, train=False,
        img_features=test_img, text_features=test_txt,
        exclude_subject=args.test_subject,
        average_test_reps=not args.no_average,
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.encoder == "atms":
        model = build_encoder(
            "atms",
            config=ATMSConfig(
                joint_train=args.joint,
                # reference checkpoints use exact-erf FFN gelu
                # (Transformer_EncDec.py:33-41) — score them exactly
                exact_gelu=getattr(args, "exact_gelu", False),
            ),
            dtype=dtype,
        )
    else:
        model = build_encoder(args.encoder, dtype=dtype)
    ks = (
        tuple(int(k) for k in args.eval_ks.split(","))
        if args.eval_ks else (2, 4, 10, 50, 100, 200)
    )
    cfg = ContrastiveTrainConfig(encoder=args.encoder, seed=args.seed,
                                 eval_ks=ks)
    state, _ = create_train_state(
        model, cfg, jnp.asarray(test.eeg[:2]),
        jnp.asarray(test.subject_ids[:2]),
    )
    ckpt = Checkpointer(os.path.join(args.run_dir, "ckpt"))
    step = ckpt.latest_step() if args.step is None else args.step
    if step is None:
        raise SystemExit(f"no checkpoints under {args.run_dir}/ckpt")
    try:
        state = ckpt.restore(step, state)
    except FileNotFoundError as e:
        raise SystemExit(str(e)) from None
    except Exception as e:  # orbax raises structure mismatches deep inside
        raise SystemExit(
            f"could not restore the checkpoint under {args.run_dir} — if it "
            f"exists and is intact, it does not match encoder "
            f"'{args.encoder}' (joint={args.joint}): {e}"
        ) from e
    eval_fn = make_eval_features_fn(model)
    feats_arr, scale = eval_fn(
        state.params, state.batch_stats,
        jnp.asarray(test.eeg), jnp.asarray(test.subject_ids),
    )
    out = retrieval_eval(
        feats_arr, jnp.asarray(test.class_img_features()),
        jnp.asarray(test.labels), scale, ks=ks,
        key=jax.random.key(args.seed),
    )
    row = {"step": int(step), "n_test": int(test.n),
           **{k: float(v) for k, v in out.items()}}
    if args.csv:
        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row.keys()))
            w.writeheader()
            w.writerow(row)
    print(json.dumps(row))


def cmd_train_prior(args):
    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.train.prior import PriorPipe

    d = np.load(args.eeg_features)
    c_emb, h_emb = d["eeg_features"], d["img_features"]
    cfg = PriorConfig(
        epochs=args.epochs or 150,
        batch_size=args.batch_size or 1024,
        lr=args.lr or 1e-3,
        seed=args.seed,
    )
    from eeg_image_decode_tpu.core.mesh import create_mesh

    mesh = create_mesh() if getattr(args, "mesh", False) else None
    pipe = PriorPipe(cfg, mesh=mesh)
    from eeg_image_decode_tpu.core.checkpoint import Checkpointer

    out_dir = args.resume_dir or args.output_dir
    ckpt = Checkpointer(os.path.join(out_dir, "ckpt"))
    history = pipe.train(
        c_emb, h_emb, checkpointer=ckpt,
        resume=bool(args.resume_dir),
    )
    os.makedirs(out_dir, exist_ok=True)
    pipe.save_with_config(os.path.join(out_dir, "diffusion_prior.pkl"))
    print(json.dumps(history[-1]))


def _load_vae(args):
    """(VAE module, params) from ``--vae-params`` (pickled flax tree — a raw
    VAE tree or a Generator4Embeds dict with a "vae" key)."""
    import pickle

    import jax.numpy as jnp

    from eeg_image_decode_tpu.gen.vae import VAE, VAEConfig

    cfg = VAEConfig.tiny() if getattr(args, "tiny", False) else VAEConfig.sdxl()
    vae = VAE(cfg, dtype=jnp.float32 if args.tiny else jnp.bfloat16)
    with open(args.vae_params, "rb") as f:
        params = pickle.load(f)
    if isinstance(params, dict) and "vae" in params:
        params = params["vae"]
    return vae, params


def _list_image_files(root: str) -> list[str]:
    """Sorted recursive listing of image files (the THINGS ``images_set``
    layout is ``<root>/<class_dir>/<img>.jpg``; flat dirs work too)."""
    exts = (".png", ".jpg", ".jpeg")
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        out.extend(
            os.path.join(dirpath, f)
            for f in sorted(filenames)
            if f.lower().endswith(exts)
        )
    if not out:
        raise SystemExit(f"no images found under {root}")
    return out


def cmd_latents(args):
    """Build the content-keyed SDXL-VAE latent cache from an image dir — the
    production step for the reference's external
    ``train/test_image_latent_512.pt`` caches
    (``Generation/eegdatasets_leaveone_latent_vae_no_average.py:62-70``),
    now in-framework (flax VAE encode on TPU)."""
    from eeg_image_decode_tpu.data.features import (
        FlaxVAELatentEncoder,
        cache_path,
        load_or_compute_vae_latents,
    )

    vae, params = _load_vae(args)
    size = args.image_size or (16 if args.tiny else 512)
    enc = FlaxVAELatentEncoder(vae, params, image_size=size)
    paths = _list_image_files(args.images_dir)
    latents = load_or_compute_vae_latents(
        args.cache_dir, args.split, paths, flax_vae=enc,
        batch_size=args.batch_size or 8,
    )
    out = cache_path(args.cache_dir, f"sdxl-vae-{size}", args.split, paths)
    print(json.dumps(
        {"n_images": len(paths), "latent_shape": list(latents.shape),
         "cache": out}
    ))


def cmd_features(args):
    """Build the CLIP feature cache — the ``--features``/``--test-features``
    input of train-retrieval — from a THINGS-layout image dir, natively on
    TPU through the flax ViT-H towers (converted OpenCLIP weights,
    ``utils/convert_clip.py``). The reference computes this inside its
    dataset class on first run via torch/open_clip
    (``Retrieval/eegdatasets_leaveone.py:60-74``)."""
    import pickle

    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.data.features import (
        FlaxCLIPFeatureEncoder,
        clip_cache_path,
        load_or_compute_clip_features,
    )
    from eeg_image_decode_tpu.data.things_eeg import things_images_and_prompts
    from eeg_image_decode_tpu.data.tokenizers import CLIPBPETokenizer
    from eeg_image_decode_tpu.models.clip_vit import (
        CLIPTextConfig,
        CLIPTextTower,
        CLIPVisionConfig,
        CLIPVisionTower,
    )

    tok = CLIPBPETokenizer.from_files(
        args.vocab, args.merges,
        context_length=16 if args.tiny else 77,
    )
    if args.tiny:
        vcfg = CLIPVisionConfig.tiny()
        tcfg = CLIPTextConfig(
            vocab_size=len(tok.encoder), context_length=16, width=32,
            layers=2, heads=2, embed_dim=vcfg.embed_dim,
        )
        dtype = jnp.float32
    else:
        vcfg = CLIPVisionConfig.vit_h_14()
        tcfg = CLIPTextConfig.vit_h_14()
        dtype = jnp.bfloat16
    vt = CLIPVisionTower(vcfg, dtype=dtype)
    tt = CLIPTextTower(tcfg, dtype=dtype)
    with open(args.clip_params, "rb") as f:
        params = pickle.load(f)
    if not (isinstance(params, dict)
            and {"vision", "text"} <= set(params.keys())):
        raise SystemExit(
            "--clip-params must be a pickle of {'vision': ..., 'text': ...} "
            "flax param trees (see utils.convert_clip.convert_openclip_"
            "vision/convert_openclip_text)"
        )
    enc = FlaxCLIPFeatureEncoder(vt, params["vision"], tt, params["text"],
                                 tok)
    try:
        paths, prompts = things_images_and_prompts(args.images_dir)
    except ValueError as e:
        raise SystemExit(str(e)) from None
    normalize = not args.raw
    # tiny runs get their own cache identity — a tiny smoke test and the
    # real ViT-H encode on the same images/split must never share a file
    model_name = "tiny-clip" if args.tiny else "ViT-H-14"
    out = load_or_compute_clip_features(
        args.cache_dir, args.split, paths, prompts,
        model_name=model_name,
        normalize_img=normalize, batch_size=args.batch_size or 20,
        flax_encoder=enc,
    )
    cache = clip_cache_path(args.cache_dir, args.split, paths,
                            model_name=model_name, normalize_img=normalize)
    print(json.dumps({
        "n_images": len(paths), "n_classes": len(prompts),
        "img_shape": list(out["img_features"].shape),
        "text_shape": list(out["text_features"].shape),
        "cache": cache,
    }))


def cmd_train_lowlevel(args):
    from eeg_image_decode_tpu.core.config import LowLevelConfig
    from eeg_image_decode_tpu.data.things_eeg import load_things_eeg_subject
    from eeg_image_decode_tpu.train.lowlevel import LowLevelTrainer

    data_path = _resolve_data_path(args)
    eeg, _ = load_things_eeg_subject(
        data_path, args.subjects, train=True
    )
    latents = np.load(args.latents)["latents"]
    cfg = LowLevelConfig(
        epochs=args.epochs or 200, batch_size=args.batch_size or 30,
        lr=args.lr or 1e-3,
    )
    from eeg_image_decode_tpu.core.mesh import create_mesh

    mesh = create_mesh() if getattr(args, "mesh", False) else None
    trainer = LowLevelTrainer(cfg, mesh=mesh)
    if args.preview_dir:
        if not args.vae_params:
            raise SystemExit("--preview-dir needs --vae-params (frozen VAE)")
        vae, vparams = _load_vae(args)
        trainer.set_preview_decoder(
            vae, vparams, preview_dir=args.preview_dir,
            preview_every=args.preview_every,
        )
    from eeg_image_decode_tpu.core.checkpoint import Checkpointer

    out_dir = args.resume_dir or args.output_dir
    ckpt = Checkpointer(os.path.join(out_dir, "ckpt"))
    history = trainer.train(
        eeg, latents, seed=args.seed, checkpointer=ckpt,
        resume=bool(args.resume_dir),
    )
    print(json.dumps(history[-1]))


def cmd_preprocess(args):
    import pickle

    from eeg_image_decode_tpu.preprocess.epoching import (
        epoch_session,
        merge_sessions_test,
        merge_sessions_train,
        save_preprocessed,
    )
    from eeg_image_decode_tpu.preprocess.mvnn import mvnn_whiten

    out_dir = os.path.join(args.project_dir, f"Preprocessed_data_{args.sfreq}Hz",
                           f"sub-{args.sub:02d}")
    parts = {}
    for part, max_rep in (("test", 20), ("training", 2)):
        epochs_list, conds_list, times = [], [], None
        for ses in range(1, args.n_ses + 1):
            raw_path = os.path.join(
                args.project_dir, "Raw_data", f"sub-{args.sub:02d}",
                f"ses-{ses:02d}", f"raw_eeg_{part}.npy",
            )
            raw = np.load(raw_path, allow_pickle=True)
            if isinstance(raw, np.ndarray):
                raw = raw.item()
            ch_names = list(raw["ch_names"])
            stim_idx = ch_names.index("stim")
            eeg_rows = [i for i in range(len(ch_names)) if i != stim_idx]
            epochs, conds, times = epoch_session(
                raw["raw_eeg_data"][eeg_rows],
                [ch_names[i] for i in eeg_rows],
                float(raw["sfreq"]),
                raw["raw_eeg_data"][stim_idx],
                target_sfreq=args.sfreq,
                max_rep=max_rep,
                seed=args.seed,
            )
            epochs_list.append(epochs)
            conds_list.append(conds)
        parts[part] = (epochs_list, conds_list, times)

    wtrain, wtest = mvnn_whiten(parts["training"][0], parts["test"][0])
    merged_test = merge_sessions_test(wtest, seed=args.seed)
    merged_train = merge_sessions_train(
        wtrain, parts["training"][1], seed=args.seed
    )
    times = parts["training"][2]
    from eeg_image_decode_tpu.preprocess.epoching import CHANNEL_ORDER

    save_preprocessed(os.path.join(out_dir, "preprocessed_eeg_test.npy"),
                      merged_test, CHANNEL_ORDER, times)
    save_preprocessed(os.path.join(out_dir, "preprocessed_eeg_training.npy"),
                      merged_train, CHANNEL_ORDER, times)
    print(f"wrote {out_dir}")


def _load_concept_index(path: str) -> np.ndarray:
    """THINGS ``image_concept_index.csv``: one 1-based concept index per
    image row (the notebook reads it ``pd.read_csv(header=None).iloc[:, 0]``
    — ``MEG-preprocessing/pre_possess.ipynb`` cells 24-27). Tolerates
    comma- or whitespace-delimited rows, extra columns, and one header
    line; anything else fails loudly instead of degenerating the split
    (``np.genfromtxt`` on a comma CSV silently returns all −1, which
    would make every train concept 'overlap' and drop the whole split)."""
    vals: list[int] = []
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            first = line.replace(",", " ").split()[0]
            try:
                vals.append(int(first))
            except ValueError:
                # Line 1 may be a header — but ONLY treat it as one when it
                # actually looks like a column name (an identifier-like
                # token). A corrupt first DATA row ('NaN', '1.5', '12a')
                # must fail loudly: silently skipping it would shift every
                # image→concept mapping by one row and corrupt the zs/train
                # split this parser exists to protect.
                looks_like_header = (
                    lineno == 1
                    and first.replace("_", "").replace("-", "").isalpha()
                    and first.lower() not in ("nan", "inf", "infinity")
                )
                if looks_like_header:
                    continue
                raise SystemExit(
                    f"{path}:{lineno}: non-integer concept index {first!r}"
                ) from None
    col = np.asarray(vals, dtype=np.int64)
    if col.size == 0:
        raise SystemExit(f"{path}: no concept indices found")
    if col.min() < 1:
        raise SystemExit(
            f"{path}: concept indices must be 1-based positive "
            f"(got min {col.min()})"
        )
    return col


def cmd_preprocess_meg(args):
    """THINGS-MEG: exported epochs npz → reference-layout train/test pickles
    — the notebook pipeline ``MEG-preprocessing/pre_possess.ipynb`` cells
    6-36 (crop [0,1]s → drop catch 999999 → 12-repetition zero-shot concept
    split → (n,12,1,C,T)/(n,1,12,C,T) layout → pickle). The fif→npz step is
    ``scripts/export_meg.py`` (host-side, optional MNE)."""
    from eeg_image_decode_tpu.preprocess.meg import (
        crop_time_window,
        save_meg,
        split_meg_concepts,
        split_meg_images,
        to_reference_layout,
    )

    d = np.load(args.epochs, allow_pickle=True)
    epochs, times = crop_time_window(
        d["epochs"], d["times"], tmin=args.tmin, tmax=args.tmax
    )
    if args.image_concept_csv:
        # image-level event ids + THINGS image→concept map (the notebook's
        # real flow: zs images by repetition count, concept-overlap filter,
        # 12-images-per-concept train grouping)
        col = _load_concept_index(args.image_concept_csv)
        train, test, train_ids, test_ids = split_meg_images(
            epochs, d["event_ids"], col, test_reps=args.test_reps,
            imgs_per_concept=args.train_reps,
        )
    else:
        # concept-level event ids (already-grouped exports)
        train, test, train_ids, test_ids = split_meg_concepts(
            epochs, d["event_ids"], test_reps=args.test_reps,
            train_reps=args.train_reps,
        )
    train, test = to_reference_layout(train, test)
    save_meg(args.out, train, test, list(d["ch_names"]), times)
    print(json.dumps({
        "train_shape": list(train.shape),
        "test_shape": list(test.shape),
        "n_train_concepts": int(len(train_ids)),
        "n_test_concepts": int(len(test_ids)),
        "out": args.out,
    }))


def cmd_serve(args):
    """Serve trained artifacts over HTTP (stdlib daemon, one chip):
    /v1/retrieve from an orbax run dir + gallery features, plus
    /v1/reconstruct when prior (+ generator) params are given. See
    ``eeg_image_decode_tpu/server.py`` for the wire format."""
    import pickle

    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.checkpoint import Checkpointer
    from eeg_image_decode_tpu.core.config import (
        ATMSConfig,
        ContrastiveTrainConfig,
        PriorConfig,
    )
    from eeg_image_decode_tpu.data.features import load_features
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.serve import ReconstructionService, RetrievalService
    from eeg_image_decode_tpu.server import EEGDecodeServer
    from eeg_image_decode_tpu.train.contrastive import create_train_state

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.encoder == "atms":
        model = build_encoder(
            "atms",
            config=ATMSConfig(
                joint_train=args.joint,
                # serve converted reference checkpoints activation-exactly
                # (erf FFN gelu, Transformer_EncDec.py:33-41)
                exact_gelu=getattr(args, "exact_gelu", False),
            ),
            dtype=dtype,
        )
    else:
        model = build_encoder(args.encoder, dtype=dtype)
    # template state at the advertised input shape, then restore the run
    sample = jnp.zeros((2, args.channels, args.timepoints))
    state, _ = create_train_state(
        model, ContrastiveTrainConfig(encoder=args.encoder), sample,
        jnp.zeros((2,), jnp.int32),
    )
    ckpt = Checkpointer(os.path.join(args.run_dir, "ckpt"))
    try:
        state = ckpt.restore(None, state)
    except FileNotFoundError as e:
        raise SystemExit(str(e)) from None
    except Exception as e:  # orbax raises structure mismatches deep inside
        raise SystemExit(
            f"could not restore the checkpoint under {args.run_dir} — if it "
            f"exists and is intact, it does not match encoder "
            f"'{args.encoder}' (joint={args.joint}): {e}"
        ) from e
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    feats = load_features(args.features)
    gallery = feats.get("img_features_test", feats["img_features"])
    retrieval = RetrievalService(
        model, variables, gallery, max_batch=args.max_batch,
        transfer_dtype=args.transfer_dtype,
    )
    # compile all bucket shapes before accepting traffic: a cold bucket on
    # the live path costs a full XLA compile (measured 14.5 s p99 outlier)
    retrieval.warmup((args.channels, args.timepoints))

    reconstruction = None
    if args.prior_params:
        from eeg_image_decode_tpu.gen.sdxl import (
            Generator4Embeds,
            GeneratorConfig,
        )
        from eeg_image_decode_tpu.train.prior import PriorPipe

        pipe = PriorPipe.from_checkpoint(
            args.prior_params,
            default_cfg=PriorConfig.tiny() if args.tiny else PriorConfig(),
        )
        gen = Generator4Embeds(
            GeneratorConfig.tiny() if args.tiny else GeneratorConfig()
        )
        if args.generator_params:
            with open(args.generator_params, "rb") as f:
                gen.load_params(pickle.load(f))
        else:
            gen.init(jax.random.key(0))  # random weights: smoke only
        reconstruction = ReconstructionService(
            model, variables, pipe, gen, max_batch=args.gen_batch
        )
        # the first full-size fused SDXL compile takes minutes on a cold
        # cache — pay it before accepting traffic, not on a live request
        reconstruction.warmup((args.channels, args.timepoints))

    caption = None
    if args.git_params:
        if not args.prior_params:
            raise SystemExit("--git-params needs --prior-params (captions "
                             "sample CLIP embeddings from the prior)")
        if not (args.projector_params and args.vocab):
            raise SystemExit("--git-params needs --projector-params and "
                             "--vocab to serve /v1/caption")
        from eeg_image_decode_tpu.data.tokenizers import WordPieceTokenizer
        from eeg_image_decode_tpu.models.git_caption import (
            GITCaptioner,
            GITConfig,
            PixelProjector,  # noqa: F401  (CaptionService builds its own)
            git_config_from_params,
        )
        from eeg_image_decode_tpu.serve import CaptionService

        with open(args.git_params, "rb") as f:
            git_params = pickle.load(f)
        with open(args.projector_params, "rb") as f:
            proj_params = pickle.load(f)
        base = GITConfig.tiny() if args.tiny else GITConfig.git_large_coco()
        # derive the decoder shape from the weights (a base-shaped
        # checkpoint must not run under a large-shaped model)
        gcfg2 = git_config_from_params(
            git_params, max_text_len=base.max_text_len,
            num_visual_tokens=base.num_visual_tokens,
            bos_token_id=base.bos_token_id, eos_token_id=base.eos_token_id,
            pad_token_id=base.pad_token_id,
        )
        caption = CaptionService(
            model, variables, pipe, GITCaptioner(gcfg2), git_params,
            proj_params, WordPieceTokenizer.from_file(args.vocab),
            max_batch=args.gen_batch, max_new_tokens=args.max_new_tokens,
        )
        caption.warmup((args.channels, args.timepoints))

    server = EEGDecodeServer(
        retrieval=retrieval, reconstruction=reconstruction, caption=caption
    )
    print(f"serving on {args.host}:{args.port} "
          f"(reconstruct={'yes' if reconstruction else 'no'}, "
          f"caption={'yes' if caption else 'no'})")
    server.serve_forever(args.host, args.port)


def cmd_generate(args):
    """200-class × n-seed image generation from prior-sampled embeddings
    (the reference's ``Generation_metrics_sub8.ipynb`` cell 9 driver)."""
    import pickle

    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.gen.sdxl import Generator4Embeds, GeneratorConfig
    from eeg_image_decode_tpu.train.prior import PriorPipe

    d = np.load(args.eeg_features)
    feats_test = d["eeg_features_test"]

    # config-carrying checkpoints reconstruct their own PriorConfig; legacy
    # raw trees fall back to the --tiny guess
    pipe = PriorPipe.from_checkpoint(
        args.prior_params,
        default_cfg=PriorConfig.tiny() if args.tiny else PriorConfig(),
    )

    gcfg = GeneratorConfig.tiny() if args.tiny else GeneratorConfig()
    if args.resolution:
        # the reference's final recombination stage renders at 1024²
        # (1x1024_reconstruct_sdxl.ipynb cells 20-27); SDXL latents are
        # pixel/8, so 1024 → 128×128 latents
        from dataclasses import replace as _replace_g

        factor = gcfg.pixel_factor
        if args.resolution % factor:
            raise SystemExit(
                f"--resolution must be a multiple of the VAE factor "
                f"{factor}; got {args.resolution}"
            )
        side = args.resolution // factor
        gcfg = _replace_g(gcfg, latent_size=(side, side))
    if (args.tiny and not args.generator_params
            and gcfg.unet.ip_image_embed_dim != pipe.cfg.embed_dim):
        # random-init tiny smoke mode must accept whatever embedding width
        # the prior emits (e.g. a full-size 1024-d prior driven through a
        # tiny generator in the acceptance dry-run); when params ARE
        # supplied their saved structure defines the config — don't rewrite
        from dataclasses import replace as _replace

        gcfg = _replace(
            gcfg,
            unet=_replace(
                gcfg.unet, ip_image_embed_dim=int(pipe.cfg.embed_dim)
            ),
        )
    gen = Generator4Embeds(gcfg)
    if args.generator_params:
        with open(args.generator_params, "rb") as f:
            gen.load_params(pickle.load(f))
    else:
        gen.init(jax.random.key(0))  # random weights: pipeline smoke only

    encode_prompts = None
    if args.text_encoder_params and args.tokenizer_dir:
        # encode '' once and install it as the default conditioning
        # (ref custom_pipeline.py:239 — NOT zeros)
        from eeg_image_decode_tpu.data.tokenizers import CLIPBPETokenizer
        from eeg_image_decode_tpu.gen.text_encoder import (
            SDXLTextEncoder,
            SDXLTextEncoderConfig,
            tiny_text_encoder_config,
        )

        if args.tiny:
            te_cfg = tiny_text_encoder_config(gcfg.unet, args.tokenizer_dir)
        else:
            te_cfg = SDXLTextEncoderConfig()
        ctx_len = te_cfg.clip_l.context_length
        tok1 = CLIPBPETokenizer.from_files(
            os.path.join(args.tokenizer_dir, "vocab.json"),
            os.path.join(args.tokenizer_dir, "merges.txt"),
            context_length=ctx_len,
        )
        tok2 = CLIPBPETokenizer.from_files(
            os.path.join(args.tokenizer_dir, "vocab.json"),
            os.path.join(args.tokenizer_dir, "merges.txt"),
            pad_token="!", context_length=ctx_len,
        )
        enc = SDXLTextEncoder(te_cfg)
        with open(args.text_encoder_params, "rb") as f:
            te_params = pickle.load(f)
        ctx, pooled = enc.encode(te_params, [""], tok1, tok2)
        gen.set_default_text_conditioning(ctx, pooled)
        encode_prompts = lambda ps: enc.encode(te_params, ps, tok1, tok2)

    # semantic-level recombination (ref 1x1024_reconstruct_sdxl.ipynb cells
    # 20-27): per-class GIT caption text prompts + low-level init latents
    captions = None
    if args.captions_file:
        if encode_prompts is None:
            raise SystemExit(
                "--captions-file needs --text-encoder-params and "
                "--tokenizer-dir to encode the prompts"
            )
        with open(args.captions_file) as f:
            captions = [line.rstrip("\n") for line in f]
    init_latents = None
    if args.init_latents:
        d2 = np.load(args.init_latents)
        init_latents = np.asarray(
            d2[d2.files[0]] if hasattr(d2, "files") else d2, np.float32
        )
        if init_latents.shape[0] != feats_test.shape[0]:
            raise SystemExit(
                f"--init-latents rows ({init_latents.shape[0]}) must align "
                f"with the EEG test features ({feats_test.shape[0]})"
            )
        want_hw = tuple(gcfg.latent_size)
        got_hw = (tuple(init_latents.shape[2:4])
                  if init_latents.shape[1] == gcfg.vae.latent_channels
                  else tuple(init_latents.shape[1:3]))
        if got_hw != want_hw:
            raise SystemExit(
                f"--init-latents spatial size {got_hw} does not match the "
                f"generation latent size {want_hw} "
                f"(resolution {want_hw[0] * gcfg.pixel_factor}px); re-export "
                "the low-level latents at this resolution or drop "
                "--resolution"
            )

    from PIL import Image

    n = feats_test.shape[0]
    if captions is not None and len(captions) != n:
        raise SystemExit(
            f"--captions-file has {len(captions)} lines, need one per test "
            f"class ({n})"
        )
    # reference-layout output tree: <output>/<sub>/<class-name>/<j>.png
    # (``Generation_metrics_sub8.ipynb`` cell 9) when --class-names/--sub are
    # given; class_%04d/<j>.png otherwise
    class_names = None
    if args.class_names:
        with open(args.class_names) as f:
            class_names = [line.rstrip("\n") for line in f if line.strip()]
        if len(class_names) != n:
            raise SystemExit(
                f"--class-names has {len(class_names)} lines, need one per "
                f"test class ({n})"
            )
    out_root = (
        os.path.join(args.output_dir, args.sub) if args.sub
        else args.output_dir
    )
    os.makedirs(out_root, exist_ok=True)
    bs = args.gen_batch

    def pad_rows(a):
        return np.concatenate(
            [a, np.repeat(a[-1:], bs - a.shape[0], axis=0)], axis=0
        ) if a.shape[0] < bs else a

    for start in range(0, n, bs):
        chunk = feats_test[start : start + bs]
        real = chunk.shape[0]
        # pad the last batch: one jit trace per batch size only
        chunk = pad_rows(chunk)
        emb = pipe.generate(jnp.asarray(chunk), key=jax.random.key(start))
        gen_kwargs = {}
        if captions is not None:
            prompts = captions[start : start + real]
            prompts += [prompts[-1]] * (bs - real)
            ctx_b, pooled_b = encode_prompts(prompts)
            gen_kwargs.update(text_context=ctx_b, pooled_text_embed=pooled_b)
        if init_latents is not None:
            gen_kwargs.update(
                init_latents=jnp.asarray(pad_rows(
                    init_latents[start : start + real]
                )),
                img2img_strength=args.img2img_strength,
            )
        for seed in range(args.seeds):
            imgs = gen.generate(emb, key=jax.random.key(1000 + seed),
                                **gen_kwargs)
            arr = np.asarray(jnp.round(imgs * 255)).astype(np.uint8)[:real]
            for j in range(arr.shape[0]):
                cls = start + j
                name = (class_names[cls] if class_names
                        else f"class_{cls:04d}")
                cls_dir = os.path.join(out_root, name)
                os.makedirs(cls_dir, exist_ok=True)
                Image.fromarray(arr[j]).save(
                    os.path.join(cls_dir, f"{seed}.png")
                )
    print(f"wrote {n} classes × {args.seeds} seeds to {out_root}")


def cmd_caption(args):
    """Batch semantic-level captioning — the reference's
    ``GIT_caption_batch.ipynb`` cell 8 loop: EEG features → prior sampling →
    PixelProjector → GIT greedy decode → ``semantic_level_caption.txt``."""
    import pickle

    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.models.git_caption import (
        GITCaptioner,
        GITConfig,
        PixelProjector,
    )

    if args.embeddings:
        d = np.load(args.embeddings)
        if hasattr(d, "files"):  # .npz: prefer a named key, else first array
            key0 = "clip_embeds" if "clip_embeds" in d.files else d.files[0]
            embeds = d[key0]
        else:
            embeds = d
    else:
        if not (args.eeg_features and args.prior_params):
            raise SystemExit(
                "need --embeddings, or --eeg-features + --prior-params to "
                "sample CLIP embeddings from the prior"
            )
        from eeg_image_decode_tpu.core.config import PriorConfig
        from eeg_image_decode_tpu.train.prior import PriorPipe

        d = np.load(args.eeg_features)
        feats_test = d["eeg_features_test"]
        pipe = PriorPipe.from_checkpoint(
            args.prior_params,
            default_cfg=PriorConfig.tiny() if args.tiny else PriorConfig(),
        )
        embeds = np.asarray(pipe.generate(
            jnp.asarray(feats_test), key=jax.random.key(args.seed)
        ))

    cfg = GITConfig.tiny() if args.tiny else GITConfig.git_large_coco()
    if args.git_params:
        if not args.projector_params:
            raise SystemExit(
                "--git-params needs --projector-params (the trained "
                "PixelProjector adapter; see train/adapters.py)"
            )
        with open(args.git_params, "rb") as f:
            git_params = pickle.load(f)
        with open(args.projector_params, "rb") as f:
            proj_params = pickle.load(f)
        # derive the decoder shape from the weights themselves — a base-
        # shaped checkpoint must not be applied under a large-shaped model
        from eeg_image_decode_tpu.models.git_caption import (
            git_config_from_params,
        )

        cfg = git_config_from_params(
            git_params, max_text_len=cfg.max_text_len,
            num_visual_tokens=cfg.num_visual_tokens,
            bos_token_id=cfg.bos_token_id, eos_token_id=cfg.eos_token_id,
            pad_token_id=cfg.pad_token_id,
        )
    model = GITCaptioner(cfg)
    proj = PixelProjector(num_tokens=cfg.num_visual_tokens,
                          out_dim=cfg.visual_dim)
    if not args.git_params:  # random weights: smoke runs only
        dummy_e = jnp.zeros((1, embeds.shape[-1]), jnp.float32)
        dummy_v = jnp.zeros((1, cfg.num_visual_tokens, cfg.visual_dim))
        dummy_t = jnp.zeros((1, 2), jnp.int32)
        git_params = model.init(jax.random.key(0), dummy_v, dummy_t)["params"]
        proj_params = proj.init(jax.random.key(1), dummy_e)["params"]

    tokenizer = None
    if args.vocab:
        from eeg_image_decode_tpu.data.tokenizers import WordPieceTokenizer

        tokenizer = WordPieceTokenizer.from_file(args.vocab)

    n = embeds.shape[0]
    bs = min(args.caption_batch, n)
    lines: list[str] = []
    for start in range(0, n, bs):
        chunk = np.asarray(embeds[start : start + bs], np.float32)
        real = chunk.shape[0]
        if real < bs:  # pad: one jit trace per batch size only
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], bs - real, axis=0)], axis=0
            )
        grids = proj.apply({"params": proj_params}, jnp.asarray(chunk))
        tokens = np.asarray(model.generate(
            {"params": git_params}, grids,
            max_new_tokens=args.max_new_tokens,
        ))[:real]
        if tokenizer is not None:
            lines.extend(tokenizer.decode(row) for row in tokens)
        else:  # no vocab: raw token ids (smoke / debugging)
            lines.extend(" ".join(str(t) for t in row) for row in tokens)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {n} captions to {args.out}")


def _load_embedding_array(path: str) -> np.ndarray:
    """(N, D) embeddings from ``.npy``/``.npz`` (named key preferred)."""
    d = np.load(path)
    if hasattr(d, "files"):
        for k in ("img_features", "clip_embeds"):
            if k in d.files:
                return np.asarray(d[k], np.float32)
        return np.asarray(d[d.files[0]], np.float32)
    return np.asarray(d, np.float32)


def _load_grid_array(path: str) -> np.ndarray:
    """(N, T, D) GIT visual-token grids from ``.npy``/``.npz`` (named key
    preferred) — one resolver so train and test grids can't drift."""
    d = np.load(path)
    if hasattr(d, "files"):
        key = "grids" if "grids" in d.files else d.files[0]
        return np.asarray(d[key], np.float32)
    return np.asarray(d, np.float32)


def _compute_git_grids(args, images_dir: str, *, split: str) -> np.ndarray:
    """Images → GIT ViT-L visual-token grids through the native flax tower,
    content-key cached (the reference's ``ViT-L-14_features_GIT_*.pt``)."""
    import pickle

    import jax.numpy as jnp

    from eeg_image_decode_tpu.data.features import (
        FlaxCLIPFeatureEncoder,
        load_or_compute_git_grids,
    )
    from eeg_image_decode_tpu.models.clip_vit import (
        CLIPVisionConfig,
        CLIPVisionTower,
    )

    cfg = (CLIPVisionConfig.tiny() if args.tiny
           else CLIPVisionConfig.git_vit_l_14())
    tower = CLIPVisionTower(
        cfg, dtype=jnp.float32 if args.tiny else jnp.bfloat16
    )
    with open(args.git_vision_params, "rb") as f:
        vparams = pickle.load(f)
    enc = FlaxCLIPFeatureEncoder(tower, vparams)
    paths = _list_image_files(images_dir)
    return load_or_compute_git_grids(
        args.cache_dir, split, paths, flax_encoder=enc,
        batch_size=args.grid_batch,
    )


def cmd_train_adapter(args):
    """Train the PixelProjector captioning adapter — the reference's
    ``Generation/image_adapter.ipynb``: ViT-H CLIP image embeddings → GIT's
    frozen ViT-L visual-token grids, MSE, AdamW lr 1e-3, batch 32, 30 epochs
    bf16 (cell 3), saved as the ``PixelProjector_best.bin`` analogue (cell 4).
    Grid targets come from ``--grids`` (precomputed cache) or are encoded
    natively from ``--images-dir`` through the flax GIT vision tower."""
    import pickle

    from eeg_image_decode_tpu.train.adapters import (
        AdapterTrainConfig,
        evaluate_pixel_projector,
        train_pixel_projector,
    )

    embeds = _load_embedding_array(args.embeddings)
    if args.grids:
        grids = _load_grid_array(args.grids)
    elif args.images_dir and args.git_vision_params:
        grids = _compute_git_grids(args, args.images_dir, split="train")
    else:
        raise SystemExit(
            "need --grids g.npz, or --images-dir + --git-vision-params to "
            "encode the GIT visual-token grids natively (see "
            "data.features.load_or_compute_git_grids)"
        )
    if grids.shape[0] != embeds.shape[0]:
        raise SystemExit(
            f"embeddings ({embeds.shape[0]}) and grids ({grids.shape[0]}) "
            "counts differ — they must describe the same image list"
        )

    cfg = AdapterTrainConfig(
        epochs=args.epochs or 30, batch_size=args.batch_size or 32,
        lr=args.lr or 1e-3, seed=args.seed,
    )
    params, losses = train_pixel_projector(embeds, grids, cfg)
    out = args.out or os.path.join(args.output_dir, "pixel_projector.pkl")
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(params, f)

    result = {"out": out, "epochs": cfg.epochs,
              "final_train_loss": losses[-1]}
    if args.test_embeddings:
        test_e = _load_embedding_array(args.test_embeddings)
        if args.test_grids:
            test_g = _load_grid_array(args.test_grids)
        elif args.test_images_dir and args.git_vision_params:
            test_g = _compute_git_grids(
                args, args.test_images_dir, split="test"
            )
        else:
            raise SystemExit(
                "--test-embeddings needs --test-grids or --test-images-dir"
            )
        result["test_mse"] = evaluate_pixel_projector(params, test_e, test_g)
    print(json.dumps(result))


def _load_image_batch(path: str, *, seed: int, size: int,
                      class_names: list[str] | None = None) -> np.ndarray:
    """Images in [0,1] NHWC from a ``.npy``/``.npz`` array, a ``cmd_generate``
    output tree (``class_XXXX/<seed>.png`` — or ``<class-name>/<seed>.png``
    in test-class order when ``class_names`` is given, the reference's
    ``generated_imgs/sub-08/<class>/<j>.png`` layout), or a flat directory of
    images (sorted by filename — the reference's GT ordering)."""
    from PIL import Image

    def load_one(p: str) -> np.ndarray:
        img = Image.open(p).convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0

    if os.path.isfile(path):
        d = np.load(path)
        arr = d[d.files[0]] if hasattr(d, "files") else d
        arr = np.asarray(arr, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        if arr.shape[1] != size:
            import jax

            arr = np.asarray(jax.image.resize(
                arr, (arr.shape[0], size, size, 3), "bilinear"
            ))
        return arr
    if class_names is not None:
        # dirs in TEST-CLASS order (not alphabetical — THINGS class names
        # don't sort in index order)
        missing = [c for c in class_names
                   if not os.path.isdir(os.path.join(path, c))]
        if missing:
            raise SystemExit(
                f"{len(missing)} class dirs from --class-names missing under "
                f"{path} (first: {missing[0]!r})"
            )
        return np.stack([
            load_one(os.path.join(path, c, f"{seed}.png"))
            for c in class_names
        ])
    entries = sorted(os.listdir(path))
    class_dirs = [e for e in entries if
                  os.path.isdir(os.path.join(path, e))]
    if class_dirs:  # cmd_generate layout
        return np.stack([
            load_one(os.path.join(path, c, f"{seed}.png"))
            for c in class_dirs
        ])
    files = [e for e in entries
             if e.lower().endswith((".png", ".jpg", ".jpeg"))]
    if not files:
        raise SystemExit(f"no images found under {path}")
    return np.stack([load_one(os.path.join(path, f)) for f in files])


def cmd_metrics(args):
    """Reconstruction metric table (ref ``Reconstruction_Metrics_ATM.ipynb``
    cells 8-24): PixCorr + SSIM always; 2-way-identification and distance
    rows per backbone whose converted params are supplied."""
    import pickle

    import jax.numpy as jnp

    from eeg_image_decode_tpu.eval import (
        make_imagenet_extractor,
        reconstruction_metrics,
    )

    class_names = None
    if getattr(args, "class_names", None):
        with open(args.class_names) as f:
            class_names = [line.rstrip("\n") for line in f if line.strip()]
    gen = _load_image_batch(args.generated, seed=args.gen_seed,
                            size=args.image_size, class_names=class_names)
    gt = _load_image_batch(args.ground_truth, seed=0, size=args.image_size)
    if gen.shape[0] != gt.shape[0]:
        raise SystemExit(
            f"generated ({gen.shape[0]}) and ground-truth ({gt.shape[0]}) "
            "image counts differ — metrics need aligned pairs"
        )

    extractors = {}
    if args.backbone_params:
        with open(args.backbone_params, "rb") as f:
            bp = pickle.load(f)
        if "alexnet" in bp:  # one AlexNet param set serves both rows
            extractors["alexnet2"] = make_imagenet_extractor(
                "alexnet2", bp["alexnet"])
            extractors["alexnet5"] = make_imagenet_extractor(
                "alexnet5", bp["alexnet"])
        for kind in ("inception", "effnet", "swav"):
            if kind in bp:
                extractors[kind] = make_imagenet_extractor(kind, bp[kind])
    if args.clip_params:
        from eeg_image_decode_tpu.eval.recon_metrics import make_clip_extractor
        from eeg_image_decode_tpu.models.clip_vit import (
            CLIPVisionConfig,
            CLIPVisionTower,
        )

        tower = CLIPVisionTower(CLIPVisionConfig.vit_l_14())
        with open(args.clip_params, "rb") as f:
            extractors["clip"] = make_clip_extractor(tower, pickle.load(f))

    out = reconstruction_metrics(
        jnp.asarray(gen), jnp.asarray(gt), extractors or None
    )
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        with open(args.out, "w") as f:
            f.write("metric,value\n")
            for k, v in out.items():
                f.write(f"{k},{v}\n")
        print(f"wrote {args.out}")


def cmd_export_checkpoint(args):
    """Trained ATMS run directory → reference-format torch ``.pth`` — the
    reverse migration: a model trained HERE loads straight into the
    reference's ``ATMS_retrieval.py`` via ``load_state_dict`` (exact inverse
    of the import converter; behavioral equivalence tested in
    ``tests/test_convert.py``)."""
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.checkpoint import Checkpointer
    from eeg_image_decode_tpu.core.config import (
        ATMSConfig,
        ContrastiveTrainConfig,
    )
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train.contrastive import create_train_state
    from eeg_image_decode_tpu.utils.convert import export_atms_state_dict

    sample = jnp.zeros((2, args.channels, args.timepoints))
    ckpt = Checkpointer(os.path.join(args.run_dir, "ckpt"))
    # fail on a missing/empty checkpoint BEFORE the layout fallback loop —
    # otherwise the same FileNotFoundError surfaces twice as a bogus
    # "matches neither tsconv layout" diagnosis
    if ckpt.latest_step() is None:
        raise SystemExit(
            f"no checkpoints under {os.path.join(args.run_dir, 'ckpt')}"
        )
    if args.step is not None and args.step not in ckpt.all_steps():
        raise SystemExit(
            f"step {args.step} not found under "
            f"{os.path.join(args.run_dir, 'ckpt')} "
            f"(available: {sorted(ckpt.all_steps())})"
        )
    # the checkpoint's tsconv layout depends on the TRAINING host's backend
    # (fused_tsconv='auto' → fused kernel tree on TPU, plain conv tree on
    # CPU); the export host's backend says nothing about it, so try both
    # template layouts instead of trusting 'auto' here
    state, errors = None, []
    for fused in (False, True):
        model = build_encoder(
            "atms",
            config=ATMSConfig(joint_train=args.joint, fused_tsconv=fused),
        )
        template, _ = create_train_state(
            model, ContrastiveTrainConfig(), sample,
            jnp.zeros((2,), jnp.int32),
        )
        try:
            state = ckpt.restore(args.step, template)
            break
        except Exception as e:  # tree-structure mismatch → other layout
            errors.append(f"fused_tsconv={fused}: {e}")
    if state is None:
        raise SystemExit(
            f"could not restore {args.run_dir} under either tsconv layout:\n"
            + "\n".join(errors)
        )
    num_subjects = args.num_subjects
    if num_subjects is None:
        # reference ModuleList sizes: ATMS_retrieval.py:172 (2) vs
        # ATMS_retrieval_joint_train.py:173 (10)
        num_subjects = 10 if args.joint else 2
    sd = export_atms_state_dict(
        {"params": state.params, "batch_stats": state.batch_stats},
        num_subjects=num_subjects,
    )
    try:
        import torch

        torch.save({k: torch.tensor(v) for k, v in sd.items()}, args.out)
    except ImportError:
        # numpy pickle fallback: load with np.load(..., allow_pickle=True)
        # and wrap in torch tensors on the torch side
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(sd, f, protocol=4)
        print("torch not installed: wrote a numpy pickle instead "
              "(convert to .pth on a torch machine)")
    print(f"wrote {args.out} ({len(sd)} tensors)")


def cmd_smoke(args):
    """Synthetic end-to-end: retrieval training + prior + generation."""
    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.config import (
        ContrastiveTrainConfig,
        PriorConfig,
    )
    from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train import ContrastiveTrainer
    from eeg_image_decode_tpu.train.evaluator import retrieval_eval
    from eeg_image_decode_tpu.train.prior import PriorPipe

    train, test = make_synthetic_retrieval_data(
        n_classes=16, images_per_class=4, train_reps=2, clip_dim=64, snr=2.0
    )
    # the generation path trains the encoder with the reconstruction
    # objective (ref Generation/ATMS_reconstruction.py:227-228)
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=32, epochs=4, lr=1e-3, eval_ks=(2, 16),
        recon_loss=True,
    )
    trainer = ContrastiveTrainer(
        build_encoder("nice", proj_dim=64), cfg, train, test
    )
    trainer.fit()
    feats_test, _ = trainer.eval_fn(
        trainer.state.params, trainer.state.batch_stats,
        trainer.test_eeg, trainer.test_subject_ids,
    )
    feats_train, _ = trainer.eval_fn(
        trainer.state.params, trainer.state.batch_stats,
        jnp.asarray(train.eeg), jnp.asarray(train.subject_ids),
    )
    h = train.img_features[train.img_idx]
    h = h / np.abs(h).max()
    pipe = PriorPipe(PriorConfig(
        embed_dim=64, cond_dim=64, hidden_dims=(256, 128, 64),
        time_embed_dim=64, epochs=300, batch_size=64, lr=1e-3,
        warmup_steps=100, num_inference_steps=50, guidance_scale=5.0,
    ))
    pipe.train(np.asarray(feats_train), h, log_fn=None)
    gen = pipe.generate(feats_test, key=jax.random.key(0))
    out = retrieval_eval(
        gen, jnp.asarray(test.img_features / np.abs(train.img_features).max()),
        jnp.asarray(test.labels), ks=(2, 16), key=jax.random.key(1),
    )
    print(json.dumps({k: float(v) for k, v in out.items()}))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="eeg_image_decode_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train-retrieval", help="contrastive retrieval training")
    p.add_argument("--streaming", action="store_true",
                   help="stream EEG batches from host RAM (native-gather "
                        "loader) instead of keeping the dataset in HBM — "
                        "for beyond-HBM datasets, e.g. all-subject joint "
                        "training")
    p.add_argument("--host-dtype", default=None, choices=["bfloat16"],
                   dest="host_dtype",
                   help="with --streaming: store/stream EEG host-side in "
                        "this dtype (halves per-batch transfer bytes)")
    p.add_argument("--shard-data", action="store_true", dest="shard_data",
                   help="keep the dataset DEVICE-resident but sharded over "
                        "the dp mesh axis on the sample axis (N/dp per "
                        "chip) — the TPU-native beyond-one-chip mode; "
                        "prefer over --streaming when the mesh's aggregate "
                        "HBM holds the data")
    _add_common(p)
    p.add_argument("--encoder", default="atms")
    p.add_argument("--subjects", default="sub-01",
                   help="comma list, or 'all' to scan sub-* under the data path")
    p.add_argument("--joint", action="store_true",
                   help="joint training over all subjects (C18)")
    p.add_argument("--sweep", action="store_true",
                   help="train a FRESH model per subject (the reference "
                        "main loop): in-subject per listed subject, or with "
                        "--cross-subject a leave-one-out round per subject; "
                        "writes <output-dir>/sweep_summary.csv")
    p.add_argument("--cross-subject", action="store_true",
                   help="leave-one-out: exclude --test-subject from training")
    p.add_argument("--test-subject", default=None)
    p.add_argument("--images-per-class", type=int, default=None,
                   dest="images_per_class",
                   help="train images per concept (EEG 10; THINGS-MEG 12)")
    p.add_argument("--train-reps", type=int, default=None, dest="train_reps",
                   help="repetitions per train image (EEG 4; THINGS-MEG 1)")
    p.add_argument("--mesh", action="store_true", help="use all devices (dp)")
    p.add_argument("--multihost", action="store_true",
                   help="join the multi-process runtime before touching "
                        "devices (jax.distributed; autodetects on TPU pod "
                        "slices) — run this same command on every host")
    p.add_argument("--resume-dir", default=None,
                   help="existing run directory: restore the latest orbax "
                        "checkpoint (full TrainState) and continue")
    p.add_argument("--export-features", default=None, dest="export_features",
                   help="after training, save train+test EEG features + "
                        "aligned CLIP targets to this .npz (the artifact "
                        "train-prior consumes; ref ATM_S_eeg_features_*.pt)")
    p.set_defaults(recon=False, fn=cmd_train_retrieval)

    p = sub.add_parser(
        "evaluate",
        help="k-way retrieval table for a trained checkpoint (no retraining)",
    )
    _add_common(p)
    p.add_argument("--run-dir", required=True,
                   help="run directory written by train-retrieval (contains "
                        "ckpt/)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to score (default: latest)")
    p.add_argument("--encoder", default="atms")
    p.add_argument("--subjects", default="sub-01",
                   help="comma list, or 'all' to scan sub-* under the data path")
    p.add_argument("--joint", action="store_true",
                   help="checkpoint was trained with --joint "
                        "(per-subject embedding tables)")
    p.add_argument("--test-subject", default=None,
                   help="restrict the test split to this subject")
    p.add_argument("--no-average", action="store_true",
                   help="score per-repetition instead of averaging the "
                        "test repetitions")
    p.add_argument("--exact-gelu", action="store_true", dest="exact_gelu",
                   help="exact-erf FFN gelu (the reference's activation) — "
                        "for checkpoints CONVERTED from the reference; "
                        "measured end-task delta vs the tanh default is "
                        "zero (docs/PARITY.md) but this makes it exact")
    p.add_argument("--csv", default=None, help="also write the row as CSV")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("train-recon", help="reconstruction-objective training")
    _add_common(p)
    p.add_argument("--encoder", default="atms")
    p.add_argument("--subjects", default="sub-08")
    p.add_argument("--mesh", action="store_true")
    p.add_argument("--resume-dir", default=None)
    p.add_argument("--export-features", default=None, dest="export_features",
                   help="after training, save train+test EEG features + "
                        "aligned CLIP targets to this .npz (the artifact "
                        "train-prior consumes; ref ATM_S_eeg_features_*.pt)")
    p.set_defaults(recon=True, joint=False, cross_subject=False,
                   test_subject=None, fn=cmd_train_retrieval)

    p = sub.add_parser("train-prior", help="diffusion prior training")
    _add_common(p)
    p.add_argument("--eeg-features", required=True,
                   help=".npz with eeg_features + img_features")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel over all devices")
    p.add_argument("--resume-dir", default=None,
                   help="existing run directory: restore the latest orbax "
                        "checkpoint (full PriorState) and continue")
    p.set_defaults(fn=cmd_train_prior)

    p = sub.add_parser("train-lowlevel", help="EEG→VAE-latent training")
    _add_common(p)
    p.add_argument("--subjects", default="sub-08")
    p.add_argument("--latents", required=True, help=".npz with latents")
    p.add_argument("--mesh", action="store_true",
                   help="data-parallel over all devices (batch size must "
                        "divide the device count)")
    p.add_argument("--preview-dir", default=None,
                   help="periodically decode sample predictions through the "
                        "frozen VAE to PNGs here (ref :309-323)")
    p.add_argument("--preview-every", type=int, default=10)
    p.add_argument("--vae-params", default=None,
                   help="pickled flax VAE params (for --preview-dir)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny VAE config (tests/smoke)")
    p.add_argument("--resume-dir", default=None,
                   help="existing run directory: restore the latest orbax "
                        "checkpoint (full state) and continue")
    p.set_defaults(fn=cmd_train_lowlevel)

    p = sub.add_parser(
        "features",
        help="build the CLIP feature cache (train-retrieval --features "
             "input) from a THINGS-layout image dir",
    )
    p.add_argument("--images-dir", required=True,
                   help="THINGS images root: <dir>/<NNNNN_concept>/<img>.jpg")
    p.add_argument("--clip-params", required=True,
                   help="pickle of {'vision':…,'text':…} converted OpenCLIP "
                        "ViT-H flax trees (utils/convert_clip.py)")
    p.add_argument("--vocab", required=True, help="CLIP BPE vocab.json")
    p.add_argument("--merges", required=True, help="CLIP BPE merges.txt")
    p.add_argument("--cache-dir", default="cache")
    p.add_argument("--split", default="train", help="train or test")
    p.add_argument("--raw", action="store_true",
                   help="skip image-feature L2 normalization (the "
                        "reconstruction pipeline's raw embeddings)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-config towers (tests/smoke)")
    p.set_defaults(fn=cmd_features)

    p = sub.add_parser(
        "latents", help="build the SDXL-VAE latent cache from an image dir"
    )
    p.add_argument("--images-dir", required=True)
    p.add_argument("--vae-params", required=True,
                   help="pickled flax VAE params (raw tree or generator dict)")
    p.add_argument("--cache-dir", default="cache")
    p.add_argument("--split", default="train")
    p.add_argument("--image-size", type=int, default=None,
                   help="default 512 (16 with --tiny)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny VAE config (tests/smoke)")
    p.set_defaults(fn=cmd_latents)

    p = sub.add_parser("preprocess", help="raw → preprocessed epochs")
    p.add_argument("--sub", type=int, required=True)
    p.add_argument("--project-dir", default=".")
    p.add_argument("--n-ses", type=int, default=4)
    p.add_argument("--sfreq", type=int, default=250)
    p.add_argument("--seed", type=int, default=20200220)
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("serve", help="HTTP serving daemon for trained artifacts")
    p.add_argument("--run-dir", required=True,
                   help="training run directory (orbax ckpt inside)")
    p.add_argument("--encoder", default="atms")
    p.add_argument("--joint", action="store_true",
                   help="checkpoint was trained with --joint "
                        "(per-subject embedding tables)")
    p.add_argument("--exact-gelu", action="store_true", dest="exact_gelu",
                   help="exact-erf FFN gelu for checkpoints CONVERTED from "
                        "the reference (see evaluate --exact-gelu)")
    p.add_argument("--features", required=True,
                   help=".npz with the gallery CLIP features "
                        "(img_features_test or img_features)")
    p.add_argument("--channels", type=int, default=63)
    p.add_argument("--timepoints", type=int, default=250)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--transfer-dtype", default=None,
                   choices=["float16", "float32"],
                   help="host→device wire format for retrieval EEG rows; "
                        "float16 halves the PCIe/tunnel bytes of the "
                        "transfer-bound coalesced dispatch (decision deltas "
                        "stay at the bf16 serving model's resolution)")
    p.add_argument("--gen-batch", type=int, default=16)
    p.add_argument("--prior-params", default=None,
                   help="enable /v1/reconstruct (pickled prior)")
    p.add_argument("--generator-params", default=None)
    p.add_argument("--git-params", default=None,
                   help="enable /v1/caption (pickled GIT decoder params; "
                        "needs --prior-params, --projector-params, --vocab)")
    p.add_argument("--projector-params", default=None,
                   help="trained PixelProjector adapter (train-adapter)")
    p.add_argument("--vocab", default=None,
                   help="WordPiece vocab file for caption detokenization")
    p.add_argument("--max-new-tokens", type=int, default=25)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "preprocess-meg",
        help="THINGS-MEG epochs npz → reference-layout pickles",
    )
    p.add_argument("--epochs", required=True,
                   help="npz from scripts/export_meg.py (epochs/event_ids/"
                        "times/ch_names)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--tmin", type=float, default=0.0)
    p.add_argument("--tmax", type=float, default=1.0)
    p.add_argument("--test-reps", type=int, default=12)
    p.add_argument("--train-reps", type=int, default=12,
                   help="images per train concept with --image-concept-csv; "
                        "reps per train concept otherwise")
    p.add_argument("--image-concept-csv", default=None,
                   help="THINGS image_concept_index.csv (1-indexed image → "
                        "concept); enables the notebook's image-level split")
    p.set_defaults(fn=cmd_preprocess_meg)

    p = sub.add_parser("generate", help="prior sampling + SDXL image generation")
    p.add_argument("--eeg-features", required=True)
    p.add_argument("--prior-params", required=True)
    p.add_argument("--generator-params", default=None,
                   help="converted SDXL weights (pickle); random init if absent")
    p.add_argument("--text-encoder-params", default=None,
                   help="converted SDXL text-encoder weights (pickle, "
                        "convert_sdxl_text_encoders output)")
    p.add_argument("--tokenizer-dir", default=None,
                   help="directory with the CLIP vocab.json + merges.txt")
    p.add_argument("--captions-file", default=None,
                   help="semantic-level text prompts, one line per test "
                        "class (e.g. cmd_caption output) — needs the text "
                        "encoder flags")
    p.add_argument("--init-latents", default=None,
                   help=".npy/.npz VAE latents per test class for the "
                        "low-level img2img init")
    p.add_argument("--img2img-strength", type=float, default=0.7)
    p.add_argument("--output-dir", default="./generated_imgs")
    p.add_argument("--class-names", default=None,
                   help="file with one THINGS class name per test class: "
                        "write <output>/<sub>/<class-name>/<j>.png (the "
                        "reference's metric-notebook layout)")
    p.add_argument("--sub", default=None,
                   help="subject tag level in the output tree, e.g. sub-08")
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--gen-batch", type=int, default=50)
    p.add_argument("--resolution", type=int, default=None,
                   help="output resolution in pixels (default: the config's "
                        "512; the reference's recombination stage uses 1024 "
                        "— 1x1024_reconstruct_sdxl.ipynb)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny generator config (tests/smoke)")
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("caption", help="GIT semantic-level batch captioning")
    p.add_argument("--embeddings", default=None,
                   help=".npy/.npz of CLIP image embeddings to caption "
                        "(skips prior sampling)")
    p.add_argument("--eeg-features", default=None)
    p.add_argument("--prior-params", default=None)
    p.add_argument("--git-params", default=None,
                   help="converted GIT decoder params (pickle, "
                        "convert_git_causal_lm output); random init if absent")
    p.add_argument("--projector-params", default=None,
                   help="PixelProjector params (pickle)")
    p.add_argument("--vocab", default=None,
                   help="WordPiece vocab.txt; raw token ids if absent")
    p.add_argument("--out", default="./semantic_level_caption.txt")
    p.add_argument("--max-new-tokens", type=int, default=25)
    p.add_argument("--caption-batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="tiny GIT config (tests/smoke)")
    p.set_defaults(fn=cmd_caption)

    p = sub.add_parser(
        "train-adapter",
        help="train the PixelProjector captioning adapter "
             "(image_adapter.ipynb)",
    )
    p.add_argument("--embeddings", required=True,
                   help=".npy/.npz of ViT-H CLIP image embeddings (the EEG "
                        "encoder's target space)")
    p.add_argument("--grids", default=None,
                   help=".npz of GIT ViT-L visual-token grids (N, 257, 1024)")
    p.add_argument("--images-dir", default=None,
                   help="encode the grids natively from these images "
                        "(needs --git-vision-params)")
    p.add_argument("--git-vision-params", default=None,
                   help="pickled flax params for GIT's CLIP ViT-L vision "
                        "tower (utils.convert_clip.convert_hf_clip_vision)")
    p.add_argument("--test-embeddings", default=None,
                   help="held-out embeddings for a final test MSE")
    p.add_argument("--test-grids", default=None)
    p.add_argument("--test-images-dir", default=None)
    p.add_argument("--cache-dir", default="cache")
    p.add_argument("--grid-batch", type=int, default=20,
                   help="vision-tower encode batch size")
    p.add_argument("--epochs", type=int, default=None, help="default 30")
    p.add_argument("--batch-size", type=int, default=None, help="default 32")
    p.add_argument("--lr", type=float, default=None, help="default 1e-3")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="output pickle (default <output-dir>/"
                        "pixel_projector.pkl)")
    p.add_argument("--output-dir", default="./runs")
    p.add_argument("--tiny", action="store_true",
                   help="tiny vision config (tests/smoke)")
    p.set_defaults(fn=cmd_train_adapter)

    p = sub.add_parser("metrics", help="reconstruction metric table")
    p.add_argument("--generated", required=True,
                   help="cmd_generate output dir, flat image dir, or .npy")
    p.add_argument("--ground-truth", required=True,
                   help="flat image dir (sorted) or .npy, aligned with "
                        "--generated")
    p.add_argument("--gen-seed", type=int, default=0,
                   help="which per-class seed image to score")
    p.add_argument("--class-names", default=None,
                   help="file with one THINGS class name per test class: "
                        "read <generated>/<class-name>/<seed>.png in this "
                        "order (the reference's generated_imgs layout; point "
                        "--generated at the <sub> level)")
    p.add_argument("--image-size", type=int, default=425,
                   help="common resize before scoring (MindEye protocol)")
    p.add_argument("--backbone-params", default=None,
                   help="pickle {alexnet/inception/effnet/swav: flax params} "
                        "from the eval.backbones converters")
    p.add_argument("--clip-params", default=None,
                   help="flax CLIP ViT-L/14 vision-tower params (pickle)")
    p.add_argument("--out", default=None, help="CSV output path")
    p.set_defaults(fn=cmd_metrics)

    p = sub.add_parser(
        "export-checkpoint",
        help="trained ATMS run → reference-format torch .pth "
             "(reverse migration)",
    )
    p.add_argument("--run-dir", required=True,
                   help="train-retrieval run directory (ckpt/ inside)")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--joint", action="store_true",
                   help="run was trained with --joint")
    p.add_argument("--num-subjects", type=int, default=None,
                   help="size of the reference's (unused) subject_wise_"
                        "linear ModuleList (default: 2, or 10 with --joint "
                        "— the reference scripts' respective defaults)")
    p.add_argument("--channels", type=int, default=63)
    p.add_argument("--timepoints", type=int, default=250)
    p.set_defaults(fn=cmd_export_checkpoint)

    p = sub.add_parser("smoke", help="synthetic end-to-end check")
    p.set_defaults(fn=cmd_smoke)

    args = parser.parse_args(argv)
    if getattr(args, "multihost", False):
        # must precede the first device touch (jax backends init lazily);
        # on TPU pod slices every argument autodetects from metadata
        import jax

        from eeg_image_decode_tpu.parallel.multihost import initialize

        idx, count = initialize()
        print(f"multihost: process {idx}/{count}, "
              f"{len(jax.local_devices())} local device(s)")
    args.fn(args)


if __name__ == "__main__":
    main()
