"""CLIP / VAE-latent feature caches.

The reference computes OpenCLIP ViT-H/14 text+image embeddings on first use
and caches them to ``ViT-H-14_features_{train,test}.pt`` keyed only by model
name + split in the CWD (``Retrieval/eegdatasets_leaveone.py:60-74``) — a
stale-cache hazard SURVEY.md §5 flags. Here caches are framework-neutral
``.npz`` files keyed by (model, split, content fingerprint of the image list),
so switching image directories can never silently reuse old features.

Encoding itself needs the OpenCLIP weights (an external model hub, L0 in the
reference's layer map); it is gated behind an optional torch/open_clip import
since TPU training only ever consumes the cached arrays.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np


def _fingerprint(items: list[str]) -> str:
    h = hashlib.sha256()
    for it in items:
        h.update(it.encode())
        h.update(b"\0")
    return h.hexdigest()[:16]


def cache_path(
    cache_dir: str, model_name: str, split: str, image_paths: list[str]
) -> str:
    fp = _fingerprint(image_paths)
    safe = model_name.replace("/", "-")
    return os.path.join(cache_dir, f"{safe}_features_{split}_{fp}.npz")


def clip_cache_path(
    cache_dir: str, split: str, image_paths: list[str],
    *, model_name: str = "ViT-H-14", normalize_img: bool = True,
) -> str:
    """The exact cache file :func:`load_or_compute_clip_features` reads and
    writes for these arguments — the single source of the key derivation."""
    tag = f"{model_name}-{'n' if normalize_img else 'r'}"
    return cache_path(cache_dir, tag, split, image_paths)


def save_features(
    path: str, *, img_features: np.ndarray, text_features: np.ndarray, **extra
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        img_features=np.asarray(img_features, np.float32),
        text_features=np.asarray(text_features, np.float32),
        **extra,
    )


def load_features(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


class FlaxCLIPFeatureEncoder:
    """TPU-side CLIP feature extraction — no torch/open_clip at runtime.

    Bundles the flax vision+text towers (``models/clip_vit.py``), converted
    weights, and the pure-Python BPE tokenizer (``data/tokenizers.py``).
    Preprocessing mirrors OpenCLIP's eval transform: bicubic resize of the
    shorter side to ``image_size`` + center crop (host-side via PIL), then
    the CLIP mean/std normalization on device.
    """

    def __init__(self, vision_tower, vision_params, text_tower=None,
                 text_params=None, tokenizer=None):
        self.vision_tower = vision_tower
        self.vision_params = vision_params
        self.text_tower = text_tower
        self.text_params = text_params
        self.tokenizer = tokenizer

    def _load_images(self, paths: list[str]) -> np.ndarray:
        from PIL import Image

        size = self.vision_tower.config.image_size
        out = np.empty((len(paths), size, size, 3), np.float32)
        for i, p in enumerate(paths):
            im = Image.open(p).convert("RGB")
            w, h = im.size
            scale = size / min(w, h)
            im = im.resize((round(w * scale), round(h * scale)),
                           Image.BICUBIC)
            left = (im.size[0] - size) // 2
            top = (im.size[1] - size) // 2
            im = im.crop((left, top, left + size, top + size))
            out[i] = np.asarray(im, np.float32) / 255.0
        return out

    def encode_images(self, image_paths: list[str], *,
                      normalize: bool = True, batch_size: int = 20
                      ) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from eeg_image_decode_tpu.models.clip_vit import clip_preprocess

        @jax.jit
        def fwd(imgs):
            feats = self.vision_tower.apply(
                {"params": self.vision_params}, clip_preprocess(imgs)
            )
            if normalize:
                feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
            return feats

        chunks = []
        for i in range(0, len(image_paths), batch_size):
            batch = image_paths[i : i + batch_size]
            imgs = self._load_images(batch)
            if len(batch) < batch_size:  # pad: one trace per batch size
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], batch_size - len(batch), 0)]
                )
            chunks.append(np.asarray(fwd(jnp.asarray(imgs)))[: len(batch)])
        return np.concatenate(chunks, 0).astype(np.float32)

    def encode_grids(self, image_paths: list[str], *,
                     batch_size: int = 20) -> np.ndarray:
        """Images → (N, 1+grid², width) visual-token grids (``return_grid``).

        The GIT adapter's regression target: the reference feeds images
        through GIT's frozen CLIP ViT-L tower and trains ``PixelProjector``
        to hit those grids (``Generation/image_adapter.ipynb`` cell 3)."""
        import jax
        import jax.numpy as jnp

        from eeg_image_decode_tpu.models.clip_vit import clip_preprocess

        @jax.jit
        def fwd(imgs):
            return self.vision_tower.apply(
                {"params": self.vision_params}, clip_preprocess(imgs),
                return_grid=True,
            )

        chunks = []
        for i in range(0, len(image_paths), batch_size):
            batch = image_paths[i : i + batch_size]
            imgs = self._load_images(batch)
            if len(batch) < batch_size:  # pad: one trace per batch size
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], batch_size - len(batch), 0)]
                )
            chunks.append(np.asarray(fwd(jnp.asarray(imgs)))[: len(batch)])
        return np.concatenate(chunks, 0).astype(np.float32)

    def encode_texts(self, prompts: list[str]) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        assert self.text_tower is not None and self.tokenizer is not None, (
            "text encoding needs text_tower + tokenizer"
        )
        ids = jnp.asarray(self.tokenizer(prompts))

        @jax.jit
        def fwd(ids):
            feats = self.text_tower.apply({"params": self.text_params}, ids)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        return np.asarray(fwd(ids)).astype(np.float32)

    def __call__(self, image_paths, text_prompts, *, normalize_img=True,
                 batch_size=20):
        img = self.encode_images(image_paths, normalize=normalize_img,
                                 batch_size=batch_size)
        txt = self.encode_texts(text_prompts)
        return img, txt


class FlaxVAELatentEncoder:
    """Image dir → SDXL-VAE latent cache, natively on TPU.

    The reference's low-level pipeline consumes pre-built
    ``train/test_image_latent_512.pt`` latent caches
    (``Generation/eegdatasets_leaveone_latent_vae_no_average.py:62-70``)
    whose production is external to that repo; this is the missing builder.
    Images are resized to ``image_size``² (bicubic, the 512² the cache name
    implies), mapped to [-1, 1], and encoded DETERMINISTICALLY through the
    frozen flax VAE (distribution mean × scaling factor — ``VAE.encode``
    with no key), yielding NHWC ``(N, size/8, size/8, 4)`` latents that
    :class:`~eeg_image_decode_tpu.train.lowlevel.LowLevelTrainer` consumes
    directly.
    """

    def __init__(self, vae, vae_params, *, image_size: int = 512):
        self.vae = vae
        self.vae_params = vae_params
        self.image_size = image_size

    def _load_images(self, paths: list[str]) -> np.ndarray:
        from PIL import Image

        size = self.image_size
        out = np.empty((len(paths), size, size, 3), np.float32)
        for i, p in enumerate(paths):
            im = Image.open(p).convert("RGB").resize((size, size),
                                                     Image.BICUBIC)
            out[i] = np.asarray(im, np.float32) / 255.0
        return out

    def encode_images(self, image_paths: list[str], *,
                      batch_size: int = 8) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def enc(imgs):
            from eeg_image_decode_tpu.gen.vae import VAE

            return self.vae.apply(
                {"params": self.vae_params}, imgs * 2.0 - 1.0,
                method=VAE.encode,
            )

        chunks = []
        for i in range(0, len(image_paths), batch_size):
            batch = image_paths[i : i + batch_size]
            imgs = self._load_images(batch)
            if len(batch) < batch_size:  # pad: one compiled shape
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], batch_size - len(batch), 0)]
                )
            chunks.append(np.asarray(enc(jnp.asarray(imgs)))[: len(batch)])
        return np.concatenate(chunks, 0).astype(np.float32)


def load_or_compute_vae_latents(
    cache_dir: str,
    split: str,
    image_paths: list[str],
    *,
    flax_vae: FlaxVAELatentEncoder,
    batch_size: int = 8,
) -> np.ndarray:
    """Content-keyed cache-or-encode for VAE latents — the analogue of
    :func:`load_or_compute_clip_features` for the low-level pipeline."""
    path = cache_path(
        cache_dir, f"sdxl-vae-{flax_vae.image_size}", split, image_paths
    )
    if os.path.exists(path):
        return load_features(path)["latents"]
    latents = flax_vae.encode_images(image_paths, batch_size=batch_size)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, latents=latents)
    return latents


def load_or_compute_git_grids(
    cache_dir: str,
    split: str,
    image_paths: list[str],
    *,
    flax_encoder: "FlaxCLIPFeatureEncoder",
    batch_size: int = 20,
) -> np.ndarray:
    """Content-keyed cache-or-encode for GIT visual-token grids — the
    production step for the reference's external
    ``ViT-L-14_features_GIT_{train,test}.pt`` caches
    (``Generation/image_adapter.ipynb`` cell 1), which that repo consumes
    but never builds. ``flax_encoder`` must wrap GIT's frozen CLIP ViT-L
    vision tower (``CLIPVisionConfig.git_vit_l_14()``)."""
    path = cache_path(cache_dir, "ViT-L-14-GIT-grid", split, image_paths)
    if os.path.exists(path):
        return load_features(path)["grids"]
    grids = flax_encoder.encode_grids(image_paths, batch_size=batch_size)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, grids=grids)
    return grids


def load_or_compute_clip_features(
    cache_dir: str,
    split: str,
    image_paths: list[str],
    text_prompts: list[str],
    *,
    model_name: str = "ViT-H-14",
    pretrained: str = "laion2b_s32b_b79k",
    normalize_img: bool = True,
    batch_size: int = 20,
    flax_encoder: "FlaxCLIPFeatureEncoder | None" = None,
) -> dict[str, np.ndarray]:
    """Cache-or-encode. Image features are L2-normalized for retrieval; pass
    ``normalize_img=False`` for the reconstruction pipeline's raw embeddings
    (ref ``Generation/eegdatasets_leaveone.py:318``).

    Encoding runs through ``flax_encoder`` (TPU, converted OpenCLIP weights +
    the native tokenizer) when given — or whenever ``open_clip`` is absent
    it is REQUIRED; the torch path is only a convenience for environments
    that already have the hub packages."""
    path = clip_cache_path(cache_dir, split, image_paths,
                           model_name=model_name, normalize_img=normalize_img)
    if os.path.exists(path):
        return load_features(path)
    if flax_encoder is None:
        try:
            import open_clip  # noqa: F401
        except ImportError:
            raise ImportError(
                "open_clip is not installed; pass flax_encoder="
                "FlaxCLIPFeatureEncoder(vision_tower, converted_params, "
                "text_tower, text_params, CLIPBPETokenizer.from_files(...)) "
                "to encode natively on TPU"
            ) from None
    if flax_encoder is not None:
        img, txt = flax_encoder(
            image_paths, text_prompts, normalize_img=normalize_img,
            batch_size=batch_size,
        )
    else:
        img, txt = compute_clip_features(
            image_paths,
            text_prompts,
            model_name=model_name,
            pretrained=pretrained,
            normalize_img=normalize_img,
            batch_size=batch_size,
        )
    save_features(path, img_features=img, text_features=txt)
    return {"img_features": img, "text_features": txt}


def compute_clip_features(
    image_paths: list[str],
    text_prompts: list[str],
    *,
    model_name: str = "ViT-H-14",
    pretrained: str = "laion2b_s32b_b79k",
    normalize_img: bool = True,
    batch_size: int = 20,
) -> tuple[np.ndarray, np.ndarray]:
    """Encode with OpenCLIP (torch). Requires the optional ``open_clip_torch``
    dependency + downloaded weights; raises a clear error otherwise."""
    try:
        import open_clip
        import torch
        from PIL import Image
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "computing CLIP features requires `open_clip_torch` and torch; "
            "precompute the .npz cache elsewhere and point the loader at it"
        ) from e

    device = "cuda" if torch.cuda.is_available() else "cpu"
    model, _, preprocess = open_clip.create_model_and_transforms(
        model_name, pretrained=pretrained, precision="fp32", device=device
    )
    tokenizer = open_clip.get_tokenizer(model_name)

    with torch.no_grad():
        tokens = tokenizer(text_prompts).to(device)
        txt = model.encode_text(tokens)
        txt = torch.nn.functional.normalize(txt, dim=-1).cpu().numpy()

        chunks = []
        for i in range(0, len(image_paths), batch_size):
            batch = torch.stack(
                [
                    preprocess(Image.open(p).convert("RGB"))
                    for p in image_paths[i : i + batch_size]
                ]
            ).to(device)
            feats = model.encode_image(batch)
            if normalize_img:
                feats = feats / feats.norm(dim=-1, keepdim=True)
            chunks.append(feats.cpu().numpy())
    return np.concatenate(chunks, 0).astype(np.float32), txt.astype(np.float32)
