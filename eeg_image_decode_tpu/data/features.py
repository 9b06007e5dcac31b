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
) -> dict[str, np.ndarray]:
    """Cache-or-encode. Image features are L2-normalized for retrieval; pass
    ``normalize_img=False`` for the reconstruction pipeline's raw embeddings
    (ref ``Generation/eegdatasets_leaveone.py:318``)."""
    path = cache_path(cache_dir, f"{model_name}-{'n' if normalize_img else 'r'}",
                      split, image_paths)
    if os.path.exists(path):
        return load_features(path)
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
