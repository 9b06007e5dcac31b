"""PixelProjector adapter training — the GIT captioning bridge.

The reference trains a small adapter with MSE from the ViT-H CLIP embedding
(what the EEG encoder predicts) to the GIT ViT-L/14 visual-token grid
(``Generation/image_adapter.ipynb`` cell 3: AdamW lr 1e-3, batch 32,
30 epochs, bf16, MSELoss). Here the whole run is one jitted ``lax.scan``
over shuffled batches — the dataset (16k × 257 × 1024 grids) stays
HBM-resident and an epoch is a single dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
import optax

from eeg_image_decode_tpu.models.git_caption import PixelProjector


@dataclass(frozen=True)
class AdapterTrainConfig:
    epochs: int = 30
    batch_size: int = 32
    lr: float = 1e-3
    weight_decay: float = 1e-2  # torch AdamW default
    seed: int = 0


def train_pixel_projector(
    clip_embeds: np.ndarray,  # (N, D) ViT-H image embeddings
    git_grids: np.ndarray,  # (N, T, D_out) GIT vision-tower grids
    config: AdapterTrainConfig = AdapterTrainConfig(),
    *,
    dtype=jnp.bfloat16,
) -> tuple[dict, list[float]]:
    """→ (params, per-epoch losses). MSE, AdamW, drop-last batching."""
    n, d = clip_embeds.shape
    _, t, d_out = git_grids.shape
    model = PixelProjector(num_tokens=t, out_dim=d_out, dtype=dtype)
    params = model.init(jax.random.key(config.seed),
                        jnp.zeros((1, d)))["params"]
    tx = optax.adamw(config.lr, weight_decay=config.weight_decay)
    opt_state = tx.init(params)

    x = jnp.asarray(clip_embeds, jnp.float32)
    y = jnp.asarray(git_grids, jnp.float32)
    steps = n // config.batch_size  # drop_last=True like the reference
    if steps == 0:
        raise ValueError(f"need ≥{config.batch_size} samples, have {n}")

    def epoch(carry, perm):
        params, opt_state = carry

        def step(carry, idx):
            params, opt_state = carry
            xb, yb = x[idx], y[idx]

            def loss_fn(p):
                pred = model.apply({"params": p}, xb)
                return jnp.mean((pred.astype(jnp.float32) - yb) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        idx = perm[: steps * config.batch_size].reshape(
            steps, config.batch_size
        )
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), idx
        )
        return (params, opt_state), losses.mean()

    @jax.jit
    def run(params, opt_state, perms):
        return jax.lax.scan(epoch, (params, opt_state), perms)

    rng = np.random.default_rng(config.seed)
    perms = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(config.epochs)]).astype(
            np.int32
        )
    )
    (params, _), losses = run(params, opt_state, perms)
    return jax.device_get(params), [float(l) for l in losses]


def evaluate_pixel_projector(
    params: dict, clip_embeds: np.ndarray, git_grids: np.ndarray, *,
    batch_size: int = 32, dtype=jnp.bfloat16,
) -> float:
    """Held-out MSE (the reference's test loop)."""
    t, d_out = git_grids.shape[1:]
    model = PixelProjector(num_tokens=t, out_dim=d_out, dtype=dtype)

    @jax.jit
    def mse(params, x, y):
        pred = model.apply({"params": params}, x).astype(jnp.float32)
        return jnp.mean((pred - y) ** 2)

    losses = []
    for i in range(0, clip_embeds.shape[0], batch_size):
        losses.append(float(mse(
            params,
            jnp.asarray(clip_embeds[i : i + batch_size], jnp.float32),
            jnp.asarray(git_grids[i : i + batch_size], jnp.float32),
        )))
    return float(np.mean(losses))
