"""Benchmark: ATM-S contrastive-training throughput on real THINGS-EEG shapes.

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The workload is the reference's flagship configuration (SURVEY.md §6 /
BASELINE.md): ATM-S encoder, batch 1024, train set (66160, 63, 250) — i.e.
one subject's full training split — with the 1654-way train-accuracy probe
enabled, exactly what ``Retrieval/ATMS_retrieval.py:199-254`` does per epoch.
Data is synthetic with identical shapes (EEG values don't change FLOPs) and is
generated directly in HBM with the device PRNG, the same whole-dataset-
resident layout the trainer uses on real data.

``vs_baseline`` compares training samples/sec against an estimated reference
throughput on A100: the torch script pays per-batch host→device copies and
two ``.item()`` syncs (``:210-213,238,250``); profiling similar small-conv
contrastive models puts it at ~10k samples/s on A100. North star: ≥2× on v5e.
"""

from __future__ import annotations

import json
import time

import numpy as np

# estimated reference (torch, A100) training throughput, samples/sec
A100_BASELINE_SAMPLES_PER_S = 10_000.0

N_CLASSES, IPC, REPS = 1654, 10, 4  # → 66160 train samples
BATCH = 1024
C, T, D = 63, 250, 1024


def _device_synthetic_data():
    """Build DeviceData straight in HBM (no 4.2 GB host→device transfer)."""
    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.train.contrastive import DeviceData

    n = N_CLASSES * IPC * REPS
    k = jax.random.key(0)
    ks = jax.random.split(k, 4)
    eeg = jax.random.normal(ks[0], (n, C, T), jnp.float32)
    img_feat = jax.random.normal(ks[1], (N_CLASSES * IPC, D), jnp.float32)
    img_feat = img_feat / jnp.linalg.norm(img_feat, axis=1, keepdims=True)
    text_feat = jax.random.normal(ks[2], (N_CLASSES, D), jnp.float32)
    labels = jnp.repeat(jnp.arange(N_CLASSES, dtype=jnp.int32), IPC * REPS)
    local = jnp.arange(n, dtype=jnp.int32)
    return DeviceData(
        eeg=eeg,
        labels=labels,
        subject_ids=jnp.ones((n,), jnp.int32),
        img_feat=img_feat,
        text_feat=text_feat,
        img_idx=local // REPS,
        text_idx=local // (IPC * REPS),
        class_img_feat=img_feat[::IPC],
    )


def main():
    import jax

    # threefry dropout-mask generation costs ~25% of the step (measured,
    # scripts/ablate_perf.py); the TPU-native RBG generator removes most of it
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.config import ATMSConfig, ContrastiveTrainConfig
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train.contrastive import (
        create_train_state,
        make_epoch_fn,
    )

    cfg = ContrastiveTrainConfig(encoder="atms", batch_size=BATCH)
    model = build_encoder("atms", config=ATMSConfig(), dtype=jnp.bfloat16)

    data = _device_synthetic_data()
    n = int(data.eeg.shape[0])
    state, tx = create_train_state(
        model, cfg, data.eeg[:2], data.subject_ids[:2]
    )
    epoch_fn = make_epoch_fn(model, tx, cfg)

    n_steps = n // BATCH
    perm_key = jax.random.key(1)

    def run_epoch(state, epoch):
        perm = jax.random.permutation(
            jax.random.fold_in(perm_key, epoch), n
        )[: n_steps * BATCH].reshape(n_steps, BATCH).astype(jnp.int32)
        t0 = time.perf_counter()
        state, metrics = epoch_fn(state, data, perm, jax.random.key(epoch))
        float(metrics["loss"])  # full host readback = reliable device sync
        return state, time.perf_counter() - t0, metrics

    state, _, _ = run_epoch(state, 0)  # compile
    times = []
    for epoch in (1, 2, 3):
        state, dt, metrics = run_epoch(state, epoch)
        times.append(dt)

    samples_per_s = n_steps * BATCH / min(times)
    result = {
        "metric": "atms_contrastive_train_throughput",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / A100_BASELINE_SAMPLES_PER_S, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
