"""Shared workload for the multi-host equivalence test: ONE deterministic
contrastive train step (NICE encoder + InfoNCE + AdamW + BatchNorm psum +
probe accuracy) over an 8-device ``(dp=8, mp=1)`` mesh.

Imported both by the parent pytest process (single-process, 8 virtual
devices — the reference value) and by each member of the 2-process CPU
cluster in ``tests/_multihost_child.py`` (4 local devices each). The data,
model init, and dropout keys are all derived from fixed seeds, so the only
difference between the two runs is WHO owns which shard — which is exactly
what the test pins down."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

GLOBAL_BATCH = 16
N_CLASSES = 8
CLIP_DIM = 32
TIMEPOINTS = 64


def _host_data():
    rng = np.random.default_rng(20200220)
    eeg = rng.normal(size=(GLOBAL_BATCH, 63, TIMEPOINTS)).astype(np.float32)
    labels = np.arange(GLOBAL_BATCH, dtype=np.int32) % N_CLASSES
    sids = np.zeros(GLOBAL_BATCH, np.int32)
    img_feat = rng.normal(size=(N_CLASSES, CLIP_DIM)).astype(np.float32)
    img_feat /= np.linalg.norm(img_feat, axis=1, keepdims=True)
    text_feat = rng.normal(size=(N_CLASSES, CLIP_DIM)).astype(np.float32)
    text_feat /= np.linalg.norm(text_feat, axis=1, keepdims=True)
    return eeg, labels, sids, img_feat, text_feat


def run_case(*, multihost_feed: bool) -> tuple[float, float]:
    """Returns (loss, train_acc) of one global train step.

    ``multihost_feed=True`` feeds each process's local rows through
    ``shard_global_batch`` / ``replicate_global``; ``False`` is the plain
    single-process ``device_put`` path (same helpers, degenerate branch).
    """
    from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig
    from eeg_image_decode_tpu.core.mesh import create_mesh
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.parallel.multihost import (
        process_local_slice,
        replicate_global,
        shard_global_batch,
    )
    from eeg_image_decode_tpu.train.contrastive import (
        create_train_state,
        make_step_fn,
    )

    mesh = create_mesh(data_parallel=8)
    eeg, labels, sids, img_feat, text_feat = _host_data()

    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=GLOBAL_BATCH, epochs=1, lr=1e-3,
        eval_ks=(N_CLASSES,),
    )
    model = build_encoder(
        "nice", proj_dim=CLIP_DIM, temporal_kernel=9, pool_size=16,
        pool_stride=4,
    )
    state, tx = create_train_state(
        model, cfg, jnp.asarray(eeg[:2]), jnp.asarray(sids[:2])
    )
    state = replicate_global(mesh, state)

    rows = process_local_slice(GLOBAL_BATCH, mesh) if multihost_feed \
        else slice(None)
    batch = shard_global_batch(
        mesh,
        {
            "eeg": eeg[rows],
            "subject_ids": sids[rows],
            "labels": labels[rows],
            "img_idx": labels[rows],
            "text_idx": labels[rows],
        },
        global_rows=GLOBAL_BATCH,
    )
    img_all, text_all, class_img = replicate_global(
        mesh, (img_feat, text_feat, img_feat)
    )

    step_fn = make_step_fn(model, tx, cfg, mesh=mesh)
    state, metrics = step_fn(
        state, batch, img_all, text_all, class_img, jax.random.key(7)
    )
    loss = float(jax.device_get(metrics["loss"].addressable_shards[0].data))
    acc = float(
        jax.device_get(metrics["train_acc"].addressable_shards[0].data)
    )
    return loss, acc


def run_sharded_resident_case() -> tuple[float, float]:
    """One epoch of the dp-SHARDED resident-dataset mode
    (``DeviceData.from_host(shard_samples=True)`` + shard-local perms) over
    the global 8-device mesh. ``from_host`` is multihost-aware internally
    (each process contributes only its ``process_local_slice`` rows), so
    the same call works in the single-process reference run and inside the
    2-process cluster — the values must agree bit-for-bit."""
    from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig
    from eeg_image_decode_tpu.core.mesh import create_mesh
    from eeg_image_decode_tpu.data.things_eeg import EEGRetrievalData
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.parallel.multihost import replicate_global
    from eeg_image_decode_tpu.train.contrastive import (
        DeviceData,
        create_train_state,
        make_epoch_fn,
        sharded_epoch_perm,
    )

    mesh = create_mesh(data_parallel=8)
    n = GLOBAL_BATCH * 2  # 2 steps/epoch, 4 rows per device resident
    rng = np.random.default_rng(777)
    train = EEGRetrievalData(
        eeg=rng.normal(size=(n, 63, TIMEPOINTS)).astype(np.float32),
        labels=(np.arange(n, dtype=np.int32) % N_CLASSES),
        subject_ids=np.zeros(n, np.int32),
        img_idx=(np.arange(n, dtype=np.int32) % N_CLASSES),
        text_idx=(np.arange(n, dtype=np.int32) % N_CLASSES),
        img_features=rng.normal(size=(N_CLASSES, CLIP_DIM)).astype(np.float32),
        text_features=rng.normal(size=(N_CLASSES, CLIP_DIM)).astype(np.float32),
        n_classes=N_CLASSES,
    )
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=GLOBAL_BATCH, epochs=1, lr=1e-3,
        eval_ks=(N_CLASSES,),
    )
    model = build_encoder(
        "nice", proj_dim=CLIP_DIM, temporal_kernel=9, pool_size=16,
        pool_stride=4,
    )
    state, tx = create_train_state(
        model, cfg, jnp.asarray(train.eeg[:2]),
        jnp.asarray(train.subject_ids[:2]),
    )
    state = replicate_global(mesh, state)
    data = DeviceData.from_host(train, mesh, shard_samples=True)
    epoch_fn = make_epoch_fn(model, tx, cfg, mesh=mesh, shard_samples=True)
    perm = jnp.asarray(sharded_epoch_perm(
        n, GLOBAL_BATCH, 8, seed=3, epoch=0
    ))
    state, metrics = epoch_fn(state, data, perm, jax.random.key(11))
    loss = float(jax.device_get(metrics["loss"].addressable_shards[0].data))
    acc = float(
        jax.device_get(metrics["train_acc"].addressable_shards[0].data)
    )
    return loss, acc
