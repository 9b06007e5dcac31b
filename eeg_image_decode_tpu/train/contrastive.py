"""Contrastive retrieval/reconstruction trainer — the TPU rebuild of
``Retrieval/ATMS_retrieval.py:199-512`` (and the reconstruction variant,
``Generation/ATMS_reconstruction.py:191-249``).

Design vs the reference:

- **Whole dataset in HBM.** THINGS-EEG train is (66160, 63, 250) fp32 ≈ 4.2 GB
  — it fits on one v5e chip, so the epoch loop is a single jitted
  ``lax.scan`` over shuffled batch indices: zero host↔device traffic per step,
  no ``.item()`` syncs (the reference pays one H2D copy + two D2H syncs per
  batch, ``ATMS_retrieval.py:210-213,238``).
- **SPMD data parallel.** Under a mesh the dataset is replicated, the batch
  permutation is sharded over ``dp``, so each device gathers its own batch
  shard locally; GSPMD inserts the embedding all-gather inside the InfoNCE
  logits matmul and the grad psum. Same code, any mesh size.
- **bf16 compute / fp32 state.** Model params, optimizer state, BN stats and
  the loss stay fp32; matmuls/convs run in bf16 (config.compute_dtype).
- **Train-time probe** = 1654-way class accuracy against one image feature
  per class, exactly like ``ATMS_retrieval.py:202,241-250``.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig
from eeg_image_decode_tpu.core.mesh import batch_sharding, replicated_sharding
from eeg_image_decode_tpu.data.things_eeg import EEGRetrievalData
from eeg_image_decode_tpu.losses import reconstruction_loss, retrieval_loss
from eeg_image_decode_tpu.train.evaluator import retrieval_eval


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def trainable(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(
    model: nn.Module,
    cfg: ContrastiveTrainConfig,
    sample_eeg: jax.Array,
    sample_subject_ids: jax.Array | None,
    tx: optax.GradientTransformation | None = None,
    seed: int | None = None,
) -> tuple[TrainState, optax.GradientTransformation]:
    if tx is None:
        tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    variables = model.init(
        {"params": jax.random.key(cfg.seed if seed is None else seed)},
        sample_eeg,
        sample_subject_ids,
        deterministic=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return state, tx


class DeviceData(struct.PyTreeNode):
    """Device-resident training arrays.

    Two residency modes under a mesh:

    - **replicated** (default): every device holds the full dataset. Right
      whenever it fits (one subject ≈ 4.2 GB fp32) — batch gathers are pure
      local memory traffic.
    - **sample-sharded** (``shard_samples=True``): the per-sample arrays
      (EEG, labels, subject ids, index maps) are sharded over the ``dp``
      mesh axis on axis 0, so per-device memory is N/dp — the TPU-native
      answer to beyond-one-chip datasets (all-10-subject joint training
      ≈ 42 GB fp32 → ~5 GB/chip on a v5e-8) without falling back to
      host streaming. Batches compose shard-locally: device d contributes
      B/dp samples drawn from its own shard by LOCAL index
      (``sharded_epoch_perm``), and the InfoNCE loss still sees the global
      batch because it already gathers embeddings (``losses/clip_loss.py``).
      The small CLIP feature tables stay replicated. Math is identical to
      replicated mode for the same global rows (tested exactly —
      ``tests/test_sharded_resident_data.py``).
    """

    eeg: jax.Array  # (N, C, T)
    labels: jax.Array  # (N,)
    subject_ids: jax.Array  # (N,)
    img_feat: jax.Array  # (n_imgs, D) per-image targets
    text_feat: jax.Array  # (n_cls, D)
    img_idx: jax.Array  # (N,)
    text_idx: jax.Array  # (N,)
    class_img_feat: jax.Array  # (n_cls, D) probe features (img_feat[::10])

    # sample-axis-sharded leaves (shard_samples mode): everything per-sample;
    # the feature tables stay replicated
    SAMPLE_FIELDS = ("eeg", "labels", "subject_ids", "img_idx", "text_idx")

    @staticmethod
    def from_host(
        data: EEGRetrievalData,
        mesh=None,
        *,
        shard_samples: bool = False,
        data_axis: str = "dp",
    ) -> "DeviceData":
        from eeg_image_decode_tpu.parallel.multihost import (
            process_local_slice,
            replicate_global,
            shard_global_batch,
        )

        if shard_samples and mesh is None:
            raise ValueError("shard_samples=True requires a mesh")

        put = (
            # multi-host aware: device_put when single-process, global
            # replicated arrays from identical host copies on a pod slice
            (lambda x: replicate_global(mesh, x))
            if mesh is not None
            else jax.device_put
        )
        fields = dict(
            eeg=data.eeg,
            labels=data.labels,
            subject_ids=data.subject_ids,
            img_feat=data.img_features,
            text_feat=data.text_features,
            img_idx=data.img_idx,
            text_idx=data.text_idx,
            class_img_feat=data.class_img_features(),
        )
        if not shard_samples:
            return DeviceData(**{k: put(v) for k, v in fields.items()})

        dp = mesh.shape.get(data_axis, 1)
        n = int(data.eeg.shape[0])
        if n % dp != 0:
            raise ValueError(
                f"shard_samples needs n ({n}) divisible by the "
                f"data-parallel axis ({data_axis}={dp}); drop "
                f"{n % dp} samples or change the mesh"
            )
        sl = process_local_slice(n, mesh, data_axis)
        sample_tree = {
            k: np.asarray(fields[k])[sl] for k in DeviceData.SAMPLE_FIELDS
        }
        sharded = shard_global_batch(
            mesh, sample_tree, global_rows=n, data_axis=data_axis
        )
        out = {k: put(v) for k, v in fields.items()
               if k not in DeviceData.SAMPLE_FIELDS}
        out.update(sharded)
        return DeviceData(**out)


def epoch_permutation(
    n: int, batch: int, seed: int, epoch: int
) -> np.ndarray:
    """The trainer's canonical (seed, epoch) → (n_steps, batch) shuffled
    batch-index schedule. One definition shared by ``ContrastiveTrainer``
    and the parity rehearsal (``scripts/parity_trajectory.py``) so the
    rehearsal always exercises the trainer's real batch order."""
    n_steps = n // batch
    rng = np.random.default_rng(seed * 100003 + epoch)
    return (
        rng.permutation(n)[: n_steps * batch]
        .reshape(n_steps, batch).astype(np.int32)
    )


def sharded_epoch_perm(
    n: int, batch: int, dp: int, seed: int, epoch: int
) -> np.ndarray:
    """Shard-LOCAL batch permutation for ``shard_samples`` mode.

    Returns (n_steps, batch) int32 where column block d (width batch/dp)
    holds indices into device d's local shard [0, n/dp) — laid out so the
    ``P(None, dp)`` perm sharding lands each block on the device that owns
    those rows. Each device draws an independent permutation of its own
    shard per epoch, so every sample is visited once per epoch (same
    coverage as the replicated path's global permutation, stratified by
    shard instead of fully mixed)."""
    if n % dp or batch % dp:
        raise ValueError(
            f"n={n} and batch={batch} must both be divisible by the "
            f"data-parallel axis (dp={dp})"
        )
    n_local, b_local = n // dp, batch // dp
    n_steps = n // batch
    cols = []
    for d in range(dp):
        rng = np.random.default_rng(seed * 100003 + epoch * 1009 + d)
        cols.append(
            rng.permutation(n_local)[: n_steps * b_local]
            .reshape(n_steps, b_local)
        )
    return np.concatenate(cols, axis=1).astype(np.int32)


def make_epoch_fn(
    model: nn.Module,
    tx: optax.GradientTransformation,
    cfg: ContrastiveTrainConfig,
    *,
    mesh=None,
    shard_samples: bool = False,
    raw: bool = False,
) -> Callable:
    """Build the jitted one-epoch function:
    (state, data, perm (n_steps, B), key) → (state, metrics dict).

    ``shard_samples=True`` (requires ``mesh``): the per-sample DeviceData
    leaves are sharded over ``cfg.data_axis`` and ``perm`` holds shard-LOCAL
    indices (``sharded_epoch_perm``); each device gathers its B/dp batch
    rows from its own shard via ``shard_map`` — no cross-device data motion
    for the gather, the embedding all-gather inside the loss is the only
    collective (plus the grad psum).

    ``raw=True`` returns the UNtransformed epoch function (no jit, no
    shardings) so callers can wrap it in their own transform — the
    subject-parallel sweep ``vmap``s it over a stacked subject axis
    (``train/sweep.py``).
    """
    if raw and (mesh is not None or shard_samples):
        raise ValueError("raw=True composes with mesh=None only")

    def loss_fn(params, batch_stats, batch, dropout_key):
        (feats, scale), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["eeg"],
            batch["subject_ids"],
            deterministic=False,
            rngs={"dropout": dropout_key},
            mutable=["batch_stats"],
        )
        feats = feats.astype(jnp.float32)
        if cfg.recon_loss:
            loss = reconstruction_loss(
                feats, batch["img_feat"], scale, alpha=cfg.recon_alpha
            )
        else:
            loss = retrieval_loss(
                feats, batch["img_feat"], batch["text_feat"], scale,
                alpha=cfg.alpha,
            )
        return loss, (updates["batch_stats"], feats, scale)

    if shard_samples:
        if mesh is None:
            raise ValueError("shard_samples=True requires a mesh")
        from jax.sharding import PartitionSpec as P

        def take_rows(arr, idx):
            # per-device local gather: arr sharded (N/dp rows/device), idx
            # holds LOCAL indices for that device's B/dp batch columns
            return jax.shard_map(
                lambda a, i: jnp.take(a, i, axis=0),
                mesh=mesh,
                in_specs=(P(cfg.data_axis), P(cfg.data_axis)),
                out_specs=P(cfg.data_axis),
            )(arr, idx)
    else:
        def take_rows(arr, idx):
            return jnp.take(arr, idx, axis=0)

    def train_step(carry, idx, data: DeviceData, base_key):
        state: TrainState = carry
        batch = {
            "eeg": take_rows(data.eeg, idx),
            "subject_ids": take_rows(data.subject_ids, idx),
            "img_feat": jnp.take(
                data.img_feat, take_rows(data.img_idx, idx), axis=0
            ),
            "text_feat": jnp.take(
                data.text_feat, take_rows(data.text_idx, idx), axis=0
            ),
            "labels": take_rows(data.labels, idx),
        }
        dropout_key = jax.random.fold_in(base_key, state.step)
        (loss, (new_bs, feats, scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, dropout_key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        # train-time class-accuracy probe (ref :241-250)
        probe_logits = jnp.dot(
            feats, data.class_img_feat.T, preferred_element_type=jnp.float32
        )
        acc = jnp.mean(
            (jnp.argmax(probe_logits, axis=1) == batch["labels"]).astype(
                jnp.float32
            )
        )
        return new_state, {"loss": loss, "train_acc": acc}

    def epoch_fn(state: TrainState, data: DeviceData, perm: jax.Array, key):
        step = partial(train_step, data=data, base_key=key)
        state, metrics = jax.lax.scan(step, state, perm)
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    if raw:
        return epoch_fn
    if mesh is None:
        # (shard_samples without a mesh already raised above)
        return jax.jit(epoch_fn, donate_argnums=(0,))
    from eeg_image_decode_tpu.core.mesh import dp_epoch_jit, validate_dp_batch

    validate_dp_batch(mesh, cfg.batch_size, cfg.data_axis)
    if shard_samples:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from eeg_image_decode_tpu.core.mesh import replicated_sharding

        repl = replicated_sharding(mesh)
        samp = NamedSharding(mesh, P(cfg.data_axis))
        data_shardings = DeviceData(
            **{f: (samp if f in DeviceData.SAMPLE_FIELDS else repl)
               for f in ("eeg", "labels", "subject_ids", "img_feat",
                         "text_feat", "img_idx", "text_idx",
                         "class_img_feat")}
        )
        return jax.jit(
            epoch_fn,
            donate_argnums=(0,),
            in_shardings=(
                repl,
                data_shardings,
                NamedSharding(mesh, P(None, cfg.data_axis)),
                repl,
            ),
            out_shardings=(repl, repl),
        )
    # batch permutation sharded over dp → each device gathers its batch shard
    return dp_epoch_jit(
        epoch_fn, mesh, n_args=4, perm_index=2, data_axis=cfg.data_axis
    )


def make_step_fn(
    model: nn.Module,
    tx: optax.GradientTransformation,
    cfg: ContrastiveTrainConfig,
    *,
    mesh=None,
) -> Callable:
    """Jitted per-batch train step for STREAMING datasets (beyond-HBM, e.g.
    all-10-subject joint training at ~42 GB fp32 — the reference streams
    this through DataLoader workers, ``ATMS_retrieval_joint_train.py``).

    The big EEG tensor stays on the host and arrives per batch (assembled by
    ``data/loader.py``'s native gather pipeline); the small CLIP feature
    tables stay HBM-resident and are gathered on device by index. Identical
    math to the resident path — ``(state, batch, img_feat_all,
    text_feat_all, class_img_feat, base_key) → (state, metrics)``.
    """

    def loss_fn(params, batch_stats, batch, dropout_key):
        (feats, scale), updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["eeg"],
            batch["subject_ids"],
            deterministic=False,
            rngs={"dropout": dropout_key},
            mutable=["batch_stats"],
        )
        feats = feats.astype(jnp.float32)
        if cfg.recon_loss:
            loss = reconstruction_loss(
                feats, batch["img_feat"], scale, alpha=cfg.recon_alpha
            )
        else:
            loss = retrieval_loss(
                feats, batch["img_feat"], batch["text_feat"], scale,
                alpha=cfg.alpha,
            )
        return loss, (updates["batch_stats"], feats, scale)

    def step(state, batch, img_feat_all, text_feat_all, class_img_feat,
             base_key):
        full = dict(batch)
        full["img_feat"] = jnp.take(img_feat_all, batch["img_idx"], axis=0)
        full["text_feat"] = jnp.take(
            text_feat_all, batch["text_idx"], axis=0
        )
        dropout_key = jax.random.fold_in(base_key, state.step)
        (loss, (new_bs, feats, scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, full, dropout_key)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        probe_logits = jnp.dot(
            feats, class_img_feat.T, preferred_element_type=jnp.float32
        )
        acc = jnp.mean(
            (jnp.argmax(probe_logits, axis=1) == batch["labels"]).astype(
                jnp.float32
            )
        )
        return new_state, {"loss": loss, "train_acc": acc}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    from eeg_image_decode_tpu.core.mesh import validate_dp_batch

    validate_dp_batch(mesh, cfg.batch_size, cfg.data_axis)
    repl = replicated_sharding(mesh)
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(repl, batch_sharding(mesh), repl, repl, repl, repl),
        out_shardings=(repl, repl),
    )


def make_eval_features_fn(model: nn.Module, batch_size: int = 200) -> Callable:
    """Jitted eval-feature extractor over the (small) test set."""

    @jax.jit
    def eval_features(params, batch_stats, eeg, subject_ids):
        feats, scale = model.apply(
            {"params": params, "batch_stats": batch_stats},
            eeg,
            subject_ids,
            deterministic=True,
        )
        return feats.astype(jnp.float32), scale

    return eval_features


class ContrastiveTrainer:
    """Orchestrates epochs → eval → checkpoint → CSV metrics, mirroring
    ``main_train_loop`` (``ATMS_retrieval.py:364-512``) without its
    crash-if-no-logger bug."""

    def __init__(
        self,
        model: nn.Module,
        cfg: ContrastiveTrainConfig,
        train_data: EEGRetrievalData,
        test_data: EEGRetrievalData,
        *,
        mesh=None,
        output_dir: str | None = None,
        checkpointer=None,
        streaming: bool = False,
        shard_samples: bool = False,
    ):
        """``streaming=True`` keeps the EEG tensor on the HOST and streams
        batches through the native-gather ``PrefetchLoader`` — for datasets
        beyond one chip's HBM (all-10-subject joint training ≈ 42 GB fp32;
        the reference's DataLoader-workers case). Batch permutations, RNG
        keys, and math are identical to the HBM-resident path, so the two
        modes produce the same training trajectory (tested).

        ``shard_samples=True`` (requires ``mesh``) keeps the dataset
        DEVICE-resident but sharded over the dp axis on the sample axis —
        per-device memory N/dp, batches composed shard-locally
        (:class:`DeviceData`). The TPU-native beyond-one-chip mode; prefer
        it over ``streaming`` whenever the dataset fits the mesh's
        aggregate HBM."""
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.output_dir = output_dir
        self.checkpointer = checkpointer
        self.train_host = train_data
        self.streaming = streaming
        self.shard_samples = shard_samples
        if streaming and shard_samples:
            raise ValueError(
                "streaming and shard_samples are mutually exclusive "
                "residency modes (host-streamed vs device-sharded)"
            )
        if streaming:
            from eeg_image_decode_tpu.core.mesh import batch_sharding
            from eeg_image_decode_tpu.data.loader import PrefetchLoader

            if train_data.n < cfg.batch_size:
                raise ValueError(
                    f"streaming mode drops the ragged final batch, so a "
                    f"dataset of n={train_data.n} samples yields ZERO "
                    f"batches at batch_size={cfg.batch_size}; lower "
                    f"batch_size to at most n"
                )
            self.loader = PrefetchLoader(
                {
                    "eeg": np.asarray(train_data.eeg, np.float32),
                    "subject_ids": np.asarray(
                        train_data.subject_ids, np.int32
                    ),
                    "img_idx": np.asarray(train_data.img_idx, np.int32),
                    "text_idx": np.asarray(train_data.text_idx, np.int32),
                    "labels": np.asarray(train_data.labels, np.int32),
                },
                cfg.batch_size,
                seed=cfg.seed,
                sharding=batch_sharding(mesh) if mesh is not None else None,
                host_dtype=cfg.host_dtype,
            )
            from eeg_image_decode_tpu.parallel.multihost import (
                replicate_global,
            )

            put = (
                (lambda x: replicate_global(mesh, x))
                if mesh is not None
                else jax.device_put
            )
            self.img_feat = put(jnp.asarray(train_data.img_features))
            self.text_feat = put(jnp.asarray(train_data.text_features))
            self.class_img_feat = put(
                jnp.asarray(train_data.class_img_features())
            )
            self.data = None
        else:
            self.data = DeviceData.from_host(
                train_data, mesh, shard_samples=shard_samples,
                data_axis=cfg.data_axis,
            )
        self.test_eeg = jax.device_put(test_data.eeg)
        self.test_subject_ids = jax.device_put(test_data.subject_ids)
        self.test_labels = jax.device_put(test_data.labels)
        self.test_class_img_feat = jax.device_put(test_data.class_img_features())

        sample = train_data.eeg[: min(2, train_data.n)]
        sids = train_data.subject_ids[: min(2, train_data.n)]
        self.state, self.tx = create_train_state(
            model, cfg, jnp.asarray(sample), jnp.asarray(sids)
        )
        if streaming:
            self.step_fn = make_step_fn(model, self.tx, cfg, mesh=mesh)
        else:
            self.epoch_fn = make_epoch_fn(
                model, self.tx, cfg, mesh=mesh, shard_samples=shard_samples
            )
        self.eval_fn = make_eval_features_fn(model)
        self.history: list[dict] = []
        self.start_epoch = 0

    def resume(self, step: int | None = None) -> int:
        """Restore the full TrainState (params + BN stats + optimizer + step)
        from the checkpointer and reload the completed history rows, so
        ``fit()`` continues with the next epoch. The reference cannot do this
        (SURVEY.md §5: bare state_dict, no optimizer state, no resume).

        Per-epoch permutations and RNG keys are derived from (seed, epoch),
        so a resumed run reproduces the uninterrupted run's remaining epochs
        exactly. Returns the epoch training will continue from."""
        assert self.checkpointer is not None, "resume needs a checkpointer"
        step = self.checkpointer.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.checkpointer.directory}"
            )
        self.state = self.checkpointer.restore(step, self.state)
        self.start_epoch = int(step)  # save key = completed epoch count
        if self.output_dir:
            path = os.path.join(self.output_dir, "results.csv")
            if os.path.exists(path):
                import csv

                with open(path, newline="") as f:
                    rows = list(csv.DictReader(f))
                self.history = [
                    {k: (int(v) if k == "epoch" else float(v))
                     for k, v in row.items() if v != ""}
                    for row in rows
                    if row.get("epoch", "") != ""
                    and int(row["epoch"]) < self.start_epoch
                ]
        return self.start_epoch

    def _epoch_perm(self, epoch: int) -> np.ndarray:
        n = self.train_host.n
        bs = self.cfg.batch_size
        if self.shard_samples:
            dp = self.mesh.shape.get(self.cfg.data_axis, 1)
            return sharded_epoch_perm(n, bs, dp, self.cfg.seed, epoch)
        return epoch_permutation(n, bs, self.cfg.seed, epoch)

    def train_epoch(self, epoch: int) -> dict:
        key = jax.random.key(self.cfg.seed + 7919 * epoch)
        t0 = time.perf_counter()
        if self.streaming:
            # PrefetchLoader permutes with the same (seed, epoch) formula as
            # _epoch_perm, so both modes see identical batches in order
            rows = []
            n = 0
            for batch in self.loader.epoch(epoch):
                self.state, m = self.step_fn(
                    self.state, batch, self.img_feat, self.text_feat,
                    self.class_img_feat, key,
                )
                rows.append(m)
                n += self.cfg.batch_size
            metrics = jax.tree_util.tree_map(
                lambda *xs: float(np.mean([jax.device_get(x) for x in xs])),
                *rows,
            )
        else:
            perm = jnp.asarray(self._epoch_perm(epoch))
            self.state, metrics = self.epoch_fn(
                self.state, self.data, perm, key
            )
            metrics = jax.tree_util.tree_map(
                float, jax.device_get(metrics)
            )
            n = perm.size
        metrics["epoch_time_s"] = time.perf_counter() - t0
        metrics["samples_per_s"] = n / metrics["epoch_time_s"]
        return metrics

    def evaluate(self, epoch: int = 0) -> dict:
        feats, scale = self.eval_fn(
            self.state.params,
            self.state.batch_stats,
            self.test_eeg,
            self.test_subject_ids,
        )
        out = retrieval_eval(
            feats,
            self.test_class_img_feat,
            self.test_labels,
            scale,
            ks=self.cfg.eval_ks,
            key=jax.random.key(self.cfg.seed + 104729 * epoch),
        )
        return {k: float(v) for k, v in out.items()}

    def fit(self, epochs: int | None = None, log_fn=print) -> list[dict]:
        import math

        epochs = epochs or self.cfg.epochs
        for epoch in range(self.start_epoch, epochs):
            train_metrics = self.train_epoch(epoch)
            if not math.isfinite(train_metrics["loss"]):
                # abort before the checkpointer persists a poisoned state
                # (the reference's finite-loss guard, models/util.py:92-94,
                # promoted from its legacy helper to the real trainer)
                raise FloatingPointError(
                    f"non-finite training loss {train_metrics['loss']} at "
                    f"epoch {epoch}; last checkpoint is still clean"
                )
            eval_metrics = self.evaluate(epoch)
            row = {"epoch": epoch, **train_metrics, **eval_metrics}
            self.history.append(row)
            if log_fn:
                k200 = eval_metrics.get("top1_k200", eval_metrics.get("top1_k2", 0))
                log_fn(
                    f"epoch {epoch}: loss={train_metrics['loss']:.4f} "
                    f"train_acc={train_metrics['train_acc']:.4f} "
                    f"test_top1={k200:.4f} "
                    f"({train_metrics['samples_per_s']:.0f} samples/s)"
                )
            if (
                self.checkpointer is not None
                and (epoch + 1) % self.cfg.ckpt_every_epochs == 0
            ):
                self.checkpointer.save(epoch + 1, self.state)
            if self.output_dir:
                self._write_csv()  # kept current so a killed run can resume
        if self.checkpointer is not None and epochs > self.start_epoch:
            if self.checkpointer.latest_step() != epochs:
                self.checkpointer.save(epochs, self.state)  # final state
            # saves are async — block until they are durable, or a process
            # that exits (or resumes) right after fit() can find no
            # finalized checkpoint (observed as a flake under host load)
            self.checkpointer.manager.wait_until_finished()
        if self.output_dir:
            try:
                from eeg_image_decode_tpu.utils.plotting import (
                    plot_training_summary,
                )

                plot_training_summary(
                    self.history, os.path.join(self.output_dir, "summary.png")
                )  # the reference's pos_img_text.png panel (:462-510)
            except Exception:
                pass  # plotting is best-effort (headless/mpl issues)
        return self.history

    def extract_features(
        self, eeg: np.ndarray | jax.Array, subject_ids: np.ndarray | jax.Array,
        batch_size: int = 2048,
    ) -> np.ndarray:
        """EEG epochs → encoder features (the reference's ``get_eegfeatures``
        export, ``Generation_metrics_sub8.ipynb`` cell 2-3)."""
        eeg = jnp.asarray(eeg)
        subject_ids = jnp.asarray(subject_ids)
        chunks = []
        for i in range(0, eeg.shape[0], batch_size):
            feats, _ = self.eval_fn(
                self.state.params,
                self.state.batch_stats,
                eeg[i : i + batch_size],
                subject_ids[i : i + batch_size],
            )
            chunks.append(np.asarray(feats))
        return np.concatenate(chunks, axis=0)

    def export_features(self, path: str) -> str:
        """Save train+test EEG features + aligned CLIP targets as .npz — the
        artifact the diffusion-prior trainer consumes (the reference's
        ``ATM_S_eeg_features_sub-08{,_test}.pt`` pair)."""
        train_feats = self.extract_features(
            self.train_host.eeg, self.train_host.subject_ids
        )
        test_feats = self.extract_features(
            self.test_eeg, self.test_subject_ids
        )
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(
            path,
            eeg_features=train_feats,
            eeg_features_test=test_feats,
            img_features=self.train_host.img_features[self.train_host.img_idx],
            labels_test=np.asarray(self.test_labels),
        )
        return path

    def _write_csv(self):
        import csv

        os.makedirs(self.output_dir, exist_ok=True)
        path = os.path.join(self.output_dir, "results.csv")
        if not self.history:
            return
        keys = sorted({k for row in self.history for k in row})
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.history)
