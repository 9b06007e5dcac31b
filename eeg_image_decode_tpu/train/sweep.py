"""Subject-parallel sweep: train every per-subject model AT ONCE on the mesh.

The reference's main protocol (``Retrieval/ATMS_retrieval.py:516-586``) is a
Python loop over 10 subjects — 10 *independent* training runs executed
sequentially (`for sub in subjects: ... main_train_loop(...)`). Our
sequential ``train-retrieval --sweep`` mirrors that loop; this module is the
TPU-native answer to it: the runs are embarrassingly parallel, so instead of
making one run faster, run them all simultaneously —

- stack the per-subject ``TrainState``s and datasets on a leading subject
  axis,
- ``jax.vmap`` the SAME epoch function the single-subject trainer jits
  (``make_epoch_fn(raw=True)`` — one training-step definition, no fork),
- shard the subject axis over the mesh (``NamedSharding(P('dp'))``).

Each device then trains its own subject(s) with ZERO collectives — no
embedding all-gather, no grad psum, nothing crosses ICI — so scaling is
linear by construction, and the per-device program is byte-for-byte the
single-subject program. On a v5e-8 the 10-subject protocol runs in
~2 sequential rounds (8 + 2) instead of 10.

Equivalence is exact, not approximate: with the same seed each stacked lane
reproduces the sequential ``ContrastiveTrainer`` run — same init key
(``create_train_state``), same ``epoch_permutation`` batch order, same
per-step dropout fold-ins, same evaluator keys — pinned lane-vs-sequential
by ``tests/test_sweep_parallel.py``.

Memory: each device holds S/dp subjects' full datasets (one THINGS-EEG
subject ≈ 4.2 GB fp32), states, and optimizer — the same residency contract
as the single-subject resident trainer, times the subjects it owns.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig
from eeg_image_decode_tpu.data.things_eeg import EEGRetrievalData
from eeg_image_decode_tpu.train.contrastive import (
    DeviceData,
    create_train_state,
    epoch_permutation,
    make_epoch_fn,
    make_eval_features_fn,
)
from eeg_image_decode_tpu.train.evaluator import retrieval_eval


class SubjectParallelSweep:
    """Train ``S = len(train_datas)`` independent per-subject models in one
    vmapped, subject-sharded program.

    Args:
        model: the (shared-architecture) encoder — a fresh parameter set is
            initialized per subject, exactly like the reference's
            ``for sub: model = ATMS()`` loop.
        cfg: trainer config (batch size, lr, loss mix — shared, as in the
            reference sweep).
        train_datas / test_datas: per-subject splits. All train splits must
            share shapes (true for THINGS-EEG: every subject is
            (66160, 63, 250)).
        mesh: the device mesh; the subject axis is sharded over
            ``subject_axis`` (default the ``dp`` axis), so S must be a
            multiple of that axis's size — pad the subject list (train a
            duplicate, discard it) for ragged protocols like 10-on-8.
        seeds: per-subject seeds; defaults to ``cfg.seed`` for every lane,
            matching the sequential sweep (same init, fresh params).
    """

    def __init__(
        self,
        model,
        cfg: ContrastiveTrainConfig,
        train_datas: list[EEGRetrievalData],
        test_datas: list[EEGRetrievalData],
        *,
        mesh,
        subject_axis: str = "dp",
        seeds: list[int] | None = None,
    ):
        if len(train_datas) != len(test_datas):
            raise ValueError(
                f"{len(train_datas)} train splits vs {len(test_datas)} test"
            )
        s = len(train_datas)
        axis_size = mesh.shape[subject_axis]
        if s % axis_size != 0:
            raise ValueError(
                f"{s} subjects do not divide the '{subject_axis}' mesh axis "
                f"({axis_size}); pad the subject list to a multiple"
            )
        ns = {int(d.eeg.shape[0]) for d in train_datas}
        if len(ns) != 1:
            raise ValueError(
                f"per-subject train sizes differ ({sorted(ns)}); stacking "
                "needs identical shapes"
            )
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.n = ns.pop()
        self.seeds = list(seeds) if seeds is not None else [cfg.seed] * s
        if len(self.seeds) != s:
            raise ValueError(f"{len(self.seeds)} seeds for {s} subjects")
        self.n_subjects = s
        self._shard = NamedSharding(mesh, P(subject_axis))

        # per-subject fresh states, stacked on axis 0 and subject-sharded
        states = []
        for d, seed in zip(train_datas, self.seeds):
            st, tx = create_train_state(
                model, cfg,
                jnp.asarray(d.eeg[:2]), jnp.asarray(d.subject_ids[:2]),
                seed=seed,
            )
            states.append(st)
        self.tx = tx
        self.state = jax.tree_util.tree_map(
            lambda *xs: jax.device_put(jnp.stack(xs), self._shard), *states
        )

        # stacked datasets: every DeviceData leaf gains a leading S axis,
        # sharded so device d holds ONLY its own subjects' arrays
        fields = {}
        for name, get in (
            ("eeg", lambda d: d.eeg),
            ("labels", lambda d: d.labels),
            ("subject_ids", lambda d: d.subject_ids),
            ("img_feat", lambda d: d.img_features),
            ("text_feat", lambda d: d.text_features),
            ("img_idx", lambda d: d.img_idx),
            ("text_idx", lambda d: d.text_idx),
            ("class_img_feat", lambda d: d.class_img_features()),
        ):
            fields[name] = jax.device_put(
                np.stack([np.asarray(get(d)) for d in train_datas]),
                self._shard,
            )
        self.data = DeviceData(**fields)

        self.test_eeg = [jnp.asarray(d.eeg) for d in test_datas]
        self.test_sids = [jnp.asarray(d.subject_ids) for d in test_datas]
        self.test_labels = [jnp.asarray(d.labels) for d in test_datas]
        self.test_class_img = [
            jnp.asarray(d.class_img_features()) for d in test_datas
        ]

        # ONE epoch program: the single-subject epoch fn vmapped over each
        # device's LOCAL lane block inside shard_map. shard_map (not GSPMD
        # in_shardings) is load-bearing for correctness, not just clarity:
        # vmapping over per-lane conv KERNELS lowers to
        # batch_group_count=S grouped convolutions, and XLA's SPMD
        # partitioner miscompiles those when the grouped batch axis is
        # sharded (measured on CPU: the spatial_conv output differs by O(1)
        # between the sharded and unsharded compilation of the SAME vmapped
        # forward). shard_map sidesteps the partitioner entirely — each
        # device runs the unpartitioned per-lane program on the lanes it
        # owns, which also makes "no collectives" true by construction
        # (asserted on the compiled HLO in tests/test_sweep_parallel.py).
        raw_epoch = make_epoch_fn(model, tx, cfg, raw=True)
        spec = P(subject_axis)
        self._epoch = jax.jit(
            jax.shard_map(
                jax.vmap(raw_epoch),
                mesh=mesh,
                in_specs=(spec, spec, spec, spec),
                out_specs=(spec, spec),
            ),
            donate_argnums=(0,),
        )
        self._eval_feats = make_eval_features_fn(model)
        self.history: list[list[dict]] = [[] for _ in range(s)]

    def subject_state(self, i: int):
        """Lane ``i``'s TrainState (leaves sliced from the stacked axis) —
        feed it to the existing checkpoint/export/eval surfaces."""
        return jax.tree_util.tree_map(lambda x: x[i], self.state)

    def _epoch_inputs(self, epoch: int):
        perms = np.stack([
            epoch_permutation(self.n, self.cfg.batch_size, seed, epoch)
            for seed in self.seeds
        ])
        keys = jax.vmap(jax.random.key)(
            jnp.asarray([s + 7919 * epoch for s in self.seeds], jnp.uint32)
        )
        return (
            jax.device_put(perms, self._shard),
            jax.device_put(keys, self._shard),
        )

    def train_epoch(self, epoch: int) -> list[dict]:
        """One vmapped epoch for every subject; returns one metrics row per
        subject (same keys as ``ContrastiveTrainer.train_epoch``)."""
        t0 = time.perf_counter()
        perms, keys = self._epoch_inputs(epoch)
        self.state, metrics = self._epoch(self.state, self.data, perms, keys)
        metrics = jax.device_get(metrics)  # leaves: (S,)
        dt = time.perf_counter() - t0
        n_samples = perms.shape[1] * perms.shape[2]  # per subject
        return [
            {
                **{k: float(v[i]) for k, v in metrics.items()},
                "epoch_time_s": dt,
                # aggregate rate: S subjects trained in the SAME wall window
                "samples_per_s": self.n_subjects * n_samples / dt,
            }
            for i in range(self.n_subjects)
        ]

    def evaluate(self, i: int, epoch: int = 0) -> dict:
        """Lane ``i``'s k-way table — identical protocol (and evaluator
        keys) to ``ContrastiveTrainer.evaluate``."""
        st = self.subject_state(i)
        feats, scale = self._eval_feats(
            st.params, st.batch_stats, self.test_eeg[i], self.test_sids[i]
        )
        out = retrieval_eval(
            feats, self.test_class_img[i], self.test_labels[i], scale,
            ks=self.cfg.eval_ks,
            key=jax.random.key(self.seeds[i] + 104729 * epoch),
        )
        return {k: float(v) for k, v in out.items()}

    def fit(self, epochs: int | None = None, log_fn=print) -> list[list[dict]]:
        """Run the full sweep; returns per-subject history lists (one row
        per epoch, same schema as the sequential trainer's history)."""
        import math

        epochs = epochs or self.cfg.epochs
        for epoch in range(epochs):
            rows = self.train_epoch(epoch)
            for i, row in enumerate(rows):
                if not math.isfinite(row["loss"]):
                    raise FloatingPointError(
                        f"non-finite loss {row['loss']} in subject lane {i} "
                        f"at epoch {epoch}"
                    )
                self.history[i].append(
                    {"epoch": epoch, **row, **self.evaluate(i, epoch)}
                )
            if log_fn:
                losses = " ".join(f"{r['loss']:.4f}" for r in rows)
                log_fn(
                    f"epoch {epoch}: per-subject losses [{losses}] "
                    f"({rows[0]['samples_per_s']:.0f} samples/s aggregate)"
                )
        return self.history
