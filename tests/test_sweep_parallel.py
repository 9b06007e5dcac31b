"""Subject-parallel sweep (train/sweep.py): N independent per-subject
training runs executed as ONE vmapped, subject-sharded program.

Reference protocol being parallelized: the per-subject main loop of
``Retrieval/ATMS_retrieval.py:516-586`` (10 independent sequential runs).

Correctness is pinned two ways:
- **Lane independence, bit-exact**: within one compiled program, a lane's
  results must not depend on what the other lanes train on (the property
  that actually breaks if anything couples subjects — the loss, BN, or a
  miscompiled grouped conv).
- **Sequential equivalence, fp-band**: lane i ≈ the sequential
  ``ContrastiveTrainer`` run on subject i. These are two *different
  compiled programs*, so fp-level grad noise passes through Adam's
  scale-free updates (sign-sized steps on near-zero grads) — the same
  drift mechanism documented for the torch↔jax bands in docs/PARITY.md —
  hence loss-level tolerance, not bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import ATMSConfig, ContrastiveTrainConfig
from eeg_image_decode_tpu.core.mesh import create_mesh
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train.contrastive import ContrastiveTrainer
from eeg_image_decode_tpu.train.sweep import SubjectParallelSweep

TINY = dict(n_classes=6, images_per_class=2, train_reps=2,
            n_timepoints=64, clip_dim=32)


def _tiny_model():
    return build_encoder(
        "atms",
        config=ATMSConfig(seq_len=64, d_model=64, pool_size=16,
                          pool_stride=4, temporal_kernel=9, proj_dim=32),
    )


def _cfg(**kw):
    return ContrastiveTrainConfig(
        batch_size=8, epochs=2, eval_ks=(2, 6), seed=3, **kw
    )


@pytest.fixture(scope="module")
def mesh2():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    return create_mesh(data_parallel=2, devices=devs[:2])


def _subject_splits(n_subjects):
    return [
        make_synthetic_retrieval_data(seed=100 + i, subject_id=i + 1, **TINY)
        for i in range(n_subjects)
    ]


def _sweep(mesh, splits):
    return SubjectParallelSweep(
        _tiny_model(), _cfg(),
        [tr for tr, _ in splits], [te for _, te in splits],
        mesh=mesh,
    )


def test_lanes_are_independent_bit_exact(mesh2):
    """Changing lane 1's subject must not change lane 0's results AT ALL —
    same compiled program, so any cross-lane coupling (loss, BN stats, a
    miscompiled grouped conv) shows up as a bit difference here."""
    d0, d1 = _subject_splits(2)
    ref = _sweep(mesh2, [d0, d0])
    ref_hist = ref.fit(epochs=2, log_fn=None)
    # identical lanes → identical results (sanity on the stacking itself)
    for e in range(2):
        assert ref_hist[0][e]["loss"] == ref_hist[1][e]["loss"]

    mixed = _sweep(mesh2, [d0, d1])
    mixed_hist = mixed.fit(epochs=2, log_fn=None)
    for e in range(2):
        assert mixed_hist[0][e]["loss"] == ref_hist[0][e]["loss"], e
        assert mixed_hist[0][e]["train_acc"] == ref_hist[0][e]["train_acc"]
    a = jax.device_get(mixed.subject_state(0))
    b = jax.device_get(ref.subject_state(0))
    for pa, leaf in jax.tree_util.tree_leaves_with_path(a.params):
        np.testing.assert_array_equal(
            leaf, dict(jax.tree_util.tree_leaves_with_path(b.params))[pa],
            err_msg=str(pa),
        )
    # and lane 1 actually trained on different data
    assert mixed_hist[1][0]["loss"] != ref_hist[1][0]["loss"]


def test_parallel_sweep_matches_sequential_runs(mesh2):
    splits = _subject_splits(2)
    sweep = _sweep(mesh2, splits)
    hist = sweep.fit(epochs=2, log_fn=None)

    for i, (train, test) in enumerate(splits):
        trainer = ContrastiveTrainer(_tiny_model(), _cfg(), train, test)
        seq_hist = trainer.fit(epochs=2, log_fn=None)
        for e in range(2):
            # different compiled programs: fp-noise → Adam sign-steps →
            # sub-percent loss drift is expected, anything larger is a bug
            assert hist[i][e]["loss"] == pytest.approx(
                seq_hist[e]["loss"], rel=2e-2
            ), (i, e)
        # final models agree functionally: same eval-feature geometry
        par = sweep.evaluate(i, epoch=1)
        seq = trainer.evaluate(epoch=1)
        for k in par:
            assert par[k] == pytest.approx(seq[k], abs=0.25), (i, k)


def test_parallel_sweep_is_sharded_with_no_collectives(mesh2):
    splits = _subject_splits(2)
    sweep = _sweep(mesh2, splits)
    # each device owns exactly one subject's arrays
    shards = sweep.data.eeg.addressable_shards
    assert len(shards) == 2
    assert shards[0].data.shape[0] == 1
    # independent runs → NOTHING may cross devices in the compiled epoch
    perms, keys = sweep._epoch_inputs(0)
    txt = (
        sweep._epoch.lower(sweep.state, sweep.data, perms, keys)
        .compile().as_text()
    )
    for coll in ("all-reduce", "all-gather", "collective-permute",
                 "reduce-scatter", "all-to-all"):
        assert coll not in txt, coll


def test_parallel_sweep_validates_inputs(mesh2):
    splits = _subject_splits(3)
    with pytest.raises(ValueError, match="divide"):
        _sweep(mesh2, splits)
    small = make_synthetic_retrieval_data(
        seed=1, subject_id=1, n_classes=4, images_per_class=2,
        train_reps=2, n_timepoints=64, clip_dim=32,
    )
    with pytest.raises(ValueError, match="differ"):
        _sweep(mesh2, [splits[0], small])
