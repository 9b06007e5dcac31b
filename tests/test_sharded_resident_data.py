"""dp-sharded device-resident dataset mode (``shard_samples=True``).

The TPU-native answer to datasets beyond one chip's HBM (SURVEY §2.2 DP row;
all-10-subject joint training ≈ 42 GB fp32 → ~5 GB/chip on a v5e-8): the
per-sample arrays shard over the dp axis, batches compose shard-locally, and
the InfoNCE loss still sees the global batch through its embedding
all-gather.

Pinned here on the virtual 8-device CPU mesh:

1. **Exact math equivalence**: a sharded-mode epoch whose shard-local perm
   addresses the same global rows (in the same order) as a replicated-mode
   epoch produces the same losses and the same trained params — the mode
   changes residency, not semantics.
2. **Memory layout**: every device holds exactly N/dp sample rows (the whole
   point), while the feature tables stay replicated.
3. **Trainer integration**: ``ContrastiveTrainer(shard_samples=True)``
   trains end-to-end and its loss falls on the learnable synthetic set.
4. Fail-fast on misuse (no mesh, non-divisible N, streaming conflict).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import (
    ATMSConfig,
    ContrastiveTrainConfig,
)
from eeg_image_decode_tpu.core.mesh import create_mesh
from eeg_image_decode_tpu.data.synthetic import make_synthetic_retrieval_data
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train.contrastive import (
    ContrastiveTrainer,
    DeviceData,
    create_train_state,
    make_epoch_fn,
    sharded_epoch_perm,
)

DP, BS = 8, 16


@pytest.fixture(scope="module")
def setup():
    train, test = make_synthetic_retrieval_data(
        n_classes=16, images_per_class=1, train_reps=2, seed=11
    )
    assert train.n % DP == 0
    mesh = create_mesh(data_parallel=DP)
    cfg = ContrastiveTrainConfig(batch_size=BS, epochs=2, eval_ks=(2,))
    model = build_encoder(
        "atms",
        config=ATMSConfig(dropout=0.0, conv_dropout=0.0, proj_dropout=0.0),
    )
    return train, test, mesh, cfg, model


def test_sharded_epoch_matches_replicated_exactly(setup):
    train, _test, mesh, cfg, model = setup
    n = train.n
    n_local = n // DP

    state0, tx = create_train_state(
        model, cfg, jnp.asarray(train.eeg[:2]),
        jnp.asarray(train.subject_ids[:2]),
    )

    perm_s = sharded_epoch_perm(n, BS, DP, seed=5, epoch=0)
    # the same global rows in the same batch positions, for replicated mode:
    # column block d holds local indices into shard d = rows [d*n_local, ...)
    b_local = BS // DP
    perm_g = perm_s.copy()
    for d in range(DP):
        perm_g[:, d * b_local:(d + 1) * b_local] += d * n_local

    def run(shard: bool, perm):
        data = DeviceData.from_host(train, mesh, shard_samples=shard)
        fn = make_epoch_fn(model, tx, cfg, mesh=mesh, shard_samples=shard)
        state = jax.device_get(state0)  # fresh copy (donated buffers)
        state = jax.tree_util.tree_map(jnp.asarray, state)
        state, metrics = fn(state, data, jnp.asarray(perm), jax.random.key(0))
        return jax.device_get(state), jax.device_get(metrics)

    st_r, m_r = run(False, perm_g)
    st_s, m_s = run(True, perm_s)

    np.testing.assert_allclose(m_s["loss"], m_r["loss"], rtol=1e-6)
    np.testing.assert_allclose(m_s["train_acc"], m_r["train_acc"], rtol=1e-6)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(st_s.params)[0],
        jax.tree_util.tree_flatten_with_path(st_r.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5,
            err_msg=str(path),
        )


def test_per_device_memory_is_n_over_dp(setup):
    train, _test, mesh, _cfg, _model = setup
    data = DeviceData.from_host(train, mesh, shard_samples=True)
    n_local = train.n // DP
    shards = data.eeg.addressable_shards
    assert len({s.device for s in shards}) == DP
    for s in shards:
        assert s.data.shape[0] == n_local  # genuinely N/dp per device
    # feature tables replicate (full copy everywhere)
    for s in data.img_feat.addressable_shards:
        assert s.data.shape == data.img_feat.shape


def test_trainer_integration_loss_falls(setup, tmp_path):
    train, test, mesh, cfg, model = setup
    tr = ContrastiveTrainer(
        model, cfg, train, test, mesh=mesh, shard_samples=True,
    )
    hist = tr.fit(epochs=2, log_fn=None)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_misuse_fails_fast(setup):
    train, test, mesh, cfg, model = setup
    with pytest.raises(ValueError, match="requires a mesh"):
        DeviceData.from_host(train, None, shard_samples=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        ContrastiveTrainer(
            model, cfg, train, test, mesh=mesh,
            streaming=True, shard_samples=True,
        )
    bad = make_synthetic_retrieval_data(
        n_classes=9, images_per_class=1, train_reps=1, seed=0
    )[0]
    assert bad.n % DP != 0
    with pytest.raises(ValueError, match="divisible"):
        DeviceData.from_host(bad, mesh, shard_samples=True)
