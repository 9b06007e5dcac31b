"""End-to-end contrastive training on synthetic THINGS-EEG-shaped data —
the integration layer of the test pyramid (SURVEY.md §4): data → model →
loss → scan-epoch → eval, on CPU and on the 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import ATMSConfig, ContrastiveTrainConfig
from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train import ContrastiveTrainer


T_SMALL = 64  # reduced time axis keeps CPU compiles fast


def _small_data():
    return make_synthetic_retrieval_data(
        n_classes=16, images_per_class=4, train_reps=2, n_timepoints=T_SMALL,
        clip_dim=64, snr=2.0,
    )


def _small_nice():
    return build_encoder(
        "nice", proj_dim=64, temporal_kernel=9, pool_size=16, pool_stride=4
    )


def _small_atms_cfg(**kw):
    return ATMSConfig(
        seq_len=T_SMALL, d_model=T_SMALL, temporal_kernel=9, pool_size=16,
        pool_stride=4, proj_dim=64, **kw,
    )


def test_nice_learns_above_chance():
    train, test = _small_data()
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=32, epochs=4, lr=1e-3,
        eval_ks=(2, 4, 16), seed=0,
    )
    trainer = ContrastiveTrainer(_small_nice(), cfg, train, test)
    history = trainer.fit(log_fn=None)
    final = history[-1]
    # chance for 16-way is 1/16 = 0.0625; synthetic SNR makes this easy
    assert final["top1_k16"] > 0.3, final
    assert final["loss"] < history[0]["loss"]


def test_atms_learns_above_chance():
    train, test = _small_data()
    cfg = ContrastiveTrainConfig(
        encoder="atms", batch_size=32, epochs=3, lr=1e-3,
        eval_ks=(2, 16), seed=0,
    )
    model = build_encoder("atms", config=_small_atms_cfg())
    trainer = ContrastiveTrainer(model, cfg, train, test)
    history = trainer.fit(log_fn=None)
    assert history[-1]["top1_k16"] > 0.25, history[-1]
    assert history[-1]["top1_k2"] > 0.6, history[-1]


def test_training_on_mesh_matches_single_device(mesh8):
    """The same training run on the 8-device mesh and on one device must
    produce (numerically close) identical parameters: GSPMD data parallelism
    is semantics-preserving, unlike reference DDP which changes the loss with
    world size."""
    train, test = _small_data()
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=32, epochs=1, lr=1e-3, eval_ks=(16,), seed=3,
    )
    model = _small_nice()

    t1 = ContrastiveTrainer(model, cfg, train, test)
    t1.fit(log_fn=None)
    t8 = ContrastiveTrainer(model, cfg, train, test, mesh=mesh8)
    t8.fit(log_fn=None)

    p1 = jax.device_get(t1.state.params)
    p8 = jax.device_get(t8.state.params)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_recon_loss_variant_trains():
    train, test = _small_data()
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=32, epochs=2, lr=1e-3, recon_loss=True,
        eval_ks=(16,), seed=1,
    )
    model = _small_nice()
    trainer = ContrastiveTrainer(model, cfg, train, test)
    history = trainer.fit(log_fn=None)
    assert history[-1]["loss"] < history[0]["loss"]


def test_metrics_csv_written(tmp_path):
    train, test = _small_data()
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=32, epochs=1, eval_ks=(16,), seed=2,
    )
    model = _small_nice()
    trainer = ContrastiveTrainer(
        model, cfg, train, test, output_dir=str(tmp_path)
    )
    trainer.fit(log_fn=None)
    csv_path = tmp_path / "results.csv"
    assert csv_path.exists()
    header = csv_path.read_text().splitlines()[0]
    assert "loss" in header and "top1_k16" in header


def test_pallas_kernel_under_gspmd_mesh_matches_single_device(mesh8):
    """The fused Pallas tsconv inside a GSPMD batch-sharded train step must be
    semantics-preserving — same trained params as the single-device run."""
    train, test = _small_data()
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=32, epochs=1, lr=1e-3, eval_ks=(16,), seed=5,
    )
    model = build_encoder(
        "nice", proj_dim=64, temporal_kernel=9, pool_size=16, pool_stride=4,
        fused_tsconv=True,
    )
    t1 = ContrastiveTrainer(model, cfg, train, test)
    t1.fit(log_fn=None)
    t8 = ContrastiveTrainer(model, cfg, train, test, mesh=mesh8)
    t8.fit(log_fn=None)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t1.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(t8.state.params)),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_fit_aborts_on_nonfinite_loss():
    """The reference's finite-loss guard (models/util.py:92-94): a diverging
    run must raise instead of checkpointing poisoned state."""
    import pytest

    from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig
    from eeg_image_decode_tpu.data import make_synthetic_retrieval_data
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train import ContrastiveTrainer

    train, test = make_synthetic_retrieval_data(
        n_classes=8, images_per_class=2, train_reps=2, clip_dim=32,
        n_timepoints=64,
    )
    cfg = ContrastiveTrainConfig(
        encoder="nice", batch_size=16, epochs=4, lr=1e30, eval_ks=(2,),
    )
    trainer = ContrastiveTrainer(
        build_encoder("nice", proj_dim=32, temporal_kernel=9, pool_size=16,
                      pool_stride=4),
        cfg, train, test,
    )
    with pytest.raises(FloatingPointError, match="non-finite"):
        trainer.fit(log_fn=None)


def test_streaming_trainer_matches_resident(rng):
    """The streaming (host-EEG + native-gather loader) trainer must produce
    the same trajectory as the HBM-resident scan trainer: identical batch
    permutations ((seed, epoch)-derived), identical dropout keys (fold_in on
    state.step), identical math."""
    from eeg_image_decode_tpu.core.config import ATMSConfig
    from eeg_image_decode_tpu.models import build_encoder

    train, test = make_synthetic_retrieval_data(
        n_classes=8, images_per_class=2, train_reps=2, n_timepoints=64,
        clip_dim=32,
    )
    cfg = ContrastiveTrainConfig(
        batch_size=16, epochs=3, lr=1e-3, eval_ks=(8,), seed=11
    )

    def make(streaming):
        model = build_encoder(
            "atms",
            config=ATMSConfig(seq_len=64, d_model=64, pool_size=16,
                              pool_stride=4, temporal_kernel=9, proj_dim=32),
        )
        return ContrastiveTrainer(
            model, cfg, train, test, streaming=streaming
        )

    resident = make(False)
    h_r = resident.fit(log_fn=None)
    streaming = make(True)
    h_s = streaming.fit(log_fn=None)
    streaming.loader.close()

    # losses/accuracy pin the semantics (identical batches, keys, math);
    # element-exact params are NOT expected — the scan-epoch and per-step
    # programs compile differently, and Adam's early steps are ~sign(g)·lr,
    # so fp32 rounding differences turn into lr-scale param deltas
    for a, b in zip(h_r, h_s):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)
        np.testing.assert_allclose(a["train_acc"], b["train_acc"], atol=1e-6)
    n_steps = 3 * (train.n // cfg.batch_size)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(resident.state.params),
        jax.tree_util.tree_leaves(streaming.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb),
            atol=2 * n_steps * cfg.lr, rtol=0.5,
        )


def test_streaming_bf16_host_dtype_matches_resident(rng):
    """host_dtype='bfloat16' halves the wire bytes; the trajectory must stay
    within bf16 input-rounding noise of the resident fp32 path (identical
    permutations/keys, only the EEG is quantized to bf16 on the host)."""
    import ml_dtypes

    from eeg_image_decode_tpu.core.config import ATMSConfig
    from eeg_image_decode_tpu.models import build_encoder

    train, test = make_synthetic_retrieval_data(
        n_classes=8, images_per_class=2, train_reps=2, n_timepoints=64,
        clip_dim=32,
    )

    def make(streaming, host_dtype=None):
        cfg = ContrastiveTrainConfig(
            batch_size=16, epochs=3, lr=1e-3, eval_ks=(8,), seed=11,
            host_dtype=host_dtype,
        )
        model = build_encoder(
            "atms",
            config=ATMSConfig(seq_len=64, d_model=64, pool_size=16,
                              pool_stride=4, temporal_kernel=9, proj_dim=32),
        )
        return ContrastiveTrainer(model, cfg, train, test,
                                  streaming=streaming)

    resident = make(False)
    h_r = resident.fit(log_fn=None)
    bf16 = make(True, host_dtype="bfloat16")
    # the loader really stores bf16 (half the gather/transfer bytes)
    assert bf16.loader.arrays["eeg"].dtype == np.dtype(ml_dtypes.bfloat16)
    assert bf16.loader.arrays["labels"].dtype == np.int32  # ints untouched
    h_b = bf16.fit(log_fn=None)
    bf16.loader.close()

    for a, b in zip(h_r, h_b):
        # bf16 has ~3 decimal digits; trajectories agree to ~1%
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=2e-2)
        assert abs(a["train_acc"] - b["train_acc"]) <= 0.15
    # both converge on the synthetic task
    assert h_b[-1]["loss"] < h_b[0]["loss"]


def test_streaming_trainer_on_mesh(mesh8):
    """Streaming mode composes with dp sharding: batches arrive batch-sharded
    from the loader and the loss trajectory falls."""
    from eeg_image_decode_tpu.core.config import ATMSConfig
    from eeg_image_decode_tpu.models import build_encoder

    train, test = make_synthetic_retrieval_data(
        n_classes=8, images_per_class=2, train_reps=2, n_timepoints=64,
        clip_dim=32,
    )
    cfg = ContrastiveTrainConfig(
        batch_size=16, epochs=3, lr=1e-3, eval_ks=(8,), seed=2
    )
    model = build_encoder(
        "atms",
        config=ATMSConfig(seq_len=64, d_model=64, pool_size=16,
                          pool_stride=4, temporal_kernel=9, proj_dim=32),
    )
    tr = ContrastiveTrainer(model, cfg, train, test, mesh=mesh8,
                            streaming=True)
    h = tr.fit(log_fn=None)
    tr.loader.close()
    assert h[-1]["loss"] < h[0]["loss"]
