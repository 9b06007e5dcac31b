"""Multi-config benchmark: one BENCH-style JSON line per configuration.

Complements the driver's ``bench.py`` (flagship ATM-S bs1024) with the other
reference configurations VERDICT round 1 asked for:

- ``joint``: joint-subjects training (``ATMS_retrieval_joint_train.py``
  semantics — subject tokens + per-subject value embeddings active),
  batch 16, two subjects' full splits resident in HBM
- ``bs64``: in-subject ATM-S at batch 64 (the graft-entry shape)
- ``eval``: encoder feature-extraction throughput (the export path feeding
  the diffusion prior)

Each line: {"metric", "value", "unit", "config"} — measured on whatever
jax.devices()[0] is (the real v5e chip under axon).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _data(n_classes, ipc, reps, n_subjects=1, d=1024, c=63, t=250):
    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.train.contrastive import DeviceData

    n = n_classes * ipc * reps * n_subjects
    ks = jax.random.split(jax.random.key(0), 3)
    img = jax.random.normal(ks[1], (n_classes * ipc, d), jnp.float32)
    img = img / jnp.linalg.norm(img, axis=1, keepdims=True)
    local = jnp.arange(n, dtype=jnp.int32) % (n_classes * ipc * reps)
    return DeviceData(
        eeg=jax.random.normal(ks[0], (n, c, t), jnp.float32),
        labels=local // (ipc * reps),
        subject_ids=(jnp.arange(n, dtype=jnp.int32)
                     // (n_classes * ipc * reps)) + 1,
        img_feat=img,
        text_feat=jax.random.normal(ks[2], (n_classes, d), jnp.float32),
        img_idx=local // reps,
        text_idx=local // (ipc * reps),
        class_img_feat=img[::ipc],
    )


def _bench_train(config_name, *, batch, joint, n_subjects, n_classes=1654,
                 epochs=2):
    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.config import (
        ATMSConfig,
        ContrastiveTrainConfig,
    )
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train.contrastive import (
        create_train_state,
        make_epoch_fn,
    )

    cfg = ContrastiveTrainConfig(encoder="atms", batch_size=batch)
    model = build_encoder("atms", config=ATMSConfig(joint_train=joint),
                          dtype=jnp.bfloat16)
    data = _data(n_classes, 10, 4, n_subjects=n_subjects)
    n = int(data.eeg.shape[0])
    state, tx = create_train_state(model, cfg, data.eeg[:2],
                                   data.subject_ids[:2])
    epoch_fn = make_epoch_fn(model, tx, cfg)
    n_steps = n // batch

    def run(state, epoch):
        perm = jax.random.permutation(
            jax.random.fold_in(jax.random.key(1), epoch), n
        )[: n_steps * batch].reshape(n_steps, batch).astype(jnp.int32)
        t0 = time.perf_counter()
        state, metrics = epoch_fn(state, data, perm, jax.random.key(epoch))
        float(metrics["loss"])
        return state, time.perf_counter() - t0

    state, _ = run(state, 0)  # compile
    times = []
    for e in range(1, epochs + 1):
        state, dt = run(state, e)
        times.append(dt)
    print(json.dumps({
        "metric": f"atms_train_throughput_{config_name}",
        "value": round(n_steps * batch / min(times), 1),
        "unit": "samples/s",
        "config": {"batch": batch, "joint": joint,
                   "n_samples": n, "subjects": n_subjects},
    }))


def _bench_eval():
    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.config import ATMSConfig
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train.contrastive import (
        create_train_state,
        make_eval_features_fn,
    )
    from eeg_image_decode_tpu.core.config import ContrastiveTrainConfig

    model = build_encoder("atms", config=ATMSConfig(), dtype=jnp.bfloat16)
    eeg = jax.random.normal(jax.random.key(0), (66160, 63, 250), jnp.float32)
    sids = jnp.ones((66160,), jnp.int32)
    state, _ = create_train_state(
        model, ContrastiveTrainConfig(), eeg[:2], sids[:2]
    )
    fn = make_eval_features_fn(model)
    # All chunks inside ONE jitted scan + a host checksum readback: with
    # several async dispatches in flight, ``jax.block_until_ready`` on the
    # last future can return before the queued work finishes on this
    # machine's remote-device runtime (measured: 10 queued full-size UNet
    # forwards "completed" in 16 ms wall vs 168 ms of traced device time),
    # which once inflated this row to a physically impossible 4.95M
    # samples/s. A scan is one dispatch; ``float()`` is a real sync.
    n_chunks = 66160 // 2048
    eeg_c = eeg[: n_chunks * 2048].reshape(n_chunks, 2048, 63, 250)
    sids_c = sids[: n_chunks * 2048].reshape(n_chunks, 2048)

    @jax.jit
    def extract_all(params, batch_stats, eeg_c, sids_c):
        def body(_, xs):
            e, s = xs
            f, _stats = fn(params, batch_stats, e, s)
            return None, jnp.sum(f.astype(jnp.float32))
        _, sums = jax.lax.scan(body, None, (eeg_c, sids_c))
        return jnp.sum(sums)

    def run():
        t0 = time.perf_counter()
        float(extract_all(state.params, state.batch_stats, eeg_c, sids_c))
        n = n_chunks * 2048
        return n / (time.perf_counter() - t0)

    run()  # compile
    v = max(run() for _ in range(3))
    print(json.dumps({
        "metric": "atms_eval_feature_throughput",
        "value": round(v, 1),
        "unit": "samples/s",
        "config": {"batch": 2048},
    }))


def _bench_reconstruction(resolution: int = 512):
    """End-to-end EEG-embedding → image latency: full-size diffusion prior
    (50 steps, CFG 5.0, the reference's reconstruction setting) + full-size
    SDXL-turbo UNet ×4 steps + VAE decode, batch 1 — the BASELINE.md
    north-star path (<10 s per reconstruction). ``resolution=1024`` is the
    reference's final recombination output scale
    (``1x1024_reconstruct_sdxl.ipynb``)."""
    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.gen.sdxl import Generator4Embeds, GeneratorConfig
    from eeg_image_decode_tpu.train.prior import PriorPipe

    pipe = PriorPipe(PriorConfig())
    pipe.init(total_steps=1)
    side = resolution // 8  # SDXL VAE pixel factor
    gen = Generator4Embeds(GeneratorConfig(latent_size=(side, side)))
    gen.init_abstract(jax.random.key(0))  # bf16 random weights, full shapes

    def run(batch, i):
        # float() readbacks are real device syncs; block_until_ready can
        # return early with multiple dispatches in flight on this machine's
        # remote-device runtime (see _bench_eval).
        eeg_feat = jax.random.normal(jax.random.key(10 + i),
                                     (batch, 1024), jnp.float32)
        t0 = time.perf_counter()
        h = pipe.generate(eeg_feat, key=jax.random.key(2 + i))
        img = gen.generate(h, key=jax.random.key(3 + i))
        float(jnp.sum(img.astype(jnp.float32)))
        return time.perf_counter() - t0

    run(1, 0)  # compile
    v = min(run(1, i) for i in range(1, 4))
    print(json.dumps({
        "metric": "reconstruction_latency_e2e"
                  + ("" if resolution == 512 else f"_{resolution}"),
        "value": round(v * 1e3, 1),
        "unit": "ms/image",
        "config": {"prior_steps": 50, "cfg": 5.0, "sdxl_steps": 4,
                   "resolution": resolution, "batch": 1},
    }))
    # throughput at the reference's natural serving batch (10 seeds/class,
    # Generation_metrics_sub8.ipynb cell 9): batching amortizes dispatch and
    # fills the MXU at the B=1-starved transformer stacks
    run(8, 4)  # compile batched shapes
    v8 = min(run(8, i) for i in range(5, 8))
    print(json.dumps({
        "metric": "reconstruction_throughput_batched"
                  + ("" if resolution == 512 else f"_{resolution}"),
        "value": round(v8 * 1e3 / 8, 1),
        "unit": "ms/image",
        "config": {"prior_steps": 50, "cfg": 5.0, "sdxl_steps": 4,
                   "resolution": resolution, "batch": 8},
    }))


def _bench_prior():
    """Diffusion-prior training throughput at the reference configuration
    (batch 1024, 66160 pairs — ``Generation_metrics_sub8.ipynb`` cell 8)."""
    import jax
    import numpy as np

    from eeg_image_decode_tpu.core.config import PriorConfig
    from eeg_image_decode_tpu.train.prior import PriorPipe

    rng = np.random.default_rng(0)
    n = 66160
    c = rng.normal(size=(n, 1024)).astype(np.float32)
    h = rng.normal(size=(n, 1024)).astype(np.float32)
    pipe = PriorPipe(PriorConfig(batch_size=1024))
    hist = pipe.train(c, h, epochs=4, log_fn=None)
    best = min(r["epoch_time_s"] for r in hist[1:])  # skip compile epoch
    print(json.dumps({
        "metric": "prior_train_throughput",
        "value": round((n // 1024) * 1024 / best, 1),
        "unit": "samples/s",
        "config": {"batch": 1024, "n_samples": n, "params": "UNet-MLP"},
    }))


BENCHES = {
    "bs1024": lambda: _bench_train("bs1024_insubject", batch=1024,
                                   joint=False, n_subjects=1),
    "prior": _bench_prior,
    "bs64": lambda: _bench_train("bs64_insubject", batch=64, joint=False,
                                 n_subjects=1),
    "joint": lambda: _bench_train("bs16_joint_2subj", batch=16, joint=True,
                                  n_subjects=2),
    # the bs-16 row above is the reference's own default and is
    # latency-bound (docs/PERF.md round-4 attribution); this row tracks the
    # recommended larger-batch joint configuration
    "joint256": lambda: _bench_train("bs256_joint_2subj", batch=256,
                                     joint=True, n_subjects=2),
    "eval": _bench_eval,
    "recon": _bench_reconstruction,
    # the reference's final output stage is 1024^2 SDXL
    # (1x1024_reconstruct_sdxl.ipynb cells 20-27): same chain at 128x128
    # latents so the <10 s north star is evidenced at the real output scale
    "recon1024": lambda: _bench_reconstruction(resolution=1024),
}


def main():
    # Each bench runs in its OWN subprocess: leftover HBM allocations and
    # dispatch-queue state from earlier benches depress later rows measured
    # in-process (the eval row read 326k samples/s after the training
    # benches vs 6.2M standalone).
    if len(sys.argv) > 1:
        import jax

        # persistent compile cache: the full-size SDXL graphs (recon rows,
        # worst at 1024^2) take minutes through the remote compile helper
        # on a cold cache
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_default_prng_impl", "rbg")
        from eeg_image_decode_tpu.utils.backend import wait_for_backend

        wait_for_backend()
        BENCHES[sys.argv[1]]()
        return
    import subprocess

    for name in BENCHES:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            capture_output=True, text=True, timeout=3000,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if proc.returncode != 0:
            print(json.dumps({"metric": name, "error":
                              proc.stderr.strip()[-400:]}), flush=True)


if __name__ == "__main__":
    main()
