"""A/B the stage-1 BatchNorm implementation on the flagship bench workload.

'flax' = nn.BatchNorm (reduction passes over the (B·C, P·F) activation);
'gram' = GramStage1BN (batch stats from the stage-1 matmul inputs via the
Gram trick — models/layers.py). Numerics are parity-tested
(tests/test_models.py::test_gram_stage1_bn_matches_flax_batchnorm); this
script measures which one the chip prefers. Result recorded in docs/PERF.md.

Run: python scripts/bench_bn_gram.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp  # noqa: E402

import bench as B  # noqa: E402
from eeg_image_decode_tpu.core.config import (  # noqa: E402
    ATMSConfig,
    ContrastiveTrainConfig,
)
from eeg_image_decode_tpu.models import build_encoder  # noqa: E402
from eeg_image_decode_tpu.train.contrastive import (  # noqa: E402
    create_train_state,
    make_epoch_fn,
)


def run(bn1: str, data) -> float:
    cfg = ContrastiveTrainConfig(encoder="atms", batch_size=B.BATCH)
    model = build_encoder(
        "atms", config=ATMSConfig(tsconv_bn1=bn1), dtype=jnp.bfloat16
    )
    n = int(data.eeg.shape[0])
    state, tx = create_train_state(
        model, cfg, data.eeg[:2], data.subject_ids[:2]
    )
    epoch_fn = make_epoch_fn(model, tx, cfg)
    n_steps = n // B.BATCH
    perm_key = jax.random.key(1)

    def epoch(state, e):
        perm = jax.random.permutation(jax.random.fold_in(perm_key, e), n)[
            : n_steps * B.BATCH
        ].reshape(n_steps, B.BATCH).astype(jnp.int32)
        t0 = time.perf_counter()
        state, metrics = epoch_fn(state, data, perm, jax.random.key(e))
        float(metrics["loss"])
        return state, time.perf_counter() - t0

    state, _ = epoch(state, 0)  # compile
    times = []
    for e in (1, 2, 3):
        state, dt = epoch(state, e)
        times.append(dt)
    return n_steps * B.BATCH / min(times)


def main():
    data = B._device_synthetic_data()
    for bn1 in ("flax", "gram", "flax"):  # repeat control to bound drift
        rate = run(bn1, data)
        print(f"bn1={bn1}: {rate:,.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
