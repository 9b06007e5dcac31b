"""A/B the projection head on the flagship bench workload.

False = the XLA chain (exact-erf GELU, flax-equivalent LN — models/layers.py
::ProjectionHead); True = the fused Pallas kernel (ops/projection.py, both
directions VMEM-resident, in-kernel PRNG dropout, tanh GELU). Numerics are
parity-tested (tests/test_ops_projection.py); this measures which one the
chip prefers on the training step. Result recorded in docs/PERF.md and the
'auto' resolution in models/layers.py.

Run one variant per process (A/B drift: same-process sequential rows warm
up ~5%; interleave ≥3 isolated pairs before concluding):

    for v in false true false true false true; do
        python scripts/bench_projection.py $v; done
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_default_prng_impl", "rbg")

from eeg_image_decode_tpu.utils.backend import wait_for_backend  # noqa: E402

wait_for_backend()

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


def run(fused: bool, data) -> float:
    cfg = ContrastiveTrainConfig(encoder="atms", batch_size=B.BATCH)
    model = build_encoder(
        "atms", config=ATMSConfig(fused_projection=fused), dtype=jnp.bfloat16
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
        float(metrics["loss"])  # host readback = reliable device sync
        return state, time.perf_counter() - t0

    state, _ = epoch(state, 0)  # compile
    times = []
    for e in (1, 2, 3):
        state, dt = epoch(state, e)
        times.append(dt)
    return n_steps * B.BATCH / min(times)


def main():
    fused = (sys.argv[1].lower() in ("1", "true", "fused")
             if len(sys.argv) > 1 else False)
    data = B._device_synthetic_data()
    rate = run(fused, data)
    print(f"fused_projection={fused}: {rate:,.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
