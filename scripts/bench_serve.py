"""Serving-path latency: staged (3 dispatches) vs fused (1 dispatch) full
reconstruction through ``ReconstructionService`` at full model sizes.

The fused path jits encoder → prior CFG scan → SDXL-turbo UNet steps → VAE
decode as ONE program per chunk (``serve.py::ReconstructionService``,
``fused=True``); the staged path runs the same three stages as separate
jitted calls. Weights are random at full shapes (latency does not depend on
values). Prints one JSON line per mode:

    {"metric": "serve_reconstruction_latency_<mode>", "value": N,
     "unit": "ms/image", "config": {...}}

Syncs are host readbacks (``np.asarray``) — ``block_until_ready`` can
return early on this harness's remote-device runtime (docs/PERF.md).

Run: python scripts/bench_serve.py [staged|fused]   (default: both)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 8


def main(mode: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from eeg_image_decode_tpu.utils.backend import wait_for_backend

    wait_for_backend()

    from eeg_image_decode_tpu.core.config import (
        ATMSConfig,
        ContrastiveTrainConfig,
        PriorConfig,
    )
    from eeg_image_decode_tpu.gen.sdxl import Generator4Embeds, GeneratorConfig
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.serve import ReconstructionService
    from eeg_image_decode_tpu.train.contrastive import create_train_state
    from eeg_image_decode_tpu.train.prior import PriorPipe

    rng = np.random.default_rng(0)
    eeg = rng.normal(size=(BATCH, 63, 250)).astype(np.float32)
    sids = np.ones((BATCH,), np.int32)

    model = build_encoder("atms", config=ATMSConfig(), dtype=jnp.bfloat16)
    state, _ = create_train_state(
        model, ContrastiveTrainConfig(), jnp.asarray(eeg[:2]),
        jnp.asarray(sids[:2]),
    )
    prior = PriorPipe(PriorConfig())
    prior.init(total_steps=1)
    gen = Generator4Embeds(GeneratorConfig())
    gen.init_abstract(jax.random.key(0))  # full-size bf16 random weights

    svc = ReconstructionService(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        prior, gen, max_batch=BATCH, fused=(mode == "fused"),
    )

    def run(seed):
        t0 = time.perf_counter()
        imgs = svc.reconstruct(eeg, sids, seed=seed)  # np.asarray inside
        assert imgs.shape[0] == BATCH
        return time.perf_counter() - t0

    run(0)  # compile
    v = min(run(s) for s in range(1, 4))
    print(json.dumps({
        "metric": f"serve_reconstruction_latency_{mode}",
        "value": round(v * 1e3 / BATCH, 1),
        "unit": "ms/image",
        "config": {"batch": BATCH, "prior_steps": 50, "sdxl_steps": 4,
                   "resolution": 512,
                   "dispatches_per_chunk": 1 if mode == "fused" else 3},
    }), flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["staged", "fused"]
    if len(modes) > 1:
        # subprocess-isolate the rows (leftover HBM/dispatch state skews
        # same-process measurements — docs/PERF.md)
        import subprocess

        for m in modes:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), m], check=False
            )
    else:
        main(modes[0])
