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


def load_bench() -> None:
    """Concurrent-clients load test through the real HTTP daemon.

    Measures the device-lock serialization claim (serve.py: one device, all
    requests serialized at the lock): C in-flight clients hammer
    ``POST /v1/retrieve`` (full-size ATM-S encoder + a 16540-image HBM
    gallery — the reference-scale retrieval workload) with .npz bodies of 8
    EEG epochs each; reports per-request p50/p99 latency and aggregate
    throughput at C ∈ {1, 2, 8, 32}. Expected shape of the result: p50
    grows ~linearly with C (lock serialization) while aggregate throughput
    stays ~flat at the single-request service rate — if throughput *drops*
    with C, the lock is amplifying overhead and that is a bug.
    """
    import io
    import threading
    import urllib.request

    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    from eeg_image_decode_tpu.utils.backend import wait_for_backend

    wait_for_backend()

    from eeg_image_decode_tpu.core.config import (
        ATMSConfig,
        ContrastiveTrainConfig,
    )
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.serve import RetrievalService
    from eeg_image_decode_tpu.server import EEGDecodeServer
    from eeg_image_decode_tpu.train.contrastive import create_train_state

    rng = np.random.default_rng(0)
    req_b = 8
    eeg = rng.normal(size=(req_b, 63, 250)).astype(np.float32)
    sids = np.ones((req_b,), np.int32)

    model = build_encoder("atms", config=ATMSConfig(), dtype=jnp.bfloat16)
    state, _ = create_train_state(
        model, ContrastiveTrainConfig(), jnp.asarray(eeg[:2]),
        jnp.asarray(sids[:2]),
    )
    gallery = rng.normal(size=(16540, 1024)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    # max_batch 256 = the coalescing window: the server merges the queued
    # backlog into one padded dispatch, so a 32-client burst (256 rows)
    # rides ONE compiled call instead of 32 (round 4's p50 ≈ C × 78 ms came
    # from per-request dispatches under the lock). A single 8-row request
    # pads to 256 — padding FLOPs are noise next to dispatch+readback
    # through the remote-device tunnel.
    svc = RetrievalService(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        gallery, max_batch=256,
        # the coalesced dispatch is transfer-bound on this host (342 of
        # 375 ms is the 16 MB fp32 copy); fp16 wire halves it — the same
        # flag `cli serve --transfer-dtype float16` exposes
        transfer_dtype="float16",
    )
    # compile ALL bucket shapes BEFORE the HTTP phase (what `cli serve`
    # does at startup): the first full-size compile through this machine's
    # remote compile helper takes 40-600 s (docs/PERF.md) and a cold bucket
    # hit by a coalesced burst measured as a 14.5 s p99 outlier
    svc.warmup((63, 250), ks=(5,))

    server = EEGDecodeServer(retrieval=svc)
    port = server.start()
    url = f"http://127.0.0.1:{port}/v1/retrieve"

    buf = io.BytesIO()
    np.savez(buf, eeg=eeg, subject_ids=sids, k=np.int32(5))
    body = buf.getvalue()

    def one_request():
        t0 = time.perf_counter()
        req = urllib.request.Request(
            url, data=body,
            headers={"Content-Type": "application/octet-stream"}
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            r.read()
        return time.perf_counter() - t0

    for _ in range(3):
        one_request()  # compile + warm the HTTP path

    try:
        for clients in (1, 2, 8, 32):
            n_total = max(64, clients * 8)
            lat: list[float] = []
            errors: list[str] = []
            lock = threading.Lock()
            counter = iter(range(n_total))

            def worker():
                while True:
                    with lock:
                        if next(counter, None) is None:
                            return
                    try:
                        dt = one_request()
                    except Exception as e:  # keep draining; report at end
                        with lock:
                            errors.append(f"{type(e).__name__}: {e}")
                        continue
                    with lock:
                        lat.append(dt)

            t0 = time.perf_counter()
            threads = [
                threading.Thread(target=worker) for _ in range(clients)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            if not lat:
                print(json.dumps({
                    "metric": "serve_retrieval_load",
                    "error": f"all {n_total} requests failed; first: "
                             f"{errors[0] if errors else '?'}",
                    "config": {"in_flight_clients": clients},
                }), flush=True)
                continue
            lat_ms = np.sort(np.asarray(lat)) * 1e3
            print(json.dumps({
                "metric": "serve_retrieval_load",
                "value": round(float(np.percentile(lat_ms, 50)), 1),
                "unit": "ms_p50_per_request",
                "config": {
                    "in_flight_clients": clients,
                    "request_batch": req_b,
                    "gallery": 16540,
                    "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
                    # completed/wall — honest when some requests errored
                    "throughput_req_s": round(len(lat) / wall, 1),
                    "n_requests": n_total,
                    "n_failed": len(errors),
                },
            }), flush=True)
    finally:
        server.stop()


if __name__ == "__main__":
    modes = sys.argv[1:] or ["staged", "fused"]
    if modes == ["load"]:
        load_bench()
        sys.exit(0)
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
