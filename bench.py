"""Benchmark: ATM-S contrastive-training throughput on real THINGS-EEG shapes.

Prints one JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The workload is the reference's flagship configuration (SURVEY.md §6 /
BASELINE.md): ATM-S encoder, batch 1024, train set (66160, 63, 250) — i.e.
one subject's full training split — with the 1654-way train-accuracy probe
enabled, exactly what ``Retrieval/ATMS_retrieval.py:199-254`` does per epoch.
Data is synthetic with identical shapes (EEG values don't change FLOPs) and is
generated directly in HBM with the device PRNG, the same whole-dataset-
resident layout the trainer uses on real data.

``vs_baseline`` compares training samples/sec against a DEFENSIBLE BOUND
on the reference implementation's A100 throughput (the reference publishes
no numbers). Provenance of the denominator — derived, not folklore
(``scripts/bench_a100_band.py``, replacing rounds 1-4's "~500× a CPU
anchor" multiplier):

- the reference training step was profiled with ``torch.profiler`` on the
  identical workload twin: **915 dispatched aten ops/step** (each ≥1 CUDA
  launch in eager mode), **205 GFLOP/step** (profiler ``with_flops``), and
  **≈7.5 GB HBM traffic/step** (eager torch materializes the 2.6 GB
  pre-pool temporal-conv map both directions, + 7 param-sized optimizer
  streams);
- A100 step time is bounded below by max(launch, compute, memory) floors:
  launches 915×[3,8] µs, compute 205 GFLOP / [156 TF/s TF32, 19.5 TF/s
  fp32 — torch ≥1.12 defaults TF32 matmul OFF], memory 7.5 GB / [2.0,
  1.55] TB/s → **step ∈ [3.8 ms, 10.5 ms] → 97k–272k samples/s**. The
  binding floor at the fast edge is HBM bandwidth: eager torch here is
  memory-bound at roofline.
- ``vs_baseline`` divides by the band's FAST edge (272k) — the most
  conservative choice: the real reference loop is strictly slower than
  this ideal (two forced ``.item()`` syncs/step, host dataloader, Python
  dispatch gaps that cannot hide behind memory traffic).
- Context for reading the number: a single v5e has 819 GB/s HBM vs the
  A100's 1.55–2.0 TB/s (≈0.41×), so for this memory-bound workload the
  hardware-adjusted ideal ratio is ≈0.41; measured ~0.35 means the TPU
  program runs at ≈85% of what a PERFECT A100 implementation scaled to
  v5e bandwidth could do — while XLA's fusion means our program does NOT
  materialize the 2.6 GB intermediate eager torch pays for.
- MEASURED same-env anchor kept for reproducibility: the torch twin runs
  at **21.2 samples/s** on this host's single CPU core
  (``scripts/bench_torch_baseline.py``).

The JSON row also carries ``mfu_pct`` — model FLOPs (XLA cost analysis of
the compiled epoch) / v5e peak 197 bf16 TFLOP/s. The model is tiny (~0.1
GFLOP/sample), so single-digit MFU is expected: the run is bound by small
kernels and HBM, not the MXU; the value is reported for honesty, not bragging.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# A100 throughput BAND for the reference's eager-torch step (samples/s),
# derived from profiled launches/FLOPs/bytes + A100 rooflines — see the
# docstring and scripts/bench_a100_band.py (emits these numbers as JSON)
A100_BAND_SAMPLES_PER_S = (97_000.0, 272_000.0)
TORCH_CPU_MEASURED_SAMPLES_PER_S = 21.2  # scripts/bench_torch_baseline.py
V5E_PEAK_FLOPS = 197e12  # bf16

N_CLASSES, IPC, REPS = 1654, 10, 4  # → 66160 train samples
BATCH = 1024
C, T, D = 63, 250, 1024


def _device_synthetic_data():
    """Build DeviceData straight in HBM (no 4.2 GB host→device transfer)."""
    import jax
    import jax.numpy as jnp

    from eeg_image_decode_tpu.train.contrastive import DeviceData

    n = N_CLASSES * IPC * REPS
    k = jax.random.key(0)
    ks = jax.random.split(k, 4)
    eeg = jax.random.normal(ks[0], (n, C, T), jnp.float32)
    img_feat = jax.random.normal(ks[1], (N_CLASSES * IPC, D), jnp.float32)
    img_feat = img_feat / jnp.linalg.norm(img_feat, axis=1, keepdims=True)
    text_feat = jax.random.normal(ks[2], (N_CLASSES, D), jnp.float32)
    labels = jnp.repeat(jnp.arange(N_CLASSES, dtype=jnp.int32), IPC * REPS)
    local = jnp.arange(n, dtype=jnp.int32)
    return DeviceData(
        eeg=eeg,
        labels=labels,
        subject_ids=jnp.ones((n,), jnp.int32),
        img_feat=img_feat,
        text_feat=text_feat,
        img_idx=local // REPS,
        text_idx=local // (IPC * REPS),
        class_img_feat=img_feat[::IPC],
    )


def headline():
    import jax

    # threefry dropout-mask generation costs ~25% of the step (measured,
    # scripts/ablate_perf.py); the TPU-native RBG generator removes most of it
    jax.config.update("jax_default_prng_impl", "rbg")
    from eeg_image_decode_tpu.utils.backend import wait_for_backend

    # patient: a failed init can itself block minutes, and this entry point
    # is the round's one driver-run measurement — ride out short outages
    wait_for_backend(attempts=6, delay_s=120.0)
    import jax.numpy as jnp

    from eeg_image_decode_tpu.core.config import ATMSConfig, ContrastiveTrainConfig
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train.contrastive import (
        create_train_state,
        make_epoch_fn,
    )

    cfg = ContrastiveTrainConfig(encoder="atms", batch_size=BATCH)
    model = build_encoder("atms", config=ATMSConfig(), dtype=jnp.bfloat16)

    data = _device_synthetic_data()
    n = int(data.eeg.shape[0])
    state, tx = create_train_state(
        model, cfg, data.eeg[:2], data.subject_ids[:2]
    )
    epoch_fn = make_epoch_fn(model, tx, cfg)

    n_steps = n // BATCH
    perm_key = jax.random.key(1)

    def run_epoch(state, epoch):
        perm = jax.random.permutation(
            jax.random.fold_in(perm_key, epoch), n
        )[: n_steps * BATCH].reshape(n_steps, BATCH).astype(jnp.int32)
        t0 = time.perf_counter()
        state, metrics = epoch_fn(state, data, perm, jax.random.key(epoch))
        float(metrics["loss"])  # full host readback = reliable device sync
        return state, time.perf_counter() - t0, metrics

    state, _, _ = run_epoch(state, 0)  # compile
    times = []
    for epoch in (1, 2, 3):
        state, dt, metrics = run_epoch(state, epoch)
        times.append(dt)

    samples_per_s = n_steps * BATCH / min(times)

    # MFU from XLA's cost analysis. Cost analysis counts a lax.scan body
    # ONCE regardless of trip count, so lower a 1-step epoch and scale by
    # n_steps (the eval/mean epilogue it includes is negligible).
    mfu_pct = None
    try:
        perm0 = jnp.zeros((1, BATCH), jnp.int32)
        compiled = epoch_fn.lower(
            state, data, perm0, jax.random.key(0)
        ).compile()
        step_flops = compiled.cost_analysis()["flops"]
        mfu_pct = round(
            100.0 * step_flops * n_steps / min(times) / V5E_PEAK_FLOPS, 2
        )
    except Exception:
        pass

    lo, hi = A100_BAND_SAMPLES_PER_S
    result = {
        "metric": "atms_contrastive_train_throughput",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        # conservative: divides by the FAST edge of the ideal-A100 band
        "vs_baseline": round(samples_per_s / hi, 3),
        "vs_baseline_band": [round(samples_per_s / hi, 3),
                             round(samples_per_s / lo, 3)],
        "mfu_pct": mfu_pct,
        "baseline_note": (
            "denominator = ideal-A100 roofline band for the reference's "
            f"eager-torch step, {int(lo)}-{int(hi)} samples/s (profiled "
            "915 launches / 205 GFLOP / 7.5 GB HBM per step; binding floor "
            "at the fast edge is HBM bandwidth — scripts/bench_a100_band."
            "py). vs_baseline uses the FAST edge; the real reference loop "
            "is strictly slower (.item() syncs, host dataloader). Hardware "
            "context: v5e HBM is 0.41x A100's, so the memory-bound "
            "hardware-adjusted ideal ratio is ~0.41. Same-host measured "
            f"torch-CPU anchor: {TORCH_CPU_MEASURED_SAMPLES_PER_S} "
            "samples/s (scripts/bench_torch_baseline.py); rounds 1-4 used "
            "10k = ~500x that anchor as the denominator (superseded)."
        ),
    }
    print(json.dumps(result))


# extra regression-guard rows (VERDICT r3 #6): each runs in its own
# subprocess via scripts/bench_all.py — leftover HBM allocations and queued
# dispatches from one bench depress the next when run in-process (measured:
# the eval row read 326k samples/s after training benches vs 6.2M standalone)
EXTRA_ROWS = ("eval", "prior", "recon", "recon1024")
ROW_TIMEOUT_S = 900


def main():
    """Driver entry: aggregate ALL benches into ONE JSON line.

    The headline (contrastive training throughput) keeps the top-level
    metric/value/unit/vs_baseline contract; the other framework paths —
    eval-feature extraction, diffusion-prior training, end-to-end
    reconstruction latency (B=1 and B=8) — ride along in ``rows`` so a
    regression anywhere in the framework shows up in ``BENCH_r*.json``,
    not only one trainer. The parent process never initialises JAX: every
    bench (headline included) owns the TPU alone in a subprocess.
    """
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))

    def run_rows(cmd, timeout):
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=timeout,
                cwd=here,
            )
        except subprocess.TimeoutExpired:
            return [{"error": f"timeout after {timeout}s"}]
        rows = []
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
        if not rows:
            rows = [{"error": proc.stderr.strip()[-400:]
                     or f"exit {proc.returncode}, no output"}]
        return rows

    head = run_rows(
        [sys.executable, os.path.join(here, "bench.py"), "headline"],
        # the headline child waits patiently for the backend (6×120 s)
        # on top of the measurement itself
        timeout=1800,
    )[0]
    if "metric" not in head:  # headline failed — keep the line well-formed
        head = {
            "metric": "atms_contrastive_train_throughput",
            "value": 0.0,
            "unit": "samples/s",
            "vs_baseline": 0.0,
            **head,
        }
    rows = []
    for name in EXTRA_ROWS:
        for row in run_rows(
            [sys.executable, os.path.join(here, "scripts", "bench_all.py"),
             name],
            timeout=ROW_TIMEOUT_S,
        ):
            if "error" in row:
                row = {"metric": name, **row}
            rows.append(row)
    head["rows"] = rows
    print(json.dumps(head))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "headline":
        headline()
    else:
        main()
