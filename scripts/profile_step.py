"""Per-op time breakdown of the flagship train step on the real chip.

Captures a ``jax.profiler`` trace of one full training epoch (the same
workload as ``bench.py``), parses the xplane protobuf directly (the
tensorboard-plugin-profile converter is incompatible with the installed TF),
and prints the top XLA ops by device time with their Python source
attribution.

This is the tool that found the round-2 win: the tsconv backward's fp32
casts + layout copies at ~45% of the step (fixed by the dense-matmul
formulation, ``ops/tsconv.py::tsconv_pool_matmul``).

Run: python scripts/profile_step.py [top_n] [--batch N] [--joint]
(``--batch 16 --joint`` profiles the reference's joint-subjects
configuration, ``ATMS_retrieval_joint_train.py:519``)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, batch: int | None = None,
            joint: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")

    from eeg_image_decode_tpu.utils.backend import wait_for_backend

    wait_for_backend()

    import bench as B
    from eeg_image_decode_tpu.core.config import (
        ATMSConfig,
        ContrastiveTrainConfig,
    )
    from eeg_image_decode_tpu.models import build_encoder
    from eeg_image_decode_tpu.train.contrastive import (
        create_train_state,
        make_epoch_fn,
    )

    data = B._device_synthetic_data()
    n = int(data.eeg.shape[0])
    bs = batch or B.BATCH
    # cap the traced scan: small batches mean thousands of steps/epoch and
    # an unmanageable xplane; 256 steps is plenty for attribution
    n_steps = min(n // bs, 256)
    if joint:
        # profiling only: mixed-subject ids exercise the per-subject gather
        data = data.replace(
            subject_ids=(jnp.arange(n, dtype=jnp.int32) % 10)
        )
    model = build_encoder(
        "atms", config=ATMSConfig(joint_train=joint), dtype=jnp.bfloat16
    )
    cfg = ContrastiveTrainConfig(batch_size=bs)
    state, tx = create_train_state(model, cfg, data.eeg[:2],
                                   data.subject_ids[:2])
    epoch = make_epoch_fn(model, tx, cfg)
    perm = jax.random.permutation(jax.random.key(0), n)[: n_steps * bs]
    perm = perm.reshape(n_steps, bs).astype(jnp.int32)
    state, m = epoch(state, data, perm, jax.random.key(0))
    float(m["loss"])  # warmup + compile
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        state, m = epoch(state, data, perm, jax.random.key(1))
        float(m["loss"])
    return time.perf_counter() - t0


def report(trace_dir: str, top_n: int = 20) -> None:
    # pure-python protobuf parsing; the plugin's native converter is broken
    # against this TF build
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))[0]
    xs = xplane_pb2.XSpace()
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        raise SystemExit("no TPU plane in trace (ran on CPU?)")
    plane = planes[0]
    em = {e.id: e for e in plane.event_metadata.values()}
    sm = {s.id: s.name for s in plane.stat_metadata.values()}
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]

    tot: dict[str, float] = defaultdict(float)
    srcs: dict[str, str] = {}
    for ev in line.events:
        e = em[ev.metadata_id]
        key = e.name.split(" = ")[0]
        # the outer scan's `while` op spans (and double-counts) its body
        if key.startswith("%while"):
            continue
        tot[key] += ev.duration_ps / 1e12
        for st in e.stats:
            if sm.get(st.metadata_id) == "source":
                srcs[key] = st.str_value
    total = sum(tot.values())
    print(f"device op time: {total * 1e3:.0f} ms")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{t * 1e3:8.1f} ms {100 * t / total:5.1f}%  {name:34s} "
              f"{srcs.get(name, '?')}")


def main():
    argv = [a for a in sys.argv[1:]]
    joint = "--joint" in argv
    batch = None
    if "--batch" in argv:
        i = argv.index("--batch")
        try:
            batch = int(argv[i + 1])
        except (IndexError, ValueError):
            raise SystemExit(
                "usage: profile_step.py [top_n] [--batch N] [--joint] "
                "(--batch needs an integer value)"
            )
        del argv[i:i + 2]
    argv = [a for a in argv if a != "--joint"]
    try:
        top_n = int(argv[0]) if argv else 20
    except ValueError:
        raise SystemExit(
            "usage: profile_step.py [top_n] [--batch N] [--joint]"
        )
    trace_dir = tempfile.mkdtemp(prefix="eeg_tpu_prof_")
    try:
        wall = capture(trace_dir, batch=batch, joint=joint)
        print(f"epoch wall time: {wall:.3f}s")
        report(trace_dir, top_n)
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
