"""Multi-host (pod-slice) runtime: process bootstrap + global-array feeding.

The reference's entire distributed surface is one optional, never-activated
single-host NCCL all-gather (``models/loss.py:20-75``); it has no multi-node
story at all. On TPU the natural scale-out unit is a pod slice — several
hosts, each owning a handful of chips, all running the SAME SPMD program
over one global :class:`jax.sharding.Mesh`. This module is the thin runtime
that makes the rest of this framework (whose trainers already take a mesh)
work in that setting:

1. :func:`initialize` — idempotent ``jax.distributed`` bootstrap. On real
   TPU pods every argument autodetects from the metadata server; on
   CPU/GPU clusters (and in the 2-process CPU integration test,
   ``tests/test_multihost.py``) pass coordinator/count/id explicitly.
2. :func:`replicate_global` / :func:`shard_global_batch` — the data-feeding
   primitives that replace ``jax.device_put`` when ``jax.process_count()>1``
   (``device_put`` cannot address another host's devices; the supported
   APIs are ``jax.make_array_from_callback`` for replicated leaves and
   ``jax.make_array_from_process_local_data`` for batch-sharded ones).
3. :func:`process_local_slice` — which rows of a globally batch-sharded
   array THIS process must load/feed, derived from the sharding's own
   device→index map (no assumptions about mesh layout).

Single-process, every helper degrades to plain ``device_put``, so the same
trainer code path runs from one chip to a multi-host slice — the design
rule the rest of the framework follows (see ``docs/SCALING.md``).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> tuple[int, int]:
    """Join (or create) the multi-process JAX runtime; returns
    ``(process_index, process_count)``.

    Safe to call unconditionally: if the distributed client is already up,
    or if no multi-process configuration is present (no args, no
    ``JAX_COORDINATOR_ADDRESS``/TPU-pod metadata), this is a no-op and the
    process stays single. Must run before the first backend touch
    (``jax.devices()`` etc.) to take effect — JAX initializes its backend
    lazily on first use.
    """
    want_explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:
        # Exactly two benign cases:
        #   1. "already initialized" — idempotent re-entry.
        #   2. "must be called before [backend touch]" in autodetect mode
        #      with NO cluster configuration anywhere — a plain
        #      single-process program calling initialize() defensively
        #      after jax.devices(); nothing multi-host was ever intended.
        # Everything else — coordinator unreachable, partial pod metadata,
        # backend touched when a cluster config IS present — is a genuine
        # bootstrap failure: swallowing it would silently leave each host
        # training its own divergent single-process model while the user
        # believes it is one global job.
        msg = str(e).lower()
        if "already initialized" in msg:
            pass
        elif (
            "must be called before" in msg
            and not want_explicit
            and not _cluster_env_hint()
        ):
            pass
        else:
            raise
    except ValueError:
        # no coordinator/autodetect info anywhere: single-process run
        if want_explicit:
            raise
    return jax.process_index(), jax.process_count()


def _cluster_env_hint() -> bool:
    """True when the environment carries any hint that this process was
    launched as part of a multi-process job (coordinator address, SLURM /
    OpenMPI ranks, TPU-pod megascale vars) — in which case a failed
    bootstrap must NOT be silently downgraded to single-process."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        return True
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        try:
            if int(os.environ.get(var, "1")) > 1:
                return True
        except ValueError:
            return True  # mangled value: fail safe, surface the error
    return False


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def replicate_global(mesh: Mesh, tree):
    """Fully-replicated global arrays from identical host copies.

    Every process must hold the SAME host value (deterministic construction
    — same seed/config — or a broadcast done by the caller); each process
    contributes only the shards on its own devices. Single-process this is
    exactly ``device_put(x, NamedSharding(mesh, P()))``.
    """
    sharding = NamedSharding(mesh, P())
    if not is_multiprocess():
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree_util.tree_map(put, tree)


def process_local_slice(
    n_global: int, mesh: Mesh, data_axis: str = "dp"
) -> slice:
    """Row range of a ``(n_global, ...)`` batch-sharded array owned by this
    process — read off the sharding's device→index map (layout-agnostic),
    asserting the process's rows are contiguous (true for meshes built by
    ``core.mesh.create_mesh``, whose dp axis follows ``jax.devices()``
    process ordering)."""
    sharding = NamedSharding(mesh, P(data_axis))
    imap = sharding.addressable_devices_indices_map((n_global,))
    # Deduplicate: on a dp×mp mesh, devices along non-data axes REPLICATE the
    # same row slice, so the raw map contains each (start, stop) once per
    # replica — counting them repeatedly would make perfectly contiguous rows
    # look overlapping and falsely trip the contiguity check below.
    starts = sorted({
        (0 if idx[0].start is None else idx[0].start,
         n_global if idx[0].stop is None else idx[0].stop)
        for idx in imap.values()
    })
    lo, hi = starts[0][0], starts[-1][1]
    covered = sum(b - a for a, b in starts)
    if covered != hi - lo:
        raise ValueError(
            f"this process's shard rows are not contiguous ({starts}); "
            f"feed via jax.make_array_from_process_local_data with an "
            f"explicitly matched layout instead"
        )
    return slice(lo, hi)


def shard_global_batch(
    mesh: Mesh,
    tree,
    *,
    global_rows: int,
    data_axis: str = "dp",
):
    """Batch-sharded global arrays from per-process row chunks.

    Each process passes ONLY its own rows (``process_local_slice`` says
    which); the result is one global ``(global_rows, ...)`` array sharded
    over ``data_axis``. Single-process this is exactly
    ``device_put(x, NamedSharding(mesh, P(data_axis)))``.
    """
    sharding = NamedSharding(mesh, P(data_axis))
    if not is_multiprocess():
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, (global_rows,) + x.shape[1:]
        )

    return jax.tree_util.tree_map(put, tree)
