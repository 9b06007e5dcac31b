"""Multi-host (pod-slice) runtime tests.

The centerpiece spawns a REAL 2-process JAX cluster on CPU (4 virtual
devices per process, gloo collectives over localhost TCP — the DCN
stand-in) and runs one full contrastive train step over the global
8-device mesh through ``parallel/multihost.py``'s feeding helpers; both
members must agree bit-for-bit with each other and match the
single-process 8-device value. This is the multi-node test the reference
cannot have (its distributed surface is one never-activated NCCL
all-gather, ``models/loss.py:20-75``, and "multi-node is never tested" —
SURVEY.md §4)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from eeg_image_decode_tpu.core.mesh import create_mesh
from eeg_image_decode_tpu.parallel import multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_single_process_helpers_degenerate_to_device_put(mesh8):
    """Single-process, the feeding helpers ARE device_put (same shardings,
    same values) and the row slice is the whole batch."""
    assert not multihost.is_multiprocess()
    assert multihost.process_local_slice(16, mesh8) == slice(0, 16)

    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = multihost.shard_global_batch(mesh8, x, global_rows=16)
    assert g.sharding == NamedSharding(mesh8, P("dp"))
    np.testing.assert_array_equal(np.asarray(g), x)

    r = multihost.replicate_global(mesh8, {"a": x})
    assert r["a"].sharding == NamedSharding(mesh8, P())
    np.testing.assert_array_equal(np.asarray(r["a"]), x)

    # initialize() with no configuration is a harmless single-process no-op
    assert multihost.initialize() == (0, 1)


def test_process_local_slice_on_subset_mesh():
    """The slice is read off the sharding's device→index map, so it stays
    correct on meshes built over a subset of the devices too."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    sub = create_mesh(data_parallel=2, devices=[devs[0], devs[2]])
    assert multihost.process_local_slice(8, sub) == slice(0, 8)


def test_process_local_slice_on_dp_mp_mesh():
    """On a dp×mp mesh, devices along mp REPLICATE each dp row slice; the
    contiguity check must count each slice once, not once per replica
    (used to raise '(0, 2), (0, 2), (2, 4), (2, 4)... not contiguous' on a
    generation-style 4×2 mesh)."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs >= 8 devices")
    mesh = create_mesh(data_parallel=4, model_parallel=2)
    assert multihost.process_local_slice(8, mesh) == slice(0, 8)
    # and rows actually land replicated over mp / sharded over dp
    x = np.arange(8, dtype=np.float32)
    g = multihost.shard_global_batch(mesh, x, global_rows=8)
    np.testing.assert_array_equal(np.asarray(g), x)


def test_initialize_reraises_autodetect_bootstrap_failure(monkeypatch):
    """A genuine bootstrap RuntimeError (coordinator unreachable, backend
    already touched) must propagate even in autodetect mode — swallowing it
    would leave each pod host silently training its own divergent model.
    Only the idempotent 'already initialized' re-entry is benign."""
    def boom(**kw):
        raise RuntimeError("Distributed system initialization failed: "
                           "coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator unreachable"):
        multihost.initialize()  # autodetect mode (no explicit args)

    def already(**kw):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    assert multihost.initialize() == (0, 1)  # benign re-entry

    # late defensive call after backend touch: benign ONLY when nothing in
    # the environment says this process belongs to a multi-process job
    def late(**kw):
        raise RuntimeError(
            "jax.distributed.initialize() must be called before any JAX "
            "calls that might initialise the XLA backend."
        )

    monkeypatch.setattr(jax.distributed, "initialize", late)
    for var in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() == (0, 1)  # plain single-process: no-op

    monkeypatch.setenv("SLURM_NTASKS", "4")  # part of a 4-task job
    with pytest.raises(RuntimeError, match="must be called before"):
        multihost.initialize()
    monkeypatch.delenv("SLURM_NTASKS")

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with pytest.raises(RuntimeError, match="must be called before"):
        multihost.initialize()


def test_two_process_cluster_matches_single_process():
    """2 processes × 4 CPU devices = one global 8-device mesh: a full train
    step (BatchNorm psum, global-batch InfoNCE, AdamW, probe acc) fed via
    make_array_from_process_local_data must reproduce the single-process
    value, and both members must agree exactly."""
    from tests.multihost_case import run_case, run_sharded_resident_case

    ref_loss, ref_acc = run_case(multihost_feed=False)
    ref_sharded = run_sharded_resident_case()

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_child.py"),
             f"127.0.0.1:{port}", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}"

    results = {}
    sharded = {}
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line in:\n{out}"
        _, pid, loss, acc = lines[0].split()
        results[int(pid)] = (float(loss), float(acc))
        s_lines = [ln for ln in out.splitlines()
                   if ln.startswith("RESULT-SHARDED ")]
        assert s_lines, f"no RESULT-SHARDED line in:\n{out}"
        _, pid, loss, acc = s_lines[0].split()
        sharded[int(pid)] = (float(loss), float(acc))
    assert set(results) == {0, 1}
    # both cluster members see the identical replicated metrics
    assert results[0] == results[1], results
    loss, acc = results[0]
    # and they match the single-process 8-device run (gloo reduction order
    # vs in-process may differ in the last ulps)
    np.testing.assert_allclose(loss, ref_loss, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(acc, ref_acc, rtol=0, atol=1e-6)

    # the dp-sharded resident-dataset mode holds across processes too:
    # each host fed only its own shard rows through from_host, yet the
    # epoch metrics agree with the single-process 8-device run
    assert sharded[0] == sharded[1], sharded
    np.testing.assert_allclose(sharded[0][0], ref_sharded[0],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(sharded[0][1], ref_sharded[1],
                               rtol=0, atol=1e-6)
