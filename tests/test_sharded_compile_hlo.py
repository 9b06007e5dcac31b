"""FLAGSHIP-SHAPE sharded-compile assertions on the 8-device mesh.

``dryrun_multichip`` proves the sharded code paths execute on tiny shapes;
this test pins what GSPMD actually emits at the REAL workload size (batch
1024, full ATM-S, the (66160, 63, 250) training split) without allocating
the data: the epoch function is lowered from ShapeDtypeStructs and compiled,
then the HLO and per-device memory analysis are asserted —

- the loss's embedding all-gather exists (global-batch InfoNCE over dp),
- the gradient all-reduce exists (dp psum),
- per-device temp memory stays bounded (a pathological GSPMD decision that
  replicates a large intermediate shows up here first),
- replicated mode carries the full dataset per device while shard_samples
  mode carries ~1/dp of it — and nothing in the sharded HLO gathers a
  dataset-sized (66160-row) array onto one device.

These catch GSPMD regressions that tiny dryrun shapes hide (VERDICT r3 #8).
"""

import re

import pytest

import jax
import jax.numpy as jnp

from eeg_image_decode_tpu.core.config import (
    ATMSConfig,
    ContrastiveTrainConfig,
)
from eeg_image_decode_tpu.core.mesh import create_mesh
from eeg_image_decode_tpu.models import build_encoder
from eeg_image_decode_tpu.train.contrastive import (
    DeviceData,
    create_train_state,
    make_epoch_fn,
)

DP, BATCH = 8, 1024
N, NI, NC, D = 66160, 16540, 1654, 1024
N_STEPS = N // BATCH


def _abstract_data():
    s = lambda shape, dt=jnp.float32: jax.ShapeDtypeStruct(shape, dt)
    return DeviceData(
        eeg=s((N, 63, 250)),
        labels=s((N,), jnp.int32),
        subject_ids=s((N,), jnp.int32),
        img_feat=s((NI, D)),
        text_feat=s((NC, D)),
        img_idx=s((N,), jnp.int32),
        text_idx=s((N,), jnp.int32),
        class_img_feat=s((NC, D)),
    )


@pytest.fixture(scope="module")
def compiled_pair():
    mesh = create_mesh(data_parallel=DP)
    cfg = ContrastiveTrainConfig(batch_size=BATCH)
    model = build_encoder("atms", config=ATMSConfig(), dtype=jnp.bfloat16)
    state, tx = create_train_state(
        model, cfg, jnp.zeros((2, 63, 250)), jnp.ones((2,), jnp.int32)
    )
    data = _abstract_data()
    perm = jax.ShapeDtypeStruct((N_STEPS, BATCH), jnp.int32)
    out = {}
    for shard in (False, True):
        fn = make_epoch_fn(model, tx, cfg, mesh=mesh, shard_samples=shard)
        out[shard] = fn.lower(
            state, data, perm, jax.random.key(0)
        ).compile()
    return out


def _gather_shapes(txt):
    """Row counts of every all-gather result in the HLO."""
    rows = []
    for m in re.finditer(r"= \w+\[([\d,]+)\][^ ]* all-gather\(", txt):
        rows.append(tuple(int(x) for x in m.group(1).split(",")))
    return rows


@pytest.mark.parametrize("shard", [False, True])
def test_collectives_present_at_flagship_shape(compiled_pair, shard):
    txt = compiled_pair[shard].as_text()
    gathers = _gather_shapes(txt)
    # global-batch InfoNCE: the (B, D) embedding/target gathers must exist
    assert any(r[:2] == (BATCH, D) or r[:2] == (D, BATCH) for r in gathers), (
        sorted(set(gathers))
    )
    # dp gradient psum
    assert txt.count("all-reduce") > 0
    # nothing dataset-sized is ever gathered onto one device
    assert not any(N in r for r in gathers), sorted(set(gathers))


@pytest.mark.parametrize("shard", [False, True])
def test_per_device_memory_bounded(compiled_pair, shard):
    ma = compiled_pair[shard].memory_analysis()
    # generous 2x headroom over the measured ~0.92 GB of temps — a GSPMD
    # regression that replicates a big intermediate trips this first
    assert ma.temp_size_in_bytes < 2_000_000_000, ma.temp_size_in_bytes

    args_gb = ma.argument_size_in_bytes / 1e9
    if shard:
        # dataset sharded: ~4.3 GB/8 ≈ 0.54 GB + feature tables + state
        assert args_gb < 1.2, args_gb
    else:
        # dataset replicated: the full ~4.3 GB rides along per device
        assert 3.5 < args_gb < 6.0, args_gb


def test_sharded_mode_saves_memory_vs_replicated(compiled_pair):
    rep = compiled_pair[False].memory_analysis()
    sh = compiled_pair[True].memory_analysis()
    saved = rep.argument_size_in_bytes - sh.argument_size_in_bytes
    # the EEG tensor alone is 66160*63*250*4 ≈ 4.17 GB; 7/8 of it must go
    assert saved > 3_000_000_000, saved
