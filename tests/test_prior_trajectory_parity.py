"""CI-sized prior trajectory parity vs the reference's OWN ``Pipe.train``
(the full rehearsal is ``scripts/parity_prior_trajectory.py``; this runs the
same code at a shortened configuration). See that script's module docstring
for the shared-randomness recipe and what is being pinned."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from parity_prior_trajectory import prior_trajectory_parity  # noqa: E402


def test_prior_trajectory_matches_reference_pipe_train():
    res = prior_trajectory_parity(
        n=128, batch=32, epochs=4, embed_dim=32, cond_dim=24,
        hidden_dims=(32, 24), time_embed_dim=16, seed=0, log=lambda *a: None,
    )
    assert max(res["rel_loss_dev"]) < 1e-4, res["rel_loss_dev"]
    assert res["max_param_diff"] < 1e-4, res["max_param_diff"]
    # shared weights + shared noise trajectory: sampler equivalence
    assert res["gen_max_diff"] < 1e-3 * max(res["gen_scale"], 1.0), (
        res["gen_max_diff"], res["gen_scale"])
