"""CI-sized low-level trainer trajectory parity vs the reference's OWN
``train_model`` loop (full rehearsal: ``scripts/parity_lowlevel_
trajectory.py`` — see its docstring for what is pinned and why the loss
band is wider than the smooth-loss trainers': L1's sign() gradient is
discontinuous, so fp-level residual-sign flips compound through Adam).
The reference model is fixed-size (143M params), so even this shortened
configuration trains the real full-size architecture — the test is
CPU-heavy (~3-5 min) by construction."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from parity_lowlevel_trajectory import lowlevel_trajectory_parity  # noqa: E402


def test_lowlevel_trajectory_matches_reference_train_model():
    res = lowlevel_trajectory_parity(n=32, batch=16, epochs=2, seed=0,
                                     log=lambda *a: None)
    # first-epoch agreement at the smooth-trainer level; then the
    # documented discontinuous-gradient band
    assert res["rel_loss_dev"][0] < 1e-4, res["rel_loss_dev"]
    assert max(res["rel_loss_dev"]) < 1e-3, res["rel_loss_dev"]
    # final models are behaviorally the same predictor
    assert res["pred_psnr_cross"] > 30.0, res["pred_psnr_cross"]
    assert (abs(res["pred_l1_jax"] - res["pred_l1_torch"])
            / res["pred_l1_torch"] < 5e-3), res
