"""The real-artifact acceptance runbook must itself keep working.

``scripts/acceptance_real.py --dry-run`` fabricates tiny synthetic
stand-ins in the exact on-disk formats the real artifacts use and drives
the full chain — retrieval training → feature export → prior training →
generation → metric table — through the real CLI. This test runs that mode
so the one-command parity check a reference user would run against real
THINGS-EEG + real weights cannot rot.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.acceptance_real import main as acceptance_main  # noqa: E402


def test_acceptance_dry_run_full_chain(tmp_path):
    pytest.importorskip("PIL")
    rc = acceptance_main(["--dry-run", "--work-dir", str(tmp_path)])
    assert rc == 0

    with open(tmp_path / "acceptance_report.json") as f:
        report = json.load(f)
    assert report["ok"]
    stages = {r["stage"]: r for r in report["stages"]}
    assert set(stages) == {"retrieval", "prior", "generate", "metrics"}
    assert stages["retrieval"]["status"] in ("pass", "warn")
    assert stages["generate"]["images"] == stages["generate"]["expected"]
    assert stages["metrics"]["status"] == "pass"
    assert "pixcorr" in {k.lower() for k in stages["metrics"]["table"]}

    # the artifacts a real acceptance run hands to the next stage exist
    assert (tmp_path / "eeg_features.npz").exists()
    assert (tmp_path / "prior" / "diffusion_prior.pkl").exists()
