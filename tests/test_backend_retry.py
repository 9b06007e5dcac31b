"""wait_for_backend retries transient backend-init failures.

The TPU tunnel on the dev harness flaps; every on-chip script enters through
``utils/backend.py::wait_for_backend`` so a transient UNAVAILABLE does not
zero out a benchmark run (see bench.py's provenance notes).
"""

import pytest

from eeg_image_decode_tpu.utils.backend import wait_for_backend


def test_retries_then_succeeds(monkeypatch):
    import jax

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("Unable to initialize backend 'axon'")
        return ["dev0"]

    monkeypatch.setattr(jax, "devices", flaky)
    out = wait_for_backend(attempts=3, delay_s=0.0)
    assert out == ["dev0"]
    assert calls["n"] == 3


def test_raises_after_exhausted_attempts(monkeypatch):
    import jax

    def down():
        raise RuntimeError("UNAVAILABLE")

    monkeypatch.setattr(jax, "devices", down)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        wait_for_backend(attempts=2, delay_s=0.0)


def test_non_runtime_errors_propagate_immediately(monkeypatch):
    import jax

    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("misconfigured")

    monkeypatch.setattr(jax, "devices", broken)
    with pytest.raises(ValueError):
        wait_for_backend(attempts=3, delay_s=0.0)
    assert calls["n"] == 1
