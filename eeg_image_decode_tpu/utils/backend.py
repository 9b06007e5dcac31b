"""Backend-bringup helpers for on-chip scripts.

The TPU chip on this class of host is reached through a tunnel that flaps
occasionally: ``jax.devices()`` then raises ``RuntimeError: Unable to
initialize backend ... UNAVAILABLE`` (sometimes after blocking for minutes).
A transient outage at the moment a benchmark / validation script starts
should not zero out its run, so every on-chip entry point retries init a
few times before giving up. (``bench.py`` introduced this pattern; this is
the shared implementation.)
"""

from __future__ import annotations

import sys
import time


def wait_for_backend(attempts: int = 3, delay_s: float = 60.0):
    """Return ``jax.devices()``, retrying transient backend-init failures.

    A failed init can itself block for minutes before raising, so the
    attempt count stays small. Non-RuntimeError exceptions (genuine
    misconfiguration) propagate immediately.
    """
    import jax

    for i in range(attempts):
        try:
            return jax.devices()
        except RuntimeError as e:
            if i == attempts - 1:
                raise
            print(
                f"backend unavailable (attempt {i + 1}/{attempts}): {e}",
                file=sys.stderr,
            )
            time.sleep(delay_s)
