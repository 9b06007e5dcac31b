"""Checkpoint / resume via orbax.

The reference saves bare ``state_dict`` every 5 epochs with no optimizer
state and no resume logic (``ATMS_retrieval.py:381-391``; SURVEY.md §5) — a
restart is from scratch. Here the full ``TrainState`` (params + BN stats +
optimizer state + step) round-trips, and the directory layout mirrors the
reference's ``<root>/<encoder>/<subject>/<run>/<epoch>`` convention so tooling
can discover runs the same way.
"""

from __future__ import annotations

import os
from typing import Any

import jax


class Checkpointer:
    """Thin orbax CheckpointManager wrapper keyed by integer step/epoch."""

    def __init__(self, directory: str, *, max_to_keep: int | None = None):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, *, wait: bool = False) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(state))
        if wait:
            self.manager.wait_until_finished()

    def restore(self, step: int | None, template: Any) -> Any:
        """Restore into the structure of ``template`` (a TrainState with
        correctly-shaped abstract or concrete arrays)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            template,
        )
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract)
        )

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def all_steps(self) -> list[int]:
        return list(self.manager.all_steps())

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


def save_history(checkpointer: Checkpointer, history: list[dict]) -> None:
    """Persist the epoch-metric history next to the checkpoints (atomic
    write), so a resumed run can reproduce the uninterrupted run's full
    history."""
    import json

    path = os.path.join(checkpointer.directory, "history.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(history, f)
    os.replace(tmp, path)


def load_history(checkpointer: Checkpointer, before_epoch: int) -> list[dict]:
    """Completed history rows (epoch < ``before_epoch``) from a prior run."""
    import json

    path = os.path.join(checkpointer.directory, "history.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        rows = json.load(f)
    return [r for r in rows if r.get("epoch", -1) < before_epoch]


def run_directory(
    root: str, encoder: str, subject: str, run_id: str
) -> str:
    """``<root>/contrast/<encoder>/<subject>/<run_id>`` — the reference's
    path convention (``ATMS_retrieval.py:384-385``)."""
    return os.path.join(root, "contrast", encoder, subject, run_id)
