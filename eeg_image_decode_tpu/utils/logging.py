"""Metrics logging: structured rows → CSV, stdout, optional wandb.

Rebuilds the reference's observability surface (SURVEY.md §5):
``wandb_logger`` wrapper (``models/util.py:231-287``) and the per-epoch CSV
rows (``ATMS_retrieval.py:569-582``) — without the reference's crash when
logging is disabled (``logger.watch`` called on None, ``:365-366``).
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time
from typing import Any


class MetricsLogger:
    """Collects metric rows; writes CSV; optionally mirrors to wandb/stdout."""

    def __init__(
        self,
        output_dir: str | None = None,
        *,
        use_wandb: bool = False,
        wandb_config: dict | None = None,
        project: str = "eeg_image_decode_tpu",
        stream=sys.stdout,
    ):
        self.output_dir = output_dir
        self.rows: list[dict[str, Any]] = []
        self.stream = stream
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=project, config=wandb_config or {}, reinit=True
                )
            except Exception as e:  # missing dep / no network — degrade
                print(f"wandb disabled ({e})", file=sys.stderr)

    def log(self, row: dict[str, Any], step: int | None = None) -> None:
        row = dict(row)
        row.setdefault("time", time.time())
        self.rows.append(row)
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in row.items() if isinstance(v, (int, float))},
                step=step,
            )

    def print(self, row: dict[str, Any]) -> None:
        if self.stream:
            printable = {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in row.items()
                if k != "time"
            }
            print(json.dumps(printable), file=self.stream)

    def write_csv(self, name: str = "results.csv") -> str | None:
        if not self.output_dir or not self.rows:
            return None
        os.makedirs(self.output_dir, exist_ok=True)
        path = os.path.join(self.output_dir, name)
        keys = sorted({k for r in self.rows for k in r})
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.rows)
        return path

    def finish(self) -> None:
        self.write_csv()
        if self._wandb is not None:
            self._wandb.finish()
