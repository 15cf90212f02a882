"""Scalar metrics sink: JSONL event stream split into training/ and validation/.

Role of the reference's ``MetricsCallback`` (``tracing/metrics.py:12-22``) which
split ``val_``-prefixed Keras logs into two TensorBoard writers.  This image has no
TensorBoard, so the durable format is JSONL (one event per line:
``{"step": n, "tag": "training/loss", "value": v, "time": t}``) — trivially
plottable and diffable; a TensorBoard exporter can be layered on later.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Mapping, Optional


class MetricsWriter:
    def __init__(self, log_dir):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._file = open(self.log_dir / "metrics.jsonl", "a", buffering=1)

    def write_scalar(self, tag: str, value, step: int) -> None:
        self._file.write(
            json.dumps(
                {"step": int(step), "tag": tag, "value": float(value),
                 "time": time.time()}
            )
            + "\n"
        )

    def write_scalars(self, metrics: Mapping[str, float], step: int,
                      prefix: str = "") -> None:
        for name, value in metrics.items():
            self.write_scalar(prefix + name, value, step)

    def write_split_scalars(self, logs: Mapping[str, float], step: int) -> None:
        """``val_``-prefixed keys -> validation/, the rest -> training/."""
        for name, value in logs.items():
            if name.startswith("val_"):
                self.write_scalar(f"validation/{name[4:]}", value, step)
            else:
                self.write_scalar(f"training/{name}", value, step)

    def write_text(self, tag: str, text: str, step: int = 0) -> None:
        path = self.log_dir / f"{tag.replace('/', '_')}.txt"
        path.write_text(text)

    def close(self) -> None:
        self._file.close()


def read_metrics(log_dir) -> Dict[str, list]:
    """Load a metrics.jsonl back into {tag: [(step, value), ...]}."""
    out: Dict[str, list] = {}
    path = Path(log_dir) / "metrics.jsonl"
    if not path.exists():
        return out
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            out.setdefault(ev["tag"], []).append((ev["step"], ev["value"]))
    return out
