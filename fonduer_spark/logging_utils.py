"""Training-metrics logging (reference parity:
/root/reference/src/fonduer/utils/logging/tensorboard_writer.py — a thin
TensorBoardLogger over tensorboardX.SummaryWriter with add_scalar/close).

tensorboardX is absent from this container, so the default backend writes
the scalar stream to ``<log_dir>/scalars.jsonl`` (one JSON object per
add_scalar call — the same (name, value, step) triples TensorBoard event
files carry, greppable and replayable). When tensorboardX IS importable the
real SummaryWriter is used as well, so the class is a drop-in for the
reference's logger the day the env provides the library (the same
env-gating pattern as torch_lstm / spacy_lingual / multimodal's Pillow).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional


class TensorBoardLogger:
    """Reference TensorBoardLogger call shape: add_scalar(name, value,
    step) + close(). JSONL backend always on; tensorboardX mirrored when
    available."""

    def __init__(self, log_dir: str) -> None:
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, "scalars.jsonl")
        self._fh = open(self._path, "a")
        try:  # env-gated real backend
            from tensorboardX import SummaryWriter  # type: ignore

            self.writer: Optional[object] = SummaryWriter(log_dir)
        except ImportError:
            self.writer = None

    def add_scalar(self, name: str, value: float, step: int) -> None:
        """Log one scalar observation."""
        self._fh.write(json.dumps(
            {"name": name, "value": float(value), "step": int(step)}) + "\n")
        self._fh.flush()
        if self.writer is not None:
            self.writer.add_scalar(name, value, step)

    def close(self) -> None:
        self._fh.close()
        if self.writer is not None:
            self.writer.close()

    # -- read-back helper (beyond the reference: the JSONL backend makes
    # training curves assertable in tests and loadable as a DataFrame) --
    def scalars(self, name: Optional[str] = None) -> List[dict]:
        with open(self._path) as f:
            rows = [json.loads(ln) for ln in f if ln.strip()]
        return [r for r in rows if name is None or r["name"] == name]
