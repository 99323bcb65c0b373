"""Scalar metric writer: JSONL stream + final CSV, the observability
equivalent of the reference's TensorBoard SummaryWriter
(reference: src/utils.py:195-196, src/metrics.py:305-313). JSONL keeps the
host dependency-free; the schema (tag, value, step, wall_time) converts to
real TensorBoard event files offline via tools/scalars_to_tb.py.
"""

from __future__ import annotations

import json
import os
import time


class ScalarWriter:
    def __init__(self, log_dir: str, filename: str = "scalars.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._fh = open(self.path, "a")

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._fh.write(json.dumps({
            "tag": tag, "value": float(value), "step": int(step),
            "wall_time": time.time()}) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()
