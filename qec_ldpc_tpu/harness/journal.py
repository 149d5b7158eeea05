"""Append-only JSONL progress journal: checkpoint/resume for Monte-Carlo sweeps.

The reference's only resume story is append-mode result files per weight
(``main.cu:100``, ``ArrayOutput.h:9``) plus the recorded seed.  Here every
completed chunk appends one JSON line {run_id, weight, chunk, counters}; on
restart the journal replays finished chunks so a killed sweep resumes at the
next chunk with identical statistics (chunk keys are derived from (seed,
chunk index), so replay is exact).  Appends are fsync'd whole lines, so a
crash can at worst leave one torn trailing line, which replay skips.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

import numpy as np


class Journal:
    def __init__(self, path: str):
        self.path = path
        self._fh = None

    def _ensure_open(self):
        if self._fh is None:
            d = os.path.dirname(self.path)
            if d:
                os.makedirs(d, exist_ok=True)
            self._fh = open(self.path, "a")

    def append(self, record: dict) -> None:
        self._ensure_open()
        self._fh.write(json.dumps(record, separators=(",", ":")) + "\n")
        self._fh.flush()
        os.fsync(self._fh.fileno())

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def records(self) -> Iterator[dict]:
        if not os.path.exists(self.path):
            return
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    # torn final line after a crash: ignore (next append
                    # starts a fresh line because we only fsync whole lines)
                    continue

    def resume_state(self, run_id: str, weight: int):
        """Returns (next_chunk, accumulated_counters, total_iters) for the
        given run/weight from completed-chunk records."""
        next_chunk = 0
        counters = None
        iters = 0
        for rec in self.records():
            if rec.get("run_id") != run_id or rec.get("weight") != weight:
                continue
            if rec.get("chunk") != next_chunk:
                continue  # out-of-order duplicate; chunks are appended in order
            c = np.asarray(rec["counters"], dtype=np.int64)
            counters = c if counters is None else counters + c
            iters += int(rec.get("iters", 0))
            next_chunk += 1
        return next_chunk, counters, iters
