"""Structured JSON-lines metrics logging (SURVEY.md §7.5).

The reference prints stdout tables; the rebuild emits one JSON object per
event (config, N, build_ms, steps_per_s, pair_count, energy drift, ...) so
runs are machine-parseable. No external sinks — the environment is
air-gapped."""

from __future__ import annotations

import json
import sys
import time
from typing import IO


class JsonLogger:
    def __init__(self, stream: IO | None = None, run_id: str | None = None):
        self._stream = stream or sys.stderr
        self._run_id = run_id or f"run-{int(time.time())}"

    def log(self, event: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "run": self._run_id,
               "event": event}
        rec.update(fields)
        self._stream.write(json.dumps(rec) + "\n")
        self._stream.flush()
