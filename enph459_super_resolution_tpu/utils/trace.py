"""Tracing / profiling helpers.

The reference's observability is ad-hoc ``print(time.time())`` deltas
(SURVEY.md §5); here: structured stage timing that persists to JSON
(``utils.timing.StageTimer``), a device-profiler context that captures a
``jax.profiler`` trace viewable in TensorBoard/Perfetto, and a tiny
JSONL metrics logger shared by the CLIs.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (XLA device timeline) around a block."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLogger:
    """Append-only JSONL metrics stream with wall-clock stamps."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._t0 = time.time()

    def log(self, record: Dict, **extra) -> None:
        rec = dict(record)
        rec.update(extra)
        rec.setdefault("wall_s", round(time.time() - self._t0, 3))
        with open(self.path, "a") as fp:
            fp.write(json.dumps(rec) + "\n")
