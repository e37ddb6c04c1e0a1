"""Metrics plumbing.

The reference's observability is ``AverageMeter`` + ``print`` every 10 iters
(reference ``utils.py:117-137``, ``train_3d.py:162-171``).  Same surface here,
plus a structured metric logger that writes one JSON line per report — the
framework's machine-readable metrics stream (SURVEY.md §5 build note).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional


class AverageMeter:
    """Running value/average (reference ``utils.py:117-137``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def metrics_path(output_dir: str, name: str = "metrics.jsonl") -> str:
    """Per-process metrics file under a (possibly shared) output dir.

    Multi-host runs share ``--output`` on network storage; every process
    appending to ONE ``metrics.jsonl`` interleaves lines from different
    hosts into one stream.  Process 0 keeps the canonical name (all
    tooling reads it); other ranks write ``metrics.rank{i}.jsonl``.
    """
    import os

    import jax

    r = jax.process_index()
    if r:
        base, ext = os.path.splitext(name)
        name = f"{base}.rank{r}{ext}"
    return os.path.join(output_dir, name)


class MetricLogger:
    """Console + optional JSONL metrics stream."""

    def __init__(self, jsonl_path: Optional[str] = None):
        self._fh = open(jsonl_path, "a") if jsonl_path else None

    def log(self, step_info: Dict, console: bool = True):
        rec = dict(step_info, ts=time.time())
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if console:
            parts = [f"{k} {v:.4f}" if isinstance(v, float) else f"{k} {v}"
                     for k, v in step_info.items()]
            print("\t".join(parts))
            sys.stdout.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
