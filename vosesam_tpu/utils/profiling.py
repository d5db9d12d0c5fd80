"""Tracing / profiling utilities.

Reference (SURVEY.md §5): the torch code has ad-hoc commented-out
``time.time()`` probes around every stage (base_tracker.py:118-210,
inference_core.py:46-145) and a CUDA peak-memory print. Here:

  - `StageTimer`: per-stage wall timing with device sync (the axon tunnel's
    block_until_ready is unreliable; sync is a device_get of one leaf);
  - `trace()`: a jax.profiler trace context manager writing TensorBoard-
    compatible traces;
  - `device_memory_stats()`: live/peak HBM from the JAX runtime.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def sync(tree) -> None:
    """Force completion of all computations feeding `tree`."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


class StageTimer:
    """Accumulates per-stage latencies across frames.

    Usage:
        timer = StageTimer()
        with timer.stage("xmem"):
            out = step(...)        # synced on exit
    """

    def __init__(self, enabled: bool = True) -> None:
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._last_result = None

    @contextlib.contextmanager
    def stage(self, name: str, result=None) -> Iterator[None]:
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._last_result is not None:
                sync(self._last_result)
                self._last_result = None
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def record(self, result) -> None:
        """Register the stage's output so the timer can sync on it."""
        self._last_result = result

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(self.counts[k], 1) * 1e3
            for k in self.totals
        }

    def report(self) -> str:
        rows = sorted(self.summary().items(), key=lambda kv: -kv[1])
        total = sum(v for _, v in rows)
        lines = [f"{k:>24s}: {v:8.2f} ms/frame" for k, v in rows]
        lines.append(f"{'TOTAL':>24s}: {total:8.2f} ms/frame")
        return "\n".join(lines)

    def dump_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace context (TensorBoard / Perfetto viewable)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Live/peak HBM bytes (replaces torch.cuda.max_memory_allocated,
    base_tracker.py:210)."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }
