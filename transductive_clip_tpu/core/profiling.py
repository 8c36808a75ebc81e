"""Observability: phase timers and jax.profiler integration.

The reference's only telemetry is wall-clock timestamps inside each method
(reference: em_dirichlet.py:242-244) plus tqdm bars. Here:

* ``PhaseTimer`` collects named wall-clock phases (sampling, method,
  matching, extraction) across an evaluation and reports a summary,
* ``trace_if_requested`` wraps a block in a ``jax.profiler.trace`` when a
  profile directory is configured (``--opts profile_dir /tmp/prof``), giving
  full XLA execution traces viewable in TensorBoard/Perfetto,
* device timing uses ``ops.common.device_sync`` semantics — wall-clock with a
  forced transfer, robust to backends whose block_until_ready is a no-op.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        parts = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            parts.append(
                f"{name}: {self.totals[name]:.3f}s over {self.counts[name]} calls"
            )
        return " | ".join(parts) if parts else "no phases recorded"


@contextlib.contextmanager
def trace_if_requested(profile_dir):
    """jax.profiler.trace wrapper, no-op when profile_dir is falsy."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(profile_dir)):
        yield
