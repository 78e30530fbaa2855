"""Tracing/profiling subsystem — per-phase timing + JAX profiler hooks.

SURVEY.md §5.1: the reference has only log-timestamp timing (plonky2's
internal TimingTree at dep level); the TPU build gets a real subsystem:
hierarchical phase timers (with device sync at boundaries so times are
honest) and optional xprof traces via jax.profiler.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

log = logging.getLogger("vectorx.prof")


@dataclass
class PhaseTimer:
    """Hierarchical wall-clock phase timing (TimingTree equivalent)."""

    sync: bool = True      # block_until_ready at phase ends
    _stack: List[str] = field(default_factory=list)
    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, *sync_args):
        self._stack.append(name)
        key = "/".join(self._stack)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and sync_args:
                jax.block_until_ready(sync_args)
            dt = time.perf_counter() - t0
            self.totals[key] = self.totals.get(key, 0.0) + dt
            self.counts[key] = self.counts.get(key, 0) + 1
            self._stack.pop()

    def report(self) -> str:
        lines = []
        for key in sorted(self.totals):
            depth = key.count("/")
            lines.append(f"{'  ' * depth}{key.rsplit('/', 1)[-1]}: "
                         f"{self.totals[key]*1e3:.1f} ms x{self.counts[key]}")
        return "\n".join(lines)

    def log_report(self) -> None:
        log.info("phase timings:\n%s", self.report())


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture a JAX/xprof device trace for TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in xprof traces."""
    return jax.profiler.TraceAnnotation(name)
