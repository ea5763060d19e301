"""Tracing / profiling — a first-class subsystem (the reference has none;
SURVEY.md §5.1: only tqdm bars and one wall-clock print).

- ``phase``: wall-clock phase timer with a process-wide registry and report.
- ``trace``: context manager around ``jax.profiler`` emitting TensorBoard-
  compatible traces (XLA ops, TPU utilization) to a directory.
- ``annotate``: ``jax.profiler.TraceAnnotation`` passthrough for labelling
  regions inside steps.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

logger = logging.getLogger(__name__)

__all__ = ["phase", "phase_report", "reset_phases", "trace", "annotate"]

_PHASES: Dict[str, float] = defaultdict(float)
_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str, log: bool = False) -> Iterator[None]:
    """Accumulating wall-clock timer: ``with phase("annotate"): ...``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _PHASES[name] += dt
        _COUNTS[name] += 1
        if log:
            logger.info("phase %s: %.3fs", name, dt)


def phase_report() -> str:
    lines = ["phase timings:"]
    for name in sorted(_PHASES, key=_PHASES.get, reverse=True):  # type: ignore[arg-type]
        lines.append(
            f"  {name}: {_PHASES[name]:.3f}s total / {_COUNTS[name]} calls"
            f" = {_PHASES[name] / max(_COUNTS[name], 1):.4f}s each"
        )
    return "\n".join(lines)


def reset_phases() -> None:
    _PHASES.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside a traced step."""
    return jax.profiler.TraceAnnotation(name)
