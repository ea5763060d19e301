"""Host-side batch planning for the chained-inference fast paths.

Shared by serving (``ExecutorChainRunner.run_sorted``) and the benchmark
(``bench.py``) so the benched plan IS the served plan — the sort order,
power-of-two tail sizing, and repeat-last-index padding live in exactly one
place (unit-tested in tests/test_bench_plan.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

__all__ = ["plan_sorted", "plan_buckets"]


def _tail_size(real: int, batch: int, min_tail: int, multiple: int) -> int:
    size = batch if real == batch else min(
        batch, max(min_tail, 1 << (real - 1).bit_length())
    )
    if size % multiple:
        size = (size + multiple - 1) // multiple * multiple
    return size


def plan_sorted(
    num_steps, batch: int, min_tail: int = 32, multiple: int = 1
) -> List[Tuple[int, int, np.ndarray, int]]:
    """Depth-SORTED batch plan for the dynamic-loop-bound pipeline.

    Questions sort by chain depth and chunk into batches; each batch's
    fori_loop runs to that batch's OWN max depth (a traced bound — r3
    serving redesign, docs/DESIGN.md §10), so loop-tail waste collapses to
    the in-batch depth spread instead of the bucket-ceiling gap.  Returns
    (depth, size, indices, real): ``indices`` has static length ``size``
    (tail batches round up to the next power of two >= ``min_tail``, clamped
    to ``batch``, then up to a ``multiple`` of the mesh data-axis; padding
    repeats the last real index) and ``real`` counts the non-padded prefix.
    One compile per SIZE, not per depth."""
    num_steps = np.asarray(num_steps)
    order = np.argsort(num_steps, kind="stable")
    plan = []
    for start in range(0, len(order), batch):
        part = order[start : start + batch]
        real = part.size
        size = _tail_size(real, batch, min_tail, multiple)
        if real < size:
            part = np.concatenate([part, np.repeat(part[-1], size - real)])
        plan.append((int(num_steps[part].max()), size, part, real))
    return plan


def plan_buckets(
    num_steps, batch: int, bucket_edges, min_tail: int = 32, multiple: int = 1
) -> List[Tuple[int, int, np.ndarray, int]]:
    """Assign questions to (depth, batch-size) compiled-pipeline slots.

    The r2 per-depth-bucket plan, kept for comparison (``chain_mode=
    "bucketed"``).  Returns entries shaped like :func:`plan_sorted`.  Every
    question lands in exactly one slot of the shallowest bucket that fits
    it; raises if the edges don't cover the max depth."""
    num_steps = np.asarray(num_steps)
    plan = []
    assigned = np.zeros(len(num_steps), bool)
    for depth in bucket_edges:
        select = (~assigned) & (num_steps <= depth)
        assigned |= select
        idx = np.flatnonzero(select)
        for start in range(0, idx.size, batch):
            part = idx[start : start + batch]
            real = part.size
            size = _tail_size(real, batch, min_tail, multiple)
            if real < size:
                part = np.concatenate([part, np.repeat(part[-1], size - real)])
            plan.append((depth, size, part, real))
    if not assigned.all():
        raise ValueError(
            f"{int((~assigned).sum())} questions exceed the deepest bucket "
            f"edge {max(bucket_edges)} (max num_steps "
            f"{int(num_steps.max())})"
        )
    return plan
