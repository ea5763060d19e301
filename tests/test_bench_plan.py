"""bench.plan_buckets: pure host scheduling logic for the serving bench.

Every question must land in exactly one slot of the shallowest bucket that
fits it; tail batches compile at the next power of two (>= min_tail) rather
than padding to the full batch — the padding-waste fix that makes large
serving batches viable (docs/DESIGN.md §2)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import plan_buckets  # noqa: E402

EDGES = (8, 12, 16, 20, 27)


def test_covers_each_question_exactly_once():
    rng = np.random.RandomState(0)
    num_steps = rng.randint(1, 28, 500)
    plan = plan_buckets(num_steps, batch=64, bucket_edges=EDGES)
    seen = np.concatenate([part[:real] for _d, _s, part, real in plan])
    assert sorted(seen) == list(range(500))


def test_questions_land_in_shallowest_fitting_bucket():
    num_steps = np.asarray([3, 9, 13, 20, 27, 8])
    plan = plan_buckets(num_steps, batch=4, bucket_edges=EDGES)
    depth_of = {}
    for depth, _s, part, real in plan:
        for q in part[:real]:
            depth_of[int(q)] = depth
    assert depth_of == {0: 8, 5: 8, 1: 12, 2: 16, 3: 20, 4: 27}
    for depth, _s, part, real in plan:
        assert (num_steps[part[:real]] <= depth).all()


def test_tail_batches_round_to_pow2_not_full_batch():
    # 200 questions of depth 27 with batch 512: one 256-slot tail, not 512
    plan = plan_buckets(np.full(200, 27), batch=512, bucket_edges=EDGES)
    assert len(plan) == 1
    depth, size, part, real = plan[0]
    assert (depth, size, real) == (27, 256, 200)
    assert len(part) == 256
    # padding repeats the last real index (valid rows, dropped by `real`)
    assert (part[200:] == part[199]).all()


def test_full_batches_stay_full_and_min_tail_floor():
    plan = plan_buckets(np.full(130, 5), batch=128, bucket_edges=EDGES,
                        min_tail=32)
    sizes = [(size, real) for _d, size, _p, real in plan]
    assert sizes == [(128, 128), (32, 2)]


def test_exact_multiple_has_no_tail():
    plan = plan_buckets(np.full(256, 5), batch=128, bucket_edges=EDGES)
    assert [(s, r) for _d, s, _p, r in plan] == [(128, 128), (128, 128)]


def test_tail_size_clamped_to_batch():
    # pow2 rounding must never produce slots LARGER than the batch
    plan = plan_buckets(np.full(70, 5), batch=100, bucket_edges=EDGES)
    assert [(s, r) for _d, s, _p, r in plan] == [(100, 70)]
    plan = plan_buckets(np.full(20, 5), batch=16, bucket_edges=EDGES,
                        min_tail=32)
    assert [(s, r) for _d, s, _p, r in plan] == [(16, 16), (16, 4)]


def test_uncovered_depth_raises():
    import pytest

    with pytest.raises(ValueError, match="exceed the deepest bucket"):
        plan_buckets(np.asarray([5, 30]), batch=16, bucket_edges=(8, 27))
