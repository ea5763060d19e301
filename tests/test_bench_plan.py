"""bench.plan_buckets: pure host scheduling logic for the serving bench.

Every question must land in exactly one slot of the shallowest bucket that
fits it; tail batches compile at the next power of two (>= min_tail) rather
than padding to the full batch — the padding-waste fix that makes large
serving batches viable (docs/DESIGN.md §2)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import plan_buckets, plan_sorted  # noqa: E402

EDGES = (8, 12, 16, 20, 27)


def test_plan_sorted_covers_each_question_exactly_once():
    rng = np.random.RandomState(0)
    num_steps = rng.randint(1, 28, 500)
    plan = plan_sorted(num_steps, batch=64)
    seen = np.concatenate([part[:real] for _d, _s, part, real in plan])
    assert sorted(seen) == list(range(500))


def test_plan_sorted_batches_are_depth_tight():
    rng = np.random.RandomState(1)
    num_steps = rng.randint(1, 28, 300)
    plan = plan_sorted(num_steps, batch=64)
    prev_max = 0
    for depth, _size, part, real in plan:
        # depth is the batch's own max (the dynamic loop bound)
        assert depth == int(num_steps[part[:real]].max())
        # sorted order: batches are non-decreasing in depth
        assert depth >= prev_max
        prev_max = depth


def test_plan_sorted_executes_less_than_buckets_on_bench_distribution():
    """On the bench's real CLEVR question-family depth distribution, the
    sorted+dynamic plan executes fewer total (padded-row x loop-step) units
    than the r2 bucket plan — the padding-waste win behind the r3 serving
    redesign (one tail batch total instead of one per bucket, and loop
    depth = each batch's own max instead of the bucket ceiling)."""
    from bench import synth_questions
    from explainable_spatial_vqa_tpu.core.config import ExecutorConfig

    _f, _q, chains = synth_questions(1024, ExecutorConfig(num_image_tokens=4,
                                                          image_feature_dim=4))
    num_steps = chains.num_steps

    def executed(plan):
        return sum(depth * size for depth, size, _p, _r in plan)

    e_sorted = executed(plan_sorted(num_steps, batch=128))
    e_buckets = executed(plan_buckets(num_steps, batch=128, bucket_edges=EDGES))
    useful = int(np.sum(num_steps))
    assert e_sorted < e_buckets
    # waste (executed beyond useful) shrinks by well over half
    assert e_sorted - useful < 0.5 * (e_buckets - useful)


def test_plan_sorted_tail_pow2():
    plan = plan_sorted(np.full(130, 5), batch=128, min_tail=32)
    assert [(s, r) for _d, s, _p, r in plan] == [(128, 128), (32, 2)]
    depth, size, part, real = plan[-1]
    assert (part[real:] == part[real - 1]).all()


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
