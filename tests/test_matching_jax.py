"""Exact in-jit Hungarian matcher (ops/matching.hungarian_assignment_jax).

Round-2 verdict item 2: the TPU path needs an exact matcher with no host
callback.  These tests pin optimality against scipy's linear_sum_assignment
over random rectangular masked problems, plus structural invariants and
execution under sharding (the conditions of the production train step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from explainable_spatial_vqa_tpu.ops.matching import hungarian_assignment_jax


def _scipy_expected(cost: np.ndarray, mask: np.ndarray):
    """Optimal matched-cost sum + assignment for one masked (Q, T) problem."""
    q = cost.shape[0]
    valid_cols = np.where(mask)[0]
    k = len(valid_cols)
    exp = np.full(q, -1, dtype=np.int64)
    if k == 0:
        return 0.0, exp
    sub = cost[:, valid_cols]
    if q <= k:
        r, c = linear_sum_assignment(sub)
        exp[r] = valid_cols[c]
        return sub[r, c].sum(), exp
    r, c = linear_sum_assignment(sub.T)
    exp[c] = valid_cols[r]
    return sub.T[r, c].sum(), exp


@pytest.mark.parametrize("q,t", [(10, 10), (7, 10), (12, 5)])
def test_hungarian_jax_optimal_vs_scipy(q, t):
    rng = np.random.RandomState(q * 100 + t)
    batch = 64
    cost = (rng.rand(batch, q, t) * 30.0).astype(np.float32)
    mask = np.zeros((batch, t), bool)
    for b in range(batch):
        k = rng.randint(0, t + 1)
        mask[b, rng.choice(t, size=k, replace=False)] = True
    out = np.asarray(hungarian_assignment_jax(jnp.asarray(cost), jnp.asarray(mask)))
    for b in range(batch):
        exp_cost, _ = _scipy_expected(cost[b], mask[b])
        a = out[b]
        matched = a >= 0
        k = int(mask[b].sum())
        # structural invariants
        assert matched.sum() == min(q, k)
        assert all(mask[b, x] for x in a[matched])
        assert len(set(a[matched].tolist())) == matched.sum()  # one-to-one
        # optimality: same total matched cost as scipy (assignments may differ
        # only on exact ties)
        got = cost[b][np.where(matched)[0], a[matched]].sum()
        np.testing.assert_allclose(got, exp_cost, atol=1e-3)


def test_hungarian_jax_no_targets():
    cost = jnp.ones((2, 4, 3))
    mask = jnp.zeros((2, 3), bool)
    out = np.asarray(hungarian_assignment_jax(cost, mask))
    np.testing.assert_array_equal(out, -np.ones((2, 4)))


def test_hungarian_jax_scattered_mask():
    # valid targets NOT contiguous from slot 0
    cost = jnp.asarray([[[5.0, 1.0, 9.0, 2.0], [5.0, 2.0, 9.0, 1.0]]])
    mask = jnp.asarray([[False, True, False, True]])
    out = np.asarray(hungarian_assignment_jax(cost, mask))
    np.testing.assert_array_equal(out, [[1, 3]])


def test_hungarian_jax_under_jit_grad_context():
    # the matcher is used inside value_and_grad train steps; it must trace
    # under jit and produce constant (non-differentiated) assignments
    cost = jnp.asarray(np.random.RandomState(0).rand(4, 10, 10), jnp.float32)
    mask = jnp.ones((4, 10), bool)

    def loss(c):
        a = hungarian_assignment_jax(c, mask)
        safe = jnp.clip(a, 0, None)
        picked = jnp.take_along_axis(c, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(jnp.where(a >= 0, picked, 0.0))

    g = jax.grad(loss)(cost)
    assert np.isfinite(np.asarray(g)).all()
    # gradient flows only through the picked entries (one per row)
    assert int((np.asarray(g) != 0).sum()) == 4 * 10


def test_hungarian_jax_sharded_batch():
    # vmap'd while_loops must execute under a sharded batch (SPMD any-lane
    # lifting inserts collectives) — same conditions as the pjit train step
    from jax.sharding import NamedSharding, PartitionSpec

    devs = jax.devices()
    n = min(4, len(devs))
    mesh = jax.sharding.Mesh(np.array(devs[:n]), ("data",))
    rng = np.random.RandomState(1)
    cost = jnp.asarray(rng.rand(n * 2, 10, 10), jnp.float32)
    mask = jnp.ones((n * 2, 10), bool)
    sharded_cost = jax.device_put(cost, NamedSharding(mesh, PartitionSpec("data")))
    sharded_mask = jax.device_put(mask, NamedSharding(mesh, PartitionSpec("data")))
    out = np.asarray(jax.jit(hungarian_assignment_jax)(sharded_cost, sharded_mask))
    ref = np.asarray(hungarian_assignment_jax(cost, mask))
    np.testing.assert_array_equal(out, ref)
