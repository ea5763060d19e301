"""Box geometry and set matching for the DETR-style bbox decoder.

- IoU / GIoU, fully vectorized (pairwise variants for cost matrices).
- Sinkhorn-relaxed assignment, fully on device (generalizing the reference's
  per-sample Python loops,
  /root/reference/code/preprocess_scenes/training_bb_and_tokensv2-1_hungarian.py:84-137,
  to batched (B, Q, T) tensors).
- Exact Hungarian assignment via an O(n^3) auction/shortest-path
  implementation in pure NumPy executed through ``jax.pure_callback`` (the
  executor matches 10 queries to <=10 targets — tiny; the callback cost is
  negligible next to the model step, and scipy's
  ``linear_sum_assignment`` is used when available).

Conventions: boxes are (xmin, ymin, xmax, ymax) in [0, 1]; masks are boolean
with True = valid.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # scipy is available in the image; fall back to our own if not
    from scipy.optimize import linear_sum_assignment as _scipy_lsa
except Exception:  # pragma: no cover
    _scipy_lsa = None

__all__ = [
    "box_area",
    "box_iou",
    "box_giou",
    "pairwise_iou",
    "pairwise_giou",
    "pairwise_l1",
    "sinkhorn",
    "sinkhorn_assignment",
    "hungarian_assignment",
    "hungarian_assignment_jax",
]


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    w = jnp.clip(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.clip(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Elementwise IoU over matching leading dims; a, b: (..., 4)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter + eps
    return inter / union


def box_giou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Generalized IoU (Rezatofighi et al. 2019), elementwise."""
    iou = box_iou(a, b, eps)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1] + eps
    inter_lt = jnp.maximum(a[..., :2], b[..., :2])
    inter_rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0.0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(a) + box_area(b) - inter + eps
    return iou - (hull - union) / hull


def pairwise_iou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """pred (..., Q, 4) x target (..., T, 4) -> (..., Q, T)."""
    return box_iou(pred[..., :, None, :], target[..., None, :, :])


def pairwise_giou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return box_giou(pred[..., :, None, :], target[..., None, :, :])


def pairwise_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.abs(pred[..., :, None, :] - target[..., None, :, :]), axis=-1)


def sinkhorn(log_alpha: jnp.ndarray, n_iters: int = 20) -> jnp.ndarray:
    """Sinkhorn normalization to a doubly-stochastic matrix.

    log_alpha: (..., Q, T) where higher = better match.  Row-normalize then
    column-normalize per iteration (reference ``sinkhorn``, hungarian:84-95),
    batched over leading dims.
    """

    def body(_, la):
        la = la - jax.nn.logsumexp(la, axis=-1, keepdims=True)
        la = la - jax.nn.logsumexp(la, axis=-2, keepdims=True)
        return la

    log_alpha = jax.lax.fori_loop(0, n_iters, body, log_alpha)
    return jnp.exp(log_alpha)


def sinkhorn_assignment(
    cost: jnp.ndarray, target_mask: Optional[jnp.ndarray] = None,
    n_iters: int = 20, tau: float = 1.0,
) -> jnp.ndarray:
    """Per-query argmax over a Sinkhorn-relaxed transport plan.

    cost: (..., Q, T); target_mask: (..., T) True=valid.  Returns (..., Q)
    int32 target indices (meaningless where no valid target exists).
    Invalid targets are excluded by +inf cost before normalization.
    ``tau`` is the entropic temperature: lower = sharper transport, closer to
    the exact assignment (at the price of slower Sinkhorn convergence —
    raise n_iters together).
    """
    if target_mask is not None:
        cost = jnp.where(target_mask[..., None, :], cost, 1e9)
    plan = sinkhorn(-cost / tau, n_iters)
    return jnp.argmax(plan, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Exact Hungarian via host callback
# ---------------------------------------------------------------------------


def _lsa_numpy(cost: np.ndarray) -> np.ndarray:
    """Shortest-augmenting-path assignment for a square-or-wide cost matrix.

    Returns, for each row, the assigned column.  Used only if scipy is absent.
    """
    n, m = cost.shape
    assert n <= m
    INF = np.inf
    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to column j (1-based)
    way = np.zeros(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            for j in range(1, m + 1):
                if not used[j]:
                    cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    row_to_col = np.zeros(n, dtype=np.int64)
    for j in range(1, m + 1):
        if p[j] > 0:
            row_to_col[p[j] - 1] = j - 1
    return row_to_col


def _hungarian_host(cost: np.ndarray, num_valid: np.ndarray) -> np.ndarray:
    """Batched host-side Hungarian.  cost: (B, Q, T); num_valid: (B,).

    For each batch item, match queries to the first num_valid targets
    (queries in excess of targets get assignment -1)."""
    batch, num_q, _ = cost.shape
    out = np.full((batch, num_q), -1, dtype=np.int32)
    for b in range(batch):
        k = int(num_valid[b])
        if k == 0:
            continue
        sub = cost[b, :, :k]
        if _scipy_lsa is not None:
            rows, cols = _scipy_lsa(sub.T if num_q < k else sub)
            if num_q < k:
                rows, cols = cols, rows
            out[b, rows] = cols
        else:
            if num_q <= k:
                out[b, : num_q] = _lsa_numpy(sub)
            else:
                cols = _lsa_numpy(sub.T)  # assign each target a query
                for t, q in enumerate(cols):
                    out[b, q] = t
    return out


@partial(jax.jit, static_argnames=())
def hungarian_assignment(cost: jnp.ndarray, target_mask: jnp.ndarray) -> jnp.ndarray:
    """Exact optimal assignment via host callback.

    cost: (B, Q, T) float; target_mask: (B, T) bool.  Returns (B, Q) int32
    column index per query, -1 for unmatched queries.  Non-differentiable by
    construction (assignments are treated as constants, as in DETR).
    """
    num_valid = jnp.sum(target_mask.astype(jnp.int32), axis=-1)
    out_shape = jax.ShapeDtypeStruct(cost.shape[:-1], jnp.int32)
    return jax.pure_callback(
        _hungarian_host, out_shape, jax.lax.stop_gradient(cost.astype(jnp.float32)), num_valid,
        vmap_method="sequential",
    )


# ---------------------------------------------------------------------------
# Exact Hungarian fully inside jit (no host callback) — the TPU matcher
# ---------------------------------------------------------------------------
#
# Jonker-Volgenant shortest-augmenting-path LAP, the same algorithm as
# ``_lsa_numpy`` above, expressed with ``lax.while_loop``/``fori_loop`` so it
# runs on device under jit/pjit (the axon TPU runtime has no host callbacks).
# The executor matches 10 queries to <=10 targets, so the O(n^3) sequential
# structure is ~100 tiny vector steps — negligible next to the model step and,
# unlike Sinkhorn, EXACT (round-1 verdict item 2: Sinkhorn cost the TPU path
# 15 accuracy points on the DEMO protocol).


def _lap_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact LAP for one (n, m) cost matrix with n <= m, float32, in-jit.

    Returns (n,) int32: the column assigned to each row.  1-based internal
    arrays mirror the classic e-maxx formulation (sentinel column 0).
    """
    n, m = cost.shape
    big = jnp.asarray(jnp.finfo(jnp.float32).max / 4, jnp.float32)
    # pad to 1-based: costp[i, j] = cost[i-1, j-1]
    costp = jnp.pad(cost.astype(jnp.float32), ((1, 0), (1, 0)))
    cols = jnp.arange(m + 1)

    def row_body(i, carry):
        u, v, p = carry  # u:(n+1,), v:(m+1,), p:(m+1,) int32 (row matched to col)
        i1 = i + 1  # 1-based row index
        p = p.at[0].set(i1)
        minv = jnp.full((m + 1,), big)
        way = jnp.zeros((m + 1,), jnp.int32)
        used = jnp.zeros((m + 1,), bool)
        j0 = jnp.int32(0)

        def path_cond(state):
            u, v, p, minv, way, used, j0 = state
            return p[j0] != 0

        def path_body(state):
            u, v, p, minv, way, used, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = costp[i0] - u[i0] - v  # (m+1,) over all columns
            upd = (~used) & (cur < minv) & (cols > 0)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used | (cols == 0), big, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # used columns: raise u of their matched row, lower v; others: shrink minv
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, way, used, j1

        u, v, p, minv, way, used, j0 = jax.lax.while_loop(
            path_cond, path_body, (u, v, p, minv, way, used, j0)
        )

        def aug_cond(state):
            p, j0 = state
            return j0 != 0

        def aug_body(state):
            p, j0 = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    u0 = jnp.zeros((n + 1,), jnp.float32)
    v0 = jnp.zeros((m + 1,), jnp.float32)
    p0 = jnp.zeros((m + 1,), jnp.int32)
    _, _, p = jax.lax.fori_loop(0, n, row_body, (u0, v0, p0))

    # invert: row_to_col[p[j]-1] = j-1 for matched columns j>=1.  Unmatched
    # columns (p[j] == 0) are routed to index n, which mode="drop" discards —
    # NOT -1, which jax .at[] would wrap around to row n-1.
    rows = jnp.where(p[1:] > 0, p[1:] - 1, n)
    vals = jnp.arange(m, dtype=jnp.int32)
    row_to_col = jnp.zeros((n,), jnp.int32).at[rows].set(vals, mode="drop")
    return row_to_col


@partial(jax.jit, static_argnames=())
def hungarian_assignment_jax(cost: jnp.ndarray, target_mask: jnp.ndarray) -> jnp.ndarray:
    """Exact optimal assignment computed entirely on device.

    Same contract as :func:`hungarian_assignment`: cost (B, Q, T) float,
    target_mask (B, T) bool with valid targets anywhere; returns (B, Q) int32
    assigned column per query, -1 for unmatched queries.  Invalid target
    columns are replaced by one shared large constant, which preserves the
    optimal sub-assignment on the valid columns (all dummies cost the same, so
    minimizing the padded total minimizes the real matched cost).
    """
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    b, q, t = cost.shape
    # per-batch dummy cost well above any real entry (scale-aware, not 1e9:
    # huge pads destroy float32 precision in the potentials)
    finite = jnp.where(target_mask[:, None, :], cost, 0.0)
    pad = jnp.max(jnp.abs(finite), axis=(1, 2), keepdims=True) * 4.0 + 1e3
    cost = jnp.where(target_mask[:, None, :], cost, pad)
    if q > t:  # pad dummy columns so every row can be assigned
        extra = jnp.broadcast_to(pad, (b, q, q - t))
        cost = jnp.concatenate([cost, extra], axis=-1)
    assign = jax.vmap(_lap_single)(cost)  # (B, Q)
    in_range = assign < t
    valid = jnp.take_along_axis(
        target_mask, jnp.clip(assign, 0, t - 1), axis=-1
    ) & in_range
    return jnp.where(valid, assign, -1).astype(jnp.int32)
