"""Vectorized chained program execution.

The reference walks each question's chain in Python, one step at a time, one
question at a time, re-encoding the image every step and growing the decoder
prefix per token (run_inference_chain,
/root/reference/code/inference_transformer_full_annotation_new.py:83-146).

The TPU redesign executes *step position k of every question in the batch
simultaneously*: caches of per-step outputs (box sets / value tokens) live in
HBM as dense arrays; one jitted ``lax.fori_loop`` iterates over chain
positions, gathering each step's dependencies from the caches, running the
executor once for the whole batch, and scattering results back.  Program
steps are topologically ordered by construction (inputs always have smaller
indices, utils_programs semantics), so position order is a valid schedule.
Questions shorter than ``max_steps`` are masked; everything has static shape.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig, StepSeq2SeqConfig
from explainable_spatial_vqa_tpu.train.datasets import ChainArrays

__all__ = ["ExecutorChainRunner", "Seq2SeqChainRunner", "chained_forward",
           "chained_forward_pool", "compact_valid_first",
           "run_bucketed_seq2seq", "deal_deepest_first"]


def deal_deepest_first(num_steps: np.ndarray, num_chips: int) -> np.ndarray:
    """Deal question rows to chips for the sharded pool: sort by descending
    chain length, give chip ``c`` rows ``order[c::num_chips]`` (round-robin
    over the global deepest-first order — near-equal per-chip step totals
    even on skewed depth mixes), and pad every chip to the common length
    with ``-1`` sentinels.  Returns ``perm`` of shape (num_chips * per,):
    ``perm[c*per + j]`` is the original row index of chip ``c``'s j-th slot
    (or -1 for padding).  Load balance is pinned in tests/test_sharding.py."""
    num_steps = np.asarray(num_steps)
    n = num_steps.shape[0]
    order = np.argsort(-num_steps, kind="stable")
    per = -(-n // num_chips)  # ceil
    perm = np.full(num_chips * per, -1, np.int64)
    for c in range(num_chips):
        mine = order[c::num_chips]
        perm[c * per : c * per + len(mine)] = mine
    return perm


def compact_valid_first(tokens: jnp.ndarray, valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable-move valid entries to the front along the last axis.

    tokens (..., L), valid (..., L) bool -> (compacted tokens, new valid)."""
    order = jnp.argsort(jnp.logical_not(valid), axis=-1, stable=True)
    return (
        jnp.take_along_axis(tokens, order, axis=-1),
        jnp.take_along_axis(valid, order, axis=-1),
    )


class ChainState(NamedTuple):
    box_cache: jnp.ndarray  # (N, S, Q, 4)
    box_mask: jnp.ndarray  # (N, S, Q) bool — confident predicted boxes
    conf_cache: jnp.ndarray  # (N, S, Q) float32 — raw confidences (for
    # post-hoc threshold calibration, evalsuite.detection)
    token_cache: jnp.ndarray  # (N, S) int32
    token_branch: jnp.ndarray  # (N, S) bool — step produced a token
    routing: jnp.ndarray  # (N, S) int32 — chosen branch per step


def gather_dep_boxes(state: ChainState, dep: jnp.ndarray, rows=None):
    """Gather a dependency's cached box set: (B, Q, 4) boxes + validity.

    ``rows`` selects which cache row each batch element reads (continuous
    pool mode, where batch slot b holds question ``rows[b]``); default is
    the identity (plain mode, one slot per cache row)."""
    if rows is None:
        rows = jnp.arange(state.box_cache.shape[0])
    safe = jnp.clip(dep, 0, None)
    boxes = state.box_cache[rows, safe]  # (B, Q, 4)
    mask = state.box_mask[rows, safe] & (dep >= 0)[:, None]
    return boxes, mask


def gather_dep_token(state: ChainState, dep: jnp.ndarray, rows=None):
    """Gather a dependency's cached value token: (B,) token + validity."""
    if rows is None:
        rows = jnp.arange(state.token_cache.shape[0])
    safe = jnp.clip(dep, 0, None)
    token = state.token_cache[rows, safe]
    valid = state.token_branch[rows, safe] & (dep >= 0)
    return jnp.where(valid, token, 0), valid


def gather_step_inputs(state: ChainState, func: jnp.ndarray, dep0: jnp.ndarray,
                       dep1: jnp.ndarray, max_input_boxes: int, rows=None):
    """Assemble one chain step's executor inputs from the caches.

    Box sets of both dependencies are concatenated, compacted valid-first and
    truncated to ``max_input_boxes``; text is [function, dep0 value, dep1
    value] with positional validity masks."""
    b0, m0 = gather_dep_boxes(state, dep0, rows)
    b1, m1 = gather_dep_boxes(state, dep1, rows)
    all_boxes = jnp.concatenate([b0, b1], axis=1)  # (N, 2Q, 4)
    all_mask = jnp.concatenate([m0, m1], axis=1)
    order = jnp.argsort(jnp.logical_not(all_mask), axis=-1, stable=True)
    all_boxes = jnp.take_along_axis(all_boxes, order[..., None], axis=1)
    all_mask = jnp.take_along_axis(all_mask, order, axis=1)
    input_boxes = all_boxes[:, :max_input_boxes]
    input_mask = all_mask[:, :max_input_boxes]

    t0, v0 = gather_dep_token(state, dep0, rows)
    t1, v1 = gather_dep_token(state, dep1, rows)
    text = jnp.stack([func, t0, t1], axis=1)
    text_mask = jnp.stack([jnp.ones_like(v0), v0, v1], axis=1)
    return input_boxes, input_mask, text, text_mask


def chained_forward(
    model,
    variables,
    image_tokens: jnp.ndarray,  # (N, P, C) raw or (N, 1+P, d) precomputed
    functions: jnp.ndarray,  # (N, S)
    deps: jnp.ndarray,  # (N, S, 2)
    num_steps: jnp.ndarray,  # (N,)
    cfg: ExecutorConfig,
    max_steps: int,
    image_precomputed: bool = False,
    active_steps: Optional[jnp.ndarray] = None,
    conf_thresholds: Optional[jnp.ndarray] = None,
) -> ChainState:
    """Run the whole-batch chained executor pass (one fori_loop over step
    positions, HBM caches threaded through).  Shared by the inference runner
    and scheduled-sampling training (which calls it under stop_gradient to
    obtain the model's own dependency predictions).

    ``active_steps``: optional TRACED scalar upper bound on loop trips (the
    batch's max chain depth).  Cache shapes stay static at ``max_steps``;
    the loop simply stops early — iterations at k >= every question's
    num_steps write nothing (masked inactive), so outputs are identical to
    the full-depth run (tests/test_chain.py).  This is the depth-SORTED
    serving path: one compiled pipeline per batch size handles every depth
    with zero loop-tail waste, replacing per-depth bucket compiles."""
    n = image_tokens.shape[0]
    s = max_steps
    q = cfg.num_queries
    if not image_precomputed:
        # Project + position the image ONCE per question (thesis image
        # cache); every chain step below reuses these tokens.
        image_tokens = model.apply(
            variables, image_tokens, method=model.precompute_image
        )
    state = ChainState(
        box_cache=jnp.zeros((n, s, q, 4), jnp.float32),
        box_mask=jnp.zeros((n, s, q), bool),
        conf_cache=jnp.zeros((n, s, q), jnp.float32),
        token_cache=jnp.zeros((n, s), jnp.int32),
        token_branch=jnp.zeros((n, s), bool),
        routing=jnp.zeros((n, s), jnp.int32),
    )
    rows = jnp.arange(n)

    def body(k, state: ChainState) -> ChainState:
        func = functions[:, k]  # (N,)
        input_boxes, input_mask, text, text_mask = gather_step_inputs(
            state, func, deps[:, k, 0], deps[:, k, 1], cfg.max_input_boxes
        )

        out = model.apply(
            variables, image_tokens, input_boxes, input_mask, text, text_mask,
            image_precomputed=True,
        )
        is_box = jnp.argmax(out["routing_logits"], axis=-1) == 0  # (N,)
        pred_token = jnp.argmax(out["token_logits"], axis=-1).astype(jnp.int32)
        # propagation gate: per-FUNCTION operating points when a calibrated
        # vector is given (functions differ systematically in confidence —
        # same_* sits far below the filters; a single global threshold
        # starves their downstream steps), else the config scalar
        thr = (cfg.conf_threshold if conf_thresholds is None
               else conf_thresholds[func][:, None])
        conf_mask = (out["pred_conf"] >= thr) & is_box[:, None]

        active = k < num_steps

        state = ChainState(
            box_cache=state.box_cache.at[rows, k].set(
                jnp.where(active[:, None, None], out["pred_boxes"], 0.0)
            ),
            box_mask=state.box_mask.at[rows, k].set(active[:, None] & conf_mask),
            conf_cache=state.conf_cache.at[rows, k].set(
                jnp.where(active[:, None] & is_box[:, None], out["pred_conf"], 0.0)
            ),
            token_cache=state.token_cache.at[rows, k].set(
                jnp.where(active & ~is_box, pred_token, 0)
            ),
            token_branch=state.token_branch.at[rows, k].set(active & ~is_box),
            routing=state.routing.at[rows, k].set(
                jnp.where(active, (~is_box).astype(jnp.int32), 0)
            ),
        )
        return state

    upper = s if active_steps is None else jnp.minimum(active_steps, s)
    return jax.lax.fori_loop(0, upper, body, state)


def chained_forward_pool(
    model,
    variables,
    image_features: jnp.ndarray,  # (M, P, C) per-IMAGE raw feature cache
    image_index: jnp.ndarray,  # (N,) question -> image row
    functions: jnp.ndarray,  # (N, S)
    deps: jnp.ndarray,  # (N, S, 2)
    num_steps: jnp.ndarray,  # (N,)
    cfg: ExecutorConfig,
    max_steps: int,
    slots: int = 128,
    return_iterations: bool = False,
    conf_thresholds: Optional[jnp.ndarray] = None,
):
    """CONTINUOUS-BATCHING chained execution: one jitted while_loop over a
    fixed pool of ``slots``, each slot advancing its own question one chain
    step per iteration; a finished slot immediately admits the next question
    from a depth-sorted queue (deepest first, so the drain tail is the
    shallowest work).  This is the LLM-serving continuous-batching idea
    mapped to chain steps: where the depth-sorted batch plan still runs
    every row to its batch's max depth and pads tails to pow2 (measured
    13.7% of executed slot-steps wasted at the bench distribution,
    docs/DESIGN.md §10.1), the pool retires rows the moment they finish —
    the only waste left is idle slots while the queue drains.

    Semantics are EXACTLY ``chained_forward``'s: per (row, step) the
    executor sees identical inputs (deps always come from earlier steps of
    the same row, already computed in this slot's earlier iterations), and
    writes land in the same (N, S, ...) caches.  Each question is admitted
    to exactly one slot exactly once, so scatters never collide; inactive
    slots scatter to row N via mode="drop".

    The image cache enters per-IMAGE (the HBM feature cache) and is
    projected ONCE for all M images up front; each iteration gathers the
    pool's current rows' image tokens on device.

    ``return_iterations=True`` returns ``(state, iterations)`` — the loop
    trip count, i.e. executed slot-steps / slots; useful steps / (iterations
    x slots) is the pool's packing efficiency (DESIGN.md §10.2)."""
    n = functions.shape[0]
    s = max_steps
    q = cfg.num_queries
    b = min(slots, n)

    # project + position every image once (thesis image cache semantics)
    image_pre = model.apply(
        variables, image_features, method=model.precompute_image
    )

    state = ChainState(
        box_cache=jnp.zeros((n, s, q, 4), jnp.float32),
        box_mask=jnp.zeros((n, s, q), bool),
        conf_cache=jnp.zeros((n, s, q), jnp.float32),
        token_cache=jnp.zeros((n, s), jnp.int32),
        token_branch=jnp.zeros((n, s), bool),
        routing=jnp.zeros((n, s), jnp.int32),
    )

    # deepest-first admission order: the queue's tail (last admissions,
    # which set the drain time) is the shallowest work
    order = jnp.argsort(-num_steps, stable=True)
    slot_rows = order[jnp.clip(jnp.arange(b), 0, n - 1)]
    slot_step = jnp.zeros((b,), jnp.int32)
    active = jnp.arange(b) < n
    queue_ptr = jnp.asarray(b, jnp.int32)

    def cond(carry):
        _state, _rows, _step, _ptr, act, _t = carry
        return jnp.any(act)

    def body(carry):
        state, rows, k, ptr, act, t = carry
        func = functions[rows, k]  # (B,)
        input_boxes, input_mask, text, text_mask = gather_step_inputs(
            state, func, deps[rows, k, 0], deps[rows, k, 1],
            cfg.max_input_boxes, rows=rows,
        )
        img = image_pre[image_index[rows]]  # (B, 1+P, d)

        out = model.apply(
            variables, img, input_boxes, input_mask, text, text_mask,
            image_precomputed=True,
        )
        is_box = jnp.argmax(out["routing_logits"], axis=-1) == 0  # (B,)
        pred_token = jnp.argmax(out["token_logits"], axis=-1).astype(jnp.int32)
        thr = (cfg.conf_threshold if conf_thresholds is None
               else conf_thresholds[func][:, None])
        conf_mask = (out["pred_conf"] >= thr) & is_box[:, None]

        # masked scatter: inactive slots (and zero-step rows, which the
        # plain runner never writes either) write to row n, dropped
        w = jnp.where(act & (k < num_steps[rows]), rows, n)
        state = ChainState(
            box_cache=state.box_cache.at[w, k].set(
                out["pred_boxes"], mode="drop"
            ),
            box_mask=state.box_mask.at[w, k].set(conf_mask, mode="drop"),
            conf_cache=state.conf_cache.at[w, k].set(
                jnp.where(is_box[:, None], out["pred_conf"], 0.0), mode="drop"
            ),
            token_cache=state.token_cache.at[w, k].set(
                jnp.where(~is_box, pred_token, 0), mode="drop"
            ),
            token_branch=state.token_branch.at[w, k].set(~is_box, mode="drop"),
            routing=state.routing.at[w, k].set(
                (~is_box).astype(jnp.int32), mode="drop"
            ),
        )

        # retire finished rows, admit from the queue
        k_next = k + 1
        finished = act & (k_next >= num_steps[rows])
        cont = act & ~finished
        fin = finished.astype(jnp.int32)
        rank = jnp.cumsum(fin) - fin  # exclusive: finished slots before me
        cand = ptr + rank
        has_new = finished & (cand < n)
        new_rows = order[jnp.clip(cand, 0, n - 1)]
        rows = jnp.where(has_new, new_rows, rows)
        k = jnp.where(has_new, 0, jnp.where(cont, k_next, k))
        act = cont | has_new
        ptr = ptr + jnp.sum(fin)
        return state, rows, k, ptr, act, t + 1

    state, _, _, _, _, iters = jax.lax.while_loop(
        cond, body,
        (state, slot_rows, slot_step, queue_ptr, active,
         jnp.asarray(0, jnp.int32)),
    )
    if return_iterations:
        return state, iters
    return state


class ExecutorChainRunner:
    """Chained inference for the thesis-final ProgramExecutor.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``"data"`` axis for
    multi-chip serving — parameters replicate, the question batch shards
    over the axis, and the whole chained loop partitions with ZERO
    collectives (every op in ``chained_forward`` is batch-parallel: the
    dependency gathers index within each question's own row).  Batches are
    padded to a multiple of the axis size and un-padded on return.
    """

    def __init__(self, model, variables, config: ExecutorConfig, max_steps: int = 28,
                 mesh=None, conf_thresholds=None):
        self.model = model
        self.config = config
        self.max_steps = max_steps
        self.mesh = mesh
        # optional per-FUNCTION propagation thresholds, indexed by
        # function-vocab id (build with
        # evalsuite.executor_eval.build_conf_threshold_vector); None = the
        # config's global scalar
        self.conf_thresholds = (
            None if conf_thresholds is None
            else jnp.asarray(conf_thresholds, jnp.float32))
        if mesh is not None:
            from explainable_spatial_vqa_tpu.parallel.mesh import (
                batch_sharding, replicated,
            )

            self._data_axis = mesh.shape["data"]
            self._batch_shard = batch_sharding(mesh)
            self.variables = jax.device_put(variables, replicated(mesh))
            self._run = jax.jit(
                self._run_impl,
                in_shardings=(self._batch_shard,) * 4,
                out_shardings=ChainState(*(self._batch_shard,) * 6),
            )
            self._run_dyn = jax.jit(
                self._run_dyn_impl,
                in_shardings=(self._batch_shard,) * 4 + (replicated(mesh),),
                out_shardings=ChainState(*(self._batch_shard,) * 6),
            )
        else:
            self._data_axis = 1
            self.variables = variables
            self._run = jax.jit(self._run_impl)
            self._run_dyn = jax.jit(self._run_dyn_impl)

    def _run_impl(
        self,
        image_tokens: jnp.ndarray,  # (N, P, C)
        functions: jnp.ndarray,  # (N, S)
        deps: jnp.ndarray,  # (N, S, 2)
        num_steps: jnp.ndarray,  # (N,)
    ) -> ChainState:
        return chained_forward(
            self.model, self.variables, image_tokens, functions, deps,
            num_steps, self.config, self.max_steps,
            conf_thresholds=self.conf_thresholds,
        )

    def _run_dyn_impl(self, image_tokens, functions, deps, num_steps,
                      active_steps):
        return chained_forward(
            self.model, self.variables, image_tokens, functions, deps,
            num_steps, self.config, self.max_steps,
            active_steps=active_steps,
            conf_thresholds=self.conf_thresholds,
        )

    def run(self, image_tokens, chains: ChainArrays) -> Dict[str, np.ndarray]:
        n = chains.functions.shape[0]
        args = (image_tokens, chains.functions, chains.deps, chains.num_steps)
        if self._data_axis > 1 and n % self._data_axis:
            # zero-pad ON HOST (before any device transfer) so shapes divide
            # the data axis; padded rows have num_steps=0 (every step
            # inactive) and are dropped below
            from explainable_spatial_vqa_tpu.parallel.mesh import pad_to_multiple

            args = tuple(pad_to_multiple(a, self._data_axis)[0] for a in args)
        state = self._run(*(jnp.asarray(a) for a in args))
        if args[1].shape[0] != n:
            state = ChainState(*(leaf[:n] for leaf in state))
        last = np.asarray(chains.num_steps) - 1
        rows = np.arange(len(last))
        return {
            "final_tokens": np.asarray(state.token_cache)[rows, last],
            "final_is_token": np.asarray(state.token_branch)[rows, last],
            "box_cache": np.asarray(state.box_cache),
            "box_mask": np.asarray(state.box_mask),
            "conf_cache": np.asarray(state.conf_cache),
            "token_cache": np.asarray(state.token_cache),
            "token_branch": np.asarray(state.token_branch),
        }

    def _empty_outputs(self, n: int) -> Dict[str, np.ndarray]:
        """Zero-initialized full-size output caches that the batched runners
        (run_bucketed / run_sorted) scatter per-batch results into — steps
        past a question's executed depth stay zero/False, same as inactive
        steps in the plain runner."""
        s, q = self.max_steps, self.config.num_queries
        return {
            "final_tokens": np.zeros(n, np.int32),
            "final_is_token": np.zeros(n, bool),
            "box_cache": np.zeros((n, s, q, 4), np.float32),
            "box_mask": np.zeros((n, s, q), bool),
            "conf_cache": np.zeros((n, s, q), np.float32),
            "token_cache": np.zeros((n, s), np.int32),
            "token_branch": np.zeros((n, s), bool),
        }

    def run_bucketed(
        self,
        image_tokens,
        chains: ChainArrays,
        buckets: Tuple[int, ...] = (8, 12, 16, 20, 28),
    ) -> Dict[str, np.ndarray]:
        """Depth-bucketed execution: questions grouped by chain length so a
        4-step question never pays for 28 loop iterations.  One compiled
        runner per bucket depth (cached across calls); results — including
        the full per-step caches, so downstream box-P/R tallies ride this
        fast path — are scattered back into original order."""
        num_steps = np.asarray(chains.num_steps)
        n = len(num_steps)
        full = self._empty_outputs(n)
        buckets = tuple(b for b in sorted(set(buckets)) if b <= self.max_steps)
        if not buckets or buckets[-1] < self.max_steps:
            buckets = buckets + (self.max_steps,)
        assigned = np.zeros(n, bool)
        if not hasattr(self, "_bucket_runners"):
            self._bucket_runners: Dict[int, "ExecutorChainRunner"] = {}
        for depth in buckets:
            select = (~assigned) & (num_steps <= depth)
            assigned |= select
            idx = np.flatnonzero(select)
            if idx.size == 0:
                continue
            runner = self._bucket_runners.get(depth)
            if runner is None:
                runner = ExecutorChainRunner(
                    self.model, self.variables, self.config, max_steps=depth,
                    mesh=self.mesh, conf_thresholds=self.conf_thresholds,
                )
                self._bucket_runners[depth] = runner
            sub = ChainArrays(
                chains.image_index[idx],
                chains.functions[idx, :depth],
                chains.deps[idx, :depth],
                num_steps[idx],
                [],
            )
            out = runner.run(np.asarray(image_tokens)[idx], sub)
            for key in ("final_tokens", "final_is_token"):
                full[key][idx] = out[key]
            for key in ("box_cache", "box_mask", "conf_cache", "token_cache",
                        "token_branch"):
                full[key][idx, :depth] = out[key]
        return full

    def run_pool(
        self,
        image_features,
        chains: ChainArrays,
        slots: int = 128,
    ) -> Dict[str, np.ndarray]:
        """Continuous-batching execution (docs/DESIGN.md §10.2): ONE jitted
        while_loop over a fixed slot pool retires each question the moment
        its chain ends and admits the next from a deepest-first queue —
        executed slot-steps shrink to useful steps + the drain tail, vs
        run_sorted's in-batch depth spread + pow2 tail padding.

        ``image_features`` is the per-IMAGE feature cache (M, P, C) — host
        or device-resident — indexed by ``chains.image_index`` (NOT the
        per-question array the other runners take: the pool gathers image
        tokens per iteration, so duplicating them per question would
        multiply HBM).

        Multi-chip (``mesh`` with a "data" axis): questions are dealt
        round-robin over the GLOBAL deepest-first order to each chip (near
        equal total steps per chip), the image cache replicates, and every
        chip runs its own independent pool under ``shard_map`` — zero
        collectives, per-chip while_loop trip counts free to differ."""
        n = chains.functions.shape[0]
        feats = (
            image_features if isinstance(image_features, jax.Array)
            else jnp.asarray(np.asarray(image_features))
        )
        if self.mesh is None:
            if not hasattr(self, "_pool_jits"):
                self._pool_jits: Dict[int, object] = {}
            fn = self._pool_jits.get(slots)
            if fn is None:
                def impl(fts, img_idx, fns, dps, nsteps, _slots=slots):
                    return chained_forward_pool(
                        self.model, self.variables, fts, img_idx, fns, dps,
                        nsteps, self.config, self.max_steps, slots=_slots,
                        conf_thresholds=self.conf_thresholds,
                    )
                fn = jax.jit(impl)
                self._pool_jits[slots] = fn
            state = fn(
                feats,
                jnp.asarray(chains.image_index),
                jnp.asarray(chains.functions),
                jnp.asarray(chains.deps),
                jnp.asarray(chains.num_steps),
            )
            return self._pool_outputs(state, chains.num_steps, n)

        # ---- sharded pool: one independent queue per chip ----
        d = self._data_axis
        num_steps = np.asarray(chains.num_steps)
        # deal sorted rows round-robin (balanced total steps); sentinel
        # padding rows have num_steps=0 and never write — same mask as the
        # plain runner's mesh padding
        perm = deal_deepest_first(num_steps, d)
        safe = np.clip(perm, 0, None)
        fns = np.where(perm[:, None] >= 0, chains.functions[safe], 0)
        dps = np.where(perm[:, None, None] >= 0, chains.deps[safe], -1)
        nst = np.where(perm >= 0, num_steps[safe], 0).astype(np.int32)
        img_idx = np.where(perm >= 0, np.asarray(chains.image_index)[safe], 0).astype(np.int32)

        key = (slots, True)
        if not hasattr(self, "_pool_jits"):
            self._pool_jits = {}
        fn = self._pool_jits.get(key)
        if fn is None:
            from jax.sharding import PartitionSpec as P

            def local_impl(variables, fts, img_idx, fns, dps, nsteps,
                           _slots=slots):
                return chained_forward_pool(
                    self.model, variables, fts, img_idx, fns, dps, nsteps,
                    self.config, self.max_steps, slots=_slots,
                    conf_thresholds=self.conf_thresholds,
                )

            var_specs = jax.tree_util.tree_map(lambda _: P(), self.variables)
            fn = jax.jit(jax.shard_map(
                local_impl, mesh=self.mesh,
                in_specs=(var_specs, P(), P("data"), P("data"), P("data"),
                          P("data")),
                out_specs=ChainState(*(P("data"),) * 6),
                # per-chip while_loop trip counts differ by design (each
                # chip drains its own queue) — disable the varying-axis
                # checker rather than pretend the loops are uniform
                check_vma=False,
            ))
            self._pool_jits[key] = fn
        state = fn(
            self.variables, feats, jnp.asarray(img_idx), jnp.asarray(fns),
            jnp.asarray(dps), jnp.asarray(nst),
        )
        # un-permute on host (sentinel rows drop)
        full = self._empty_outputs(n)
        live = perm >= 0
        src = np.flatnonzero(live)
        dst = perm[live]
        for key_, leaf in zip(
            ("box_cache", "box_mask", "conf_cache", "token_cache",
             "token_branch"),
            (state.box_cache, state.box_mask, state.conf_cache,
             state.token_cache, state.token_branch),
        ):
            full[key_][dst] = np.asarray(leaf)[src]
        last = num_steps - 1
        rows = np.arange(n)
        full["final_tokens"] = full["token_cache"][rows, last]
        full["final_is_token"] = full["token_branch"][rows, last]
        return full

    def _pool_outputs(self, state: ChainState, num_steps, n: int) -> Dict[str, np.ndarray]:
        last = np.asarray(num_steps) - 1
        rows = np.arange(n)
        return {
            "final_tokens": np.asarray(state.token_cache)[rows, last],
            "final_is_token": np.asarray(state.token_branch)[rows, last],
            "box_cache": np.asarray(state.box_cache),
            "box_mask": np.asarray(state.box_mask),
            "conf_cache": np.asarray(state.conf_cache),
            "token_cache": np.asarray(state.token_cache),
            "token_branch": np.asarray(state.token_branch),
        }

    def run_sorted(
        self,
        image_tokens,
        chains: ChainArrays,
        batch: int = 128,
        min_tail: int = 32,
    ) -> Dict[str, np.ndarray]:
        """Depth-SORTED execution with a dynamic loop bound (the serving fast
        path, docs/DESIGN.md §10): questions sort by chain length, each batch
        runs the fori_loop to ITS OWN max depth (a traced bound — one compile
        per batch SIZE, not per depth), so loop-tail waste collapses to the
        in-batch depth spread.  Results — full per-step caches included —
        scatter back to original order; parity with ``run`` is exact.  The
        batch plan (sort, pow2 tails >= ``min_tail``, repeat-last padding) is
        ``infer.plan.plan_sorted`` — the same function the bench schedules
        with.  Device-resident ``image_tokens`` (the HBM feature cache) are
        gathered per batch ON device; only host arrays take the numpy path."""
        from explainable_spatial_vqa_tpu.infer.plan import plan_sorted

        num_steps = np.asarray(chains.num_steps)
        n = len(num_steps)
        full = self._empty_outputs(n)
        on_device = isinstance(image_tokens, jax.Array)
        if not on_device:
            image_tokens = np.asarray(image_tokens)
        last = num_steps - 1
        for depth_val, _size, part, real in plan_sorted(
            num_steps, batch, min_tail, multiple=self._data_axis
        ):
            img = (
                jnp.take(image_tokens, jnp.asarray(part), axis=0)
                if on_device else jnp.asarray(image_tokens[part])
            )
            state = self._run_dyn(
                img,
                jnp.asarray(chains.functions[part]),
                jnp.asarray(chains.deps[part]),
                jnp.asarray(num_steps[part]),
                jnp.asarray(depth_val, jnp.int32),
            )
            idx = part[:real]
            for key, leaf in zip(
                ("box_cache", "box_mask", "conf_cache", "token_cache",
                 "token_branch"),
                (state.box_cache, state.box_mask, state.conf_cache,
                 state.token_cache, state.token_branch),
            ):
                full[key][idx] = np.asarray(leaf)[:real]
            full["final_tokens"][idx] = full["token_cache"][idx, last[idx]]
            full["final_is_token"][idx] = full["token_branch"][idx, last[idx]]
        return full


class Seq2SeqChainRunner:
    """Chained inference for the step seq2seq model.

    Caches are token *sequences* per step.  src for step k = [function] ++
    compact(dep output sequences); decoding is the cached greedy scan.  One
    jit compiles the whole (steps x decode) loop nest.
    """

    def __init__(
        self,
        model,
        variables,
        config: StepSeq2SeqConfig,
        max_steps: int = 28,
        start_token: int = 1,
        end_token: int = 2,
        pad_token: int = 0,
        mesh=None,
    ):
        self.model = model
        self.config = config
        self.max_steps = max_steps
        self.start_token = start_token
        self.end_token = end_token
        self.pad_token = pad_token
        self.mesh = mesh
        if mesh is not None:
            # multi-chip serving, same layout as ExecutorChainRunner: params
            # replicated, batch sharded over "data", zero collectives
            from explainable_spatial_vqa_tpu.parallel.mesh import (
                batch_sharding, replicated,
            )

            self._data_axis = mesh.shape["data"]
            self._batch_shard = batch_sharding(mesh)
            self.variables = jax.device_put(variables, replicated(mesh))
            self._run = jax.jit(
                self._run_impl,
                in_shardings=(self._batch_shard,) * 4,
                out_shardings=self._batch_shard,
            )
        else:
            self._data_axis = 1
            self.variables = variables
            self._run = jax.jit(self._run_impl)

    def _decode(self, memory, memory_mask):
        """Greedy decode with KV cache (mirrors ops.decoding.greedy_decode,
        inlined so the whole chain loop stays in one jit)."""
        model, variables = self.model, self.variables
        cfg = self.config
        batch = memory.shape[0]
        cache = model.apply(variables, memory, cfg.max_tgt_len, method=model.init_cache)
        start = jnp.full((batch,), self.start_token, jnp.int32)
        finished = jnp.zeros((batch,), bool)

        def body(carry, index):
            token, cache, finished = carry
            logits, cache = model.apply(
                variables, token, cache, index, memory_mask, method=model.decode_step
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emitted = jnp.where(finished, self.pad_token, nxt)
            finished = finished | (nxt == self.end_token)
            return (emitted, cache, finished), emitted

        (_, _, _), tokens = jax.lax.scan(
            body, (start, cache, finished), jnp.arange(cfg.max_tgt_len)
        )
        return tokens.T  # (B, T)

    def _run_impl(self, image_tokens, functions, deps, num_steps):
        cfg = self.config
        n = image_tokens.shape[0]
        s = self.max_steps
        t = cfg.max_tgt_len
        cache = jnp.zeros((n, s, t), jnp.int32)  # decoded output tokens per step
        rows = jnp.arange(n)

        def body(k, cache):
            func = functions[:, k]
            parts = [func[:, None]]
            masks = [jnp.ones((n, 1), bool)]
            for d in range(2):
                dep = deps[:, k, d]
                safe = jnp.clip(dep, 0, None)
                seq = cache[rows, safe]  # (N, T)
                valid = (seq != self.pad_token) & (dep >= 0)[:, None]
                parts.append(seq)
                masks.append(valid)
            src = jnp.concatenate(parts, axis=1)
            valid = jnp.concatenate(masks, axis=1)
            src, valid = compact_valid_first(src, valid)
            src = jnp.where(valid, src, self.pad_token)[:, : cfg.max_src_len]
            valid = valid[:, : cfg.max_src_len]

            memory, key_mask = self.model.apply(
                self.variables, image_tokens, src, valid, method=self.model.encode
            )
            decoded = self._decode(memory, key_mask)  # (N, T)
            # strip specials: drop START-less format — decoded starts after
            # <START>; END and beyond already padded by the decode loop
            out_tokens = jnp.where(decoded == self.end_token, self.pad_token, decoded)
            active = (k < num_steps)[:, None]
            return cache.at[:, k].set(jnp.where(active, out_tokens, 0))

        return jax.lax.fori_loop(0, s, body, cache)

    def run(self, image_tokens, chains: ChainArrays) -> Dict[str, np.ndarray]:
        n = chains.functions.shape[0]
        args = (image_tokens, chains.functions, chains.deps, chains.num_steps)
        if self._data_axis > 1 and n % self._data_axis:
            # zero-pad ON HOST, before any device transfer
            from explainable_spatial_vqa_tpu.parallel.mesh import pad_to_multiple

            args = tuple(pad_to_multiple(a, self._data_axis)[0] for a in args)
        cache = np.asarray(self._run(*(jnp.asarray(a) for a in args)))[:n]
        last = np.asarray(chains.num_steps) - 1
        rows = np.arange(len(last))
        return {"step_outputs": cache, "final_outputs": cache[rows, last]}


def run_bucketed_seq2seq(
    runner: "Seq2SeqChainRunner",
    image_tokens,
    chains: ChainArrays,
    buckets: Tuple[int, ...] = (8, 12, 16, 20, 28),
) -> Dict[str, np.ndarray]:
    """Depth-bucketed execution for the seq2seq runner (mirrors
    ExecutorChainRunner.run_bucketed): questions grouped by chain length,
    one compiled loop per bucket depth, outputs scattered back."""
    num_steps = np.asarray(chains.num_steps)
    n = len(num_steps)
    t = runner.config.max_tgt_len
    step_outputs = np.zeros((n, runner.max_steps, t), np.int32)
    final_outputs = np.zeros((n, t), np.int32)
    buckets = tuple(b for b in sorted(set(buckets)) if b <= runner.max_steps)
    if not buckets or buckets[-1] < runner.max_steps:
        buckets = buckets + (runner.max_steps,)
    if not hasattr(runner, "_bucket_runners"):
        runner._bucket_runners = {}
    assigned = np.zeros(n, bool)
    for depth in buckets:
        select = (~assigned) & (num_steps <= depth)
        assigned |= select
        idx = np.flatnonzero(select)
        if idx.size == 0:
            continue
        sub_runner = runner._bucket_runners.get(depth)
        if sub_runner is None:
            sub_runner = Seq2SeqChainRunner(
                runner.model, runner.variables, runner.config, max_steps=depth,
                start_token=runner.start_token, end_token=runner.end_token,
                pad_token=runner.pad_token, mesh=runner.mesh,
            )
            runner._bucket_runners[depth] = sub_runner
        sub = ChainArrays(
            chains.image_index[idx], chains.functions[idx, :depth],
            chains.deps[idx, :depth], num_steps[idx], [],
        )
        out = sub_runner.run(np.asarray(image_tokens)[idx], sub)
        step_outputs[idx, :depth] = out["step_outputs"]
        final_outputs[idx] = out["final_outputs"]
    return {"step_outputs": step_outputs, "final_outputs": final_outputs}
