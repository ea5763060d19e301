"""Vectorized chained inference: parity with sequential reference-style
execution, masking, and cache plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig, StepSeq2SeqConfig
from explainable_spatial_vqa_tpu.infer.chain import (
    ExecutorChainRunner,
    Seq2SeqChainRunner,
    compact_valid_first,
)
from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
from explainable_spatial_vqa_tpu.models.step_executor import StepExecutorSeq2Seq
from explainable_spatial_vqa_tpu.ops.decoding import greedy_decode
from explainable_spatial_vqa_tpu.train.datasets import ChainArrays


def test_compact_valid_first():
    tokens = jnp.asarray([[5, 0, 7, 0, 9]])
    valid = jnp.asarray([[True, False, True, False, True]])
    out, mask = compact_valid_first(tokens, valid)
    np.testing.assert_array_equal(np.asarray(out[0, :3]), [5, 7, 9])
    np.testing.assert_array_equal(np.asarray(mask[0]), [True, True, True, False, False])


def _chains(n=2, max_steps=3):
    functions = np.zeros((n, max_steps), np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    # q0: scene -> filter(dep 0) -> count(dep 1);  q1: scene -> count(dep 0)
    functions[0, :3] = [1, 2, 3]
    deps[0, 1, 0] = 0
    deps[0, 2, 0] = 1
    functions[1, :2] = [1, 3]
    deps[1, 1, 0] = 0
    num_steps = np.asarray([3, 2], np.int32)
    return ChainArrays(
        image_index=np.arange(n, dtype=np.int32),
        functions=functions,
        deps=deps,
        num_steps=num_steps,
        answers=["x"] * n,
    )


def test_executor_chain_runner_smoke():
    cfg = ExecutorConfig(
        vocab_size=16, d_model=32, num_heads=4, encoder_layers=1, box_decoder_layers=1,
        num_queries=3, num_image_tokens=4, image_feature_dim=8, max_input_boxes=4,
        token_classes=8,
    )
    model = ProgramExecutor(cfg)
    img = jnp.asarray(np.random.RandomState(0).rand(2, 4, 8), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        img,
        jnp.zeros((2, 4, 4)),
        jnp.ones((2, 4), bool),
        jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    runner = ExecutorChainRunner(model, variables, cfg, max_steps=3)
    out = runner.run(img, _chains())
    assert out["final_tokens"].shape == (2,)
    assert out["box_cache"].shape == (2, 3, 3, 4)
    # q1 has only 2 steps: nothing written at step 2
    assert not out["box_mask"][1, 2].any()
    assert not out["token_branch"][1, 2]


def test_seq2seq_chain_matches_sequential():
    """The fori_loop engine must equal step-by-step sequential execution with
    the same compaction/decoding logic."""
    cfg = StepSeq2SeqConfig(
        vocab_size=16, d_model=16, num_heads=2, encoder_layers=1, decoder_layers=1,
        ffn_dim=32, max_src_len=8, max_tgt_len=4, num_image_tokens=4, image_feature_dim=8,
    )
    model = StepExecutorSeq2Seq(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 4, 8), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, jnp.zeros((2, 5), jnp.int32), jnp.zeros((2, 3), jnp.int32)
    )
    chains = _chains()
    runner = Seq2SeqChainRunner(model, variables, cfg, max_steps=3)
    out = runner.run(img, chains)

    # sequential per-question execution with identical semantics
    for qi in range(2):
        cache = {}
        for k in range(chains.num_steps[qi]):
            src = [int(chains.functions[qi, k])]
            for d in range(2):
                dep = int(chains.deps[qi, k, d])
                if dep >= 0:
                    src.extend(cache[dep])
            src = src[: cfg.max_src_len]
            src_arr = jnp.zeros((1, cfg.max_src_len), jnp.int32).at[0, : len(src)].set(
                jnp.asarray(src, jnp.int32)
            )
            valid = jnp.zeros((1, cfg.max_src_len), bool).at[0, : len(src)].set(True)
            memory, key_mask = model.apply(
                variables, img[qi : qi + 1], src_arr, valid, method=model.encode
            )
            decoded = np.asarray(
                greedy_decode(model, variables, memory, key_mask, 1, cfg.max_tgt_len,
                              end_token=2, pad_token=0)
            )[0].copy()
            decoded[decoded == 2] = 0
            cache[k] = [int(t) for t in decoded if t != 0]
        expected = np.zeros(cfg.max_tgt_len, np.int32)
        got = out["step_outputs"][qi, chains.num_steps[qi] - 1]
        seq = cache[int(chains.num_steps[qi]) - 1]
        expected[: len(seq)] = seq
        got_compact = got[got != 0]
        np.testing.assert_array_equal(got_compact, np.asarray(seq))


def test_bucketed_matches_plain():
    """Depth-bucketed execution must produce identical final outputs."""
    cfg = ExecutorConfig(
        vocab_size=16, d_model=32, num_heads=4, encoder_layers=1, box_decoder_layers=1,
        num_queries=3, num_image_tokens=4, image_feature_dim=8, max_input_boxes=4,
        token_classes=8,
    )
    model = ProgramExecutor(cfg)
    rng = np.random.RandomState(0)
    n = 6
    img = jnp.asarray(rng.rand(n, 4, 8), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, jnp.zeros((n, 4, 4)), jnp.ones((n, 4), bool),
        jnp.zeros((n, 3), jnp.int32), jnp.ones((n, 3), bool),
    )
    max_steps = 6
    functions = rng.randint(1, 10, (n, max_steps)).astype(np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = np.asarray([2, 3, 4, 5, 6, 2], np.int32)
    for i in range(n):
        for k in range(1, num_steps[i]):
            deps[i, k, 0] = k - 1
    chains = ChainArrays(np.arange(n, dtype=np.int32), functions, deps, num_steps, [])

    runner = ExecutorChainRunner(model, variables, cfg, max_steps=max_steps)
    plain = runner.run(img, chains)
    bucketed = runner.run_bucketed(img, chains, buckets=(3, 6))
    np.testing.assert_array_equal(bucketed["final_tokens"], plain["final_tokens"])
    np.testing.assert_array_equal(bucketed["final_is_token"], plain["final_is_token"])
    # the full per-step caches are scattered back too (so box-P/R tallies
    # ride the bucketed fast path); steps past num_steps are inactive in
    # both paths, so the caches must agree everywhere
    for key in ("box_mask", "token_cache", "token_branch"):
        np.testing.assert_array_equal(bucketed[key], plain[key], err_msg=key)
    for key in ("box_cache", "conf_cache"):
        np.testing.assert_allclose(bucketed[key], plain[key], atol=1e-6, err_msg=key)

    # depth-SORTED execution with a dynamic loop bound (the serving fast
    # path) must also match exactly, including tail-batch padding — for both
    # image-token sources: device-resident jax.Array (per-batch on-device
    # gather, the HBM-feature-cache path) and host numpy
    for b in (4, 6):
        for img_in in (img, np.asarray(img)):
            by_depth = runner.run_sorted(img_in, chains, batch=b, min_tail=2)
            for key in ("final_tokens", "final_is_token", "box_mask",
                        "token_cache", "token_branch"):
                np.testing.assert_array_equal(by_depth[key], plain[key],
                                              err_msg=f"{key} batch={b}")
            for key in ("box_cache", "conf_cache"):
                np.testing.assert_allclose(by_depth[key], plain[key],
                                           atol=1e-6,
                                           err_msg=f"{key} batch={b}")


def test_pool_matches_plain():
    """Continuous-batching execution (run_pool) must equal the plain runner
    exactly: every question is admitted to one slot once, deps read earlier
    steps of the same row, finished rows retire mid-loop — none of which may
    change any (row, step) output.  Covers queue cycling (slots < n), a
    drain tail (slots > remaining), shared images (the per-iteration image
    gather), and two-dependency steps."""
    cfg = ExecutorConfig(
        vocab_size=16, d_model=32, num_heads=4, encoder_layers=1,
        box_decoder_layers=1, num_queries=3, num_image_tokens=4,
        image_feature_dim=8, max_input_boxes=4, token_classes=8,
    )
    model = ProgramExecutor(cfg)
    rng = np.random.RandomState(7)
    m, n, max_steps = 3, 10, 6
    feats = rng.rand(m, 4, 8).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats[:2]), jnp.zeros((2, 4, 4)),
        jnp.ones((2, 4), bool), jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    functions = rng.randint(1, 10, (n, max_steps)).astype(np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = np.asarray([2, 6, 3, 1, 5, 4, 6, 2, 3, 5], np.int32)
    for i in range(n):
        for k in range(1, num_steps[i]):
            deps[i, k, 0] = k - 1
            if k >= 2 and (i + k) % 3 == 0:  # union-style two-dep joins
                deps[i, k, 1] = k - 2
    image_index = rng.randint(0, m, n).astype(np.int32)
    chains = ChainArrays(image_index, functions, deps, num_steps, [])

    runner = ExecutorChainRunner(model, variables, cfg, max_steps=max_steps)
    plain = runner.run(jnp.asarray(feats[image_index]), chains)
    for slots in (3, 4, 16):
        pool = runner.run_pool(feats, chains, slots=slots)
        for key in ("final_tokens", "final_is_token", "box_mask",
                    "token_cache", "token_branch"):
            np.testing.assert_array_equal(pool[key], plain[key],
                                          err_msg=f"{key} slots={slots}")
        for key in ("box_cache", "conf_cache"):
            np.testing.assert_allclose(pool[key], plain[key], atol=1e-5,
                                       err_msg=f"{key} slots={slots}")

    # the point of the pool: executed slot-steps ~ useful steps + drain
    # tail, strictly under the plain runner's n x max_steps
    from explainable_spatial_vqa_tpu.infer.chain import chained_forward_pool

    _state, iters = jax.jit(
        lambda f, ii, fn, dp, ns: chained_forward_pool(
            model, variables, f, ii, fn, dp, ns, cfg, max_steps,
            slots=4, return_iterations=True,
        )
    )(jnp.asarray(feats), jnp.asarray(image_index),
      jnp.asarray(functions), jnp.asarray(deps), jnp.asarray(num_steps))
    useful = int(num_steps.sum())
    assert int(iters) >= -(-useful // 4)  # can't beat perfect packing
    assert int(iters) * 4 < n * max_steps  # beats the naive full-depth plan


@pytest.mark.parametrize("roi_sim,count_embed",
                         [(False, False), (True, False), (False, True)])
def test_serving_paths_match_plain_box_roi(roi_sim, count_embed):
    """run_sorted and run_pool must stay exact with ``box_roi=True`` (and
    with the ``roi_sim`` content-similarity channel or the ``count_embed``
    set-size channel on top): the ROI injection pools the positioned image
    tokens under each dependency box (models/executor.py encode), the count
    channel reads the per-step gathered box_mask, and the serving paths
    re-gather image tokens and masks per batch/iteration — this interaction
    was unpinned (VERDICT r3 #3/#4).  Same parity contract as the
    plain-vs-sorted/pool tests."""
    cfg = ExecutorConfig(
        vocab_size=16, d_model=32, num_heads=4, encoder_layers=1,
        box_decoder_layers=1, num_queries=3, num_image_tokens=4,
        image_feature_dim=8, max_input_boxes=4, token_classes=8,
        box_roi=True, roi_sim=roi_sim, count_embed=count_embed,
    )
    model = ProgramExecutor(cfg)
    rng = np.random.RandomState(11)
    m, n, max_steps = 3, 10, 6
    feats = rng.rand(m, 4, 8).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats[:2]), jnp.zeros((2, 4, 4)),
        jnp.ones((2, 4), bool), jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    if roi_sim:
        # sim_embed is zero-init (exact no-op); randomize it so the parity
        # check actually exercises the similarity channel numerically.
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        variables["params"]["sim_embed"]["kernel"] = (
            jax.random.normal(
                jax.random.PRNGKey(3),
                variables["params"]["sim_embed"]["kernel"].shape) * 0.1)
    if count_embed:
        # count_embed is zero-init (exact no-op); randomize it so the
        # per-step gathered box_mask count actually moves the outputs.
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        variables["params"]["count_embed"]["embedding"] = (
            jax.random.normal(
                jax.random.PRNGKey(4),
                variables["params"]["count_embed"]["embedding"].shape) * 0.1)
    functions = rng.randint(1, 10, (n, max_steps)).astype(np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = np.asarray([2, 6, 3, 1, 5, 4, 6, 2, 3, 5], np.int32)
    for i in range(n):
        for k in range(1, num_steps[i]):
            deps[i, k, 0] = k - 1
            if k >= 2 and (i + k) % 3 == 0:
                deps[i, k, 1] = k - 2
    image_index = rng.randint(0, m, n).astype(np.int32)
    chains = ChainArrays(image_index, functions, deps, num_steps, [])

    runner = ExecutorChainRunner(model, variables, cfg, max_steps=max_steps)
    plain = runner.run(jnp.asarray(feats[image_index]), chains)
    # the ROI path must actually fire: dependency boxes upstream are real
    assert plain["box_mask"].any()
    sorted_out = runner.run_sorted(feats[image_index], chains, batch=4,
                                   min_tail=2)
    pool = runner.run_pool(feats, chains, slots=4)
    for name, out in (("sorted", sorted_out), ("pool", pool)):
        for key in ("final_tokens", "final_is_token", "box_mask",
                    "token_cache", "token_branch"):
            np.testing.assert_array_equal(out[key], plain[key],
                                          err_msg=f"{key} ({name})")
        for key in ("box_cache", "conf_cache"):
            np.testing.assert_allclose(out[key], plain[key], atol=1e-5,
                                       err_msg=f"{key} ({name})")


def test_executor_chain_two_box_deps_matches_sequential():
    """A union-style step (TWO box-output dependencies — thesis Table 4.3's
    union/intersect) must equal per-question sequential execution: both
    dependencies' box sets concatenated, compacted valid-first, truncated to
    max_input_boxes (infer.chain.gather_step_inputs semantics)."""
    cfg = ExecutorConfig(
        vocab_size=16, d_model=32, num_heads=4, encoder_layers=1,
        box_decoder_layers=1, num_queries=3, num_image_tokens=4,
        image_feature_dim=8, max_input_boxes=4, token_classes=8,
    )
    model = ProgramExecutor(cfg)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 4, 8), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, jnp.zeros((1, 4, 4)), jnp.ones((1, 4), bool),
        jnp.zeros((1, 3), jnp.int32), jnp.ones((1, 3), bool),
    )
    # scene -> filter(0) -> union(0, 1) -> count(2)
    max_steps = 4
    functions = np.asarray([[1, 2, 4, 3]], np.int32)
    deps = np.full((1, max_steps, 2), -1, np.int64)
    deps[0, 1, 0] = 0
    deps[0, 2] = [0, 1]
    deps[0, 3, 0] = 2
    chains = ChainArrays(np.zeros(1, np.int32), functions, deps,
                         np.asarray([4], np.int32), [""])

    runner = ExecutorChainRunner(model, variables, cfg, max_steps=max_steps)
    out = runner.run(img, chains)

    # sequential replica with numpy cache bookkeeping
    img_pre = model.apply(variables, img, method=model.precompute_image)
    q = cfg.num_queries
    box_cache = np.zeros((max_steps, q, 4), np.float32)
    box_mask = np.zeros((max_steps, q), bool)
    token_cache = np.zeros(max_steps, np.int32)
    token_branch = np.zeros(max_steps, bool)
    for k in range(max_steps):
        all_boxes = np.zeros((0, 4), np.float32)
        text = [int(functions[0, k])]
        tmask = [True]
        for d in range(2):
            dep = int(deps[0, k, d])
            bx = box_cache[dep] if dep >= 0 else np.zeros((q, 4), np.float32)
            bm = box_mask[dep] if dep >= 0 else np.zeros(q, bool)
            all_boxes = np.concatenate([all_boxes, bx[bm]], axis=0)
            tok_ok = dep >= 0 and token_branch[dep]
            text.append(int(token_cache[dep]) if tok_ok else 0)
            tmask.append(bool(tok_ok))
        boxes_in = np.zeros((1, cfg.max_input_boxes, 4), np.float32)
        take = min(cfg.max_input_boxes, len(all_boxes))
        boxes_in[0, :take] = all_boxes[:take]
        bmask_in = (np.arange(cfg.max_input_boxes) < take)[None]
        step_out = model.apply(
            variables, img_pre, jnp.asarray(boxes_in), jnp.asarray(bmask_in),
            jnp.asarray([text], jnp.int32), jnp.asarray([tmask], bool),
            image_precomputed=True,
        )
        is_box = int(np.argmax(np.asarray(step_out["routing_logits"])[0])) == 0
        if is_box:
            box_cache[k] = np.asarray(step_out["pred_boxes"])[0]
            box_mask[k] = (
                np.asarray(step_out["pred_conf"])[0] >= cfg.conf_threshold
            )
        else:
            token_cache[k] = int(np.argmax(np.asarray(step_out["token_logits"])[0]))
            token_branch[k] = True

    np.testing.assert_array_equal(out["box_mask"][0], box_mask)
    np.testing.assert_array_equal(out["token_cache"][0], token_cache)
    np.testing.assert_array_equal(out["token_branch"][0], token_branch)
    masked = np.where(box_mask[..., None], box_cache, 0.0)
    got = np.where(out["box_mask"][0][..., None], out["box_cache"][0], 0.0)
    np.testing.assert_allclose(got, masked, atol=1e-5)


def test_seq2seq_bucketed_matches_plain():
    from explainable_spatial_vqa_tpu.infer.chain import run_bucketed_seq2seq

    cfg = StepSeq2SeqConfig(
        vocab_size=16, d_model=16, num_heads=2, encoder_layers=1, decoder_layers=1,
        ffn_dim=32, max_src_len=8, max_tgt_len=4, num_image_tokens=4, image_feature_dim=8,
    )
    model = StepExecutorSeq2Seq(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 4, 8), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img, jnp.zeros((2, 5), jnp.int32), jnp.zeros((2, 3), jnp.int32)
    )
    chains = _chains()
    runner = Seq2SeqChainRunner(model, variables, cfg, max_steps=3)
    plain = runner.run(img, chains)
    bucketed = run_bucketed_seq2seq(runner, img, chains, buckets=(2, 3))
    np.testing.assert_array_equal(bucketed["final_outputs"], plain["final_outputs"])


def test_conf_threshold_vector_parity_and_gating():
    """A conf_thresholds vector with every entry equal to the config scalar
    must be EXACTLY the scalar runner across run/run_sorted/run_pool; making
    one function's threshold stricter changes which boxes propagate."""
    cfg = ExecutorConfig(
        vocab_size=16, d_model=32, num_heads=4, encoder_layers=1,
        box_decoder_layers=1, num_queries=3, num_image_tokens=4,
        image_feature_dim=8, max_input_boxes=4, token_classes=8,
    )
    model = ProgramExecutor(cfg)
    rng = np.random.RandomState(5)
    m, n, max_steps = 3, 10, 6
    feats = rng.rand(m, 4, 8).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats[:2]), jnp.zeros((2, 4, 4)),
        jnp.ones((2, 4), bool), jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    functions = rng.randint(1, 10, (n, max_steps)).astype(np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = np.asarray([2, 6, 3, 1, 5, 4, 6, 2, 3, 5], np.int32)
    for i in range(n):
        for k in range(1, num_steps[i]):
            deps[i, k, 0] = k - 1
    image_index = rng.randint(0, m, n).astype(np.int32)
    chains = ChainArrays(image_index, functions, deps, num_steps, [])

    plain = ExecutorChainRunner(model, variables, cfg, max_steps=max_steps)
    const_vec = np.full(16, cfg.conf_threshold, np.float32)
    vec_runner = ExecutorChainRunner(
        model, variables, cfg, max_steps=max_steps, conf_thresholds=const_vec)

    base = plain.run(jnp.asarray(feats[image_index]), chains)
    for name, out in (
        ("run", vec_runner.run(jnp.asarray(feats[image_index]), chains)),
        ("sorted", vec_runner.run_sorted(feats[image_index], chains, batch=4,
                                         min_tail=2)),
        ("pool", vec_runner.run_pool(feats, chains, slots=4)),
    ):
        for key in ("final_tokens", "final_is_token", "box_mask",
                    "token_cache", "token_branch"):
            np.testing.assert_array_equal(out[key], base[key],
                                          err_msg=f"{key} ({name})")
        for key in ("box_cache", "conf_cache"):
            np.testing.assert_allclose(out[key], base[key], atol=1e-5,
                                       err_msg=f"{key} ({name})")

    # impossible threshold for every function: no box ever propagates,
    # box_mask must be all-False everywhere (the gate is live)
    assert base["box_mask"].any()
    strict = ExecutorChainRunner(
        model, variables, cfg, max_steps=max_steps,
        conf_thresholds=np.full(16, 1.1, np.float32))
    gated = strict.run(jnp.asarray(feats[image_index]), chains)
    assert not gated["box_mask"].any()
    # ...and per-FUNCTION: raising only some functions' bars flips only
    # steps of those functions
    sel_vec = np.full(16, cfg.conf_threshold, np.float32)
    sel_vec[3] = 1.1
    sel = ExecutorChainRunner(
        model, variables, cfg, max_steps=max_steps, conf_thresholds=sel_vec)
    out3 = sel.run(jnp.asarray(feats[image_index]), chains)
    steps_fn3 = functions == 3
    active = np.arange(max_steps)[None, :] < np.asarray(num_steps)[:, None]
    assert not out3["box_mask"][steps_fn3].any()
    # some non-fn3 active step still propagates boxes (upstream changes can
    # cascade, but fn3 gating must not blanket-kill everything)
    assert out3["box_mask"][active & ~steps_fn3].any()
