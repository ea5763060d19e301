#!/usr/bin/env python
"""End-to-end throughput benchmark: CLEVR-shaped QA pairs/sec/chip.

Pipeline measured (the BASELINE.json north-star path): program generator
greedy decode (question -> 27 program tokens) + thesis executor chained
step execution (per program step: fused image/box/text forward, routed
box-set or token output, dependencies threaded through HBM caches).

``value`` = QA pairs/sec/chip of the vectorized TPU pipeline.
``vs_baseline`` = value / (throughput of the reference *algorithm* — one
question at a time, one step at a time, batch=1 — measured on CPU, the
reference's end-to-end deployment mode per BASELINE.md).
``mfu`` = analytic useful FLOPs (actual chain depths, not padded loop
iterations) / wall time / chip peak.

Programs are drawn from CLEVR's structural question families (single filter
chains, relate hops, same-attribute hops, and two-branch attribute/number
comparisons joined by a 2-input node), with depths up to 27 steps — the
shapes of the real question distribution (the checked-in fixtures contain a
depth-11 two-branch greater_than question of exactly this form,
/root/reference/code/examples/CLEVR_train_questions_first.json) — executed
via the continuous-batching slot pool (BENCH_MODE=pool, default —
finished questions retire mid-loop, docs/DESIGN.md §10.2) or depth-SORTED
with per-batch dynamic loop bounds (BENCH_MODE=sorted), so short programs
do not pay for deep loop tails.  Weights are random —
throughput does not depend on weight values.  Set BENCH_N /
BENCH_BASELINE_N to scale the run.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def build_pipeline(force_fp32: bool = False):
    import jax
    import jax.numpy as jnp

    from explainable_spatial_vqa_tpu.core.config import ExecutorConfig, GeneratorConfig
    from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
    from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
    from explainable_spatial_vqa_tpu.models.generator import ProgramGenerator
    from explainable_spatial_vqa_tpu.train.datasets import ChainArrays

    gen_cfg = GeneratorConfig(vocab_size=96, program_vocab_size=45, program_len=27)
    exe_cfg = ExecutorConfig(vocab_size=64, token_classes=32)

    use_bf16 = os.environ.get("BENCH_DTYPE", "bf16") == "bf16" and not force_fp32
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    generator = ProgramGenerator(gen_cfg, dtype=dtype)
    executor = ProgramExecutor(exe_cfg, dtype=dtype)

    rng = np.random.RandomState(0)
    q_init = jnp.asarray(rng.randint(4, 96, (2, 46)), jnp.int32)
    gen_vars = generator.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        q_init, jnp.zeros((2, 27), jnp.int32),
    )
    exe_args = (
        jnp.zeros((2, exe_cfg.num_image_tokens, exe_cfg.image_feature_dim), jnp.float32),
        jnp.zeros((2, exe_cfg.max_input_boxes, 4), jnp.float32),
        jnp.ones((2, exe_cfg.max_input_boxes), bool),
        jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    exe_vars = executor.init(jax.random.PRNGKey(2), *exe_args)
    return generator, gen_vars, gen_cfg, executor, exe_vars, exe_cfg


_FN_IDS = {}


def _fid(name: str) -> int:
    if name not in _FN_IDS:
        _FN_IDS[name] = len(_FN_IDS) + 1
    return _FN_IDS[name]


def _clevr_branch(rng, allow_hops=True):
    """One CLEVR filter chain as [(fn, dep0, dep1)] with local indices.

    scene -> 1-3 filters, optionally extended by a relate or same_* hop
    (unique -> hop -> 1-2 more filters), as in CLEVR's question grammar."""
    attrs = ("size", "color", "material", "shape")
    nodes = [("scene", -1, -1)]
    for _ in range(rng.randint(1, 4)):
        nodes.append((f"filter_{attrs[rng.randint(4)]}", len(nodes) - 1, -1))
    hops = 0
    if allow_hops:
        hops = int(rng.rand() < 0.6) + int(rng.rand() < 0.25)  # 0, 1 or 2 hops
    for _ in range(hops):
        hop = "relate" if rng.rand() < 0.7 else f"same_{attrs[rng.randint(4)]}"
        nodes.append(("unique", len(nodes) - 1, -1))
        nodes.append((hop, len(nodes) - 1, -1))
        for _ in range(rng.randint(1, 3)):
            nodes.append((f"filter_{attrs[rng.randint(4)]}", len(nodes) - 1, -1))
    return nodes


def _clevr_program(rng):
    """A structurally-CLEVR program as [(fn, dep0, dep1)].

    Families + weights approximate the CLEVR question-type mix
    (query/exist/count/compare-attribute/compare-number); two-branch compares
    produce the 2-input DAG joins (equal_*/greater/less) that the fixture
    question exhibits."""
    attrs = ("size", "color", "material", "shape")
    fam = rng.choice(
        ["query", "exist", "count", "compare_attr", "compare_num"],
        p=[0.35, 0.15, 0.15, 0.20, 0.15],
    )
    if fam in ("query", "exist", "count"):
        nodes = _clevr_branch(rng)
        if fam == "query":
            nodes.append(("unique", len(nodes) - 1, -1))
            nodes.append((f"query_{attrs[rng.randint(4)]}", len(nodes) - 1, -1))
        else:
            nodes.append((fam, len(nodes) - 1, -1))
        return nodes
    # two-branch comparisons
    b1 = _clevr_branch(rng)
    b2 = _clevr_branch(rng)
    nodes = list(b1)
    off = len(nodes)

    def shift(node):
        fn, d0, d1 = node
        return (fn, d0 + off if d0 >= 0 else -1, d1 + off if d1 >= 0 else -1)

    nodes += [shift(nd) for nd in b2]
    if fam == "compare_num":
        # count each branch, then compare
        nodes.append(("count", len(b1) - 1, -1))
        c1 = len(nodes) - 1
        nodes.append(("count", off + len(b2) - 1, -1))
        c2 = len(nodes) - 1
        cmp_fn = ["greater_than", "less_than", "equal_integer"][rng.randint(3)]
        nodes.append((cmp_fn, c1, c2))
    else:
        attr = attrs[rng.randint(4)]
        nodes.append(("unique", len(b1) - 1, -1))
        nodes.append((f"query_{attr}", len(nodes) - 1, -1))
        q1 = len(nodes) - 1
        nodes.append(("unique", off + len(b2) - 1, -1))
        nodes.append((f"query_{attr}", len(nodes) - 1, -1))
        q2 = len(nodes) - 1
        nodes.append((f"equal_{attr}", q1, q2))
    return nodes


def synth_questions(n, exe_cfg, max_steps=27, seed=0):
    """CLEVR-shaped synthetic eval set: features + questions + chains with
    the real question families' depth distribution and DAG shapes."""
    from explainable_spatial_vqa_tpu.train.datasets import ChainArrays

    rng = np.random.RandomState(seed)
    num_images = max(1, n // 10)
    features = rng.rand(num_images, exe_cfg.num_image_tokens, exe_cfg.image_feature_dim).astype(
        np.float32
    )
    questions = rng.randint(4, 96, (n, 46)).astype(np.int32)
    functions = np.zeros((n, max_steps), np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = np.zeros(n, np.int32)
    for i in range(n):
        nodes = _clevr_program(rng)
        while len(nodes) > max_steps:
            nodes = _clevr_program(rng)
        num_steps[i] = len(nodes)
        for k, (fn, d0, d1) in enumerate(nodes):
            functions[i, k] = _fid(fn)
            deps[i, k, 0] = d0
            deps[i, k, 1] = d1
    image_index = rng.randint(0, num_images, n).astype(np.int32)
    chains = ChainArrays(image_index, functions, deps, num_steps, [""] * n)
    return features, questions, chains


def flop_components(gen_cfg, exe_cfg, q_len=46):
    """Per-question forward-FLOP building blocks (2*MACs, matmul terms only;
    elementwise/softmax/LN omitted, <2% at these shapes).  Returns a dict of
    {gen_encode, gen_dec_step, exe_precompute, exe_step} so callers (the mfu
    numerator here; scripts/mfu_decomposition.py's segment accounting) share
    one formula."""
    h, e = gen_cfg.hidden_dim, gen_cfg.embed_dim
    # encoder: bi-LSTM, layer 0 input e, upper layers input 2h
    lstm = lambda cin: 2 * 4 * h * (cin + h)  # noqa: E731
    enc_step = 2 * (lstm(e) + (gen_cfg.encoder_layers - 1) * lstm(2 * h))
    # decoder: layer 0 input e, upper layers input h; + output projection
    dec_step = (
        lstm(e) + (gen_cfg.decoder_layers - 1) * lstm(h)
        + 2 * h * gen_cfg.program_vocab_size
        + 2 * 2 * q_len * h  # Luong dot-product scores + context
    )

    d = exe_cfg.d_model
    L = 1 + exe_cfg.num_image_tokens + exe_cfg.max_input_boxes + 3
    ffn = 4 * d
    enc_layer = (
        4 * 2 * L * d * d        # qkvo projections
        + 2 * 2 * L * L * d      # scores + apply
        + 2 * 2 * L * d * ffn    # feed-forward
    )
    Q = exe_cfg.num_queries
    dec_layer = (
        4 * 2 * Q * d * d        # self-attn qkvo
        + 2 * 2 * Q * Q * d
        + 2 * 2 * Q * d * d      # cross q + out
        + 2 * 2 * L * d * d      # cross k + v over memory
        + 2 * 2 * Q * L * d      # cross scores + apply
        + 2 * 2 * Q * d * ffn
    )
    per_step = (
        exe_cfg.encoder_layers * enc_layer
        + exe_cfg.box_decoder_layers * dec_layer
        + 2 * exe_cfg.max_input_boxes * d * (4 + d)  # box MLP
    )
    precompute = 2 * exe_cfg.num_image_tokens * exe_cfg.image_feature_dim * d
    return {
        "gen_encode": q_len * enc_step,
        "gen_dec_step": dec_step,
        "exe_precompute": precompute,
        "exe_step": per_step,
    }


def analytic_flops_per_question(gen_cfg, exe_cfg, q_len=46, steps=1):
    """Forward FLOPs for one question with ``steps`` executed chain steps
    (USEFUL accounting — see :func:`flop_components` for the terms)."""
    c = flop_components(gen_cfg, exe_cfg, q_len)
    # useful decode length for an S-step chain is ~S tokens + END; the
    # pipeline decodes full program_len (it cannot know S pre-generation),
    # so counting steps+2 keeps the mfu numerator conservative
    gen_flops = c["gen_encode"] + min(gen_cfg.program_len, steps + 2) * c["gen_dec_step"]
    return gen_flops + c["exe_precompute"] + steps * c["exe_step"]


# Batch planning is SHARED with serving (ExecutorChainRunner.run_sorted)
# so the benched plan IS the served plan; tests/test_bench_plan.py pins it.
from explainable_spatial_vqa_tpu.infer.plan import (  # noqa: E402
    plan_buckets, plan_sorted,
)


def run_vectorized(n, batch, device):
    import jax
    import jax.numpy as jnp

    from explainable_spatial_vqa_tpu.infer.chain import chained_forward

    generator, gen_vars, gen_cfg, executor, exe_vars, exe_cfg = build_pipeline()
    features, questions, chains = synth_questions(n, exe_cfg)
    max_steps = chains.functions.shape[1]

    # Features are cached in HBM once (the thesis image-feature cache; in
    # deployment the extractor writes them straight to device memory) and
    # gathered per batch by index ON DEVICE — re-uploading 100MB of features
    # per batch over PCIe would dominate everything else.  The upload is
    # chunked: the axon tunnel rejects single transfers >~100 MB (HTTP 413).
    def device_put_chunked(arr, chunk_bytes=64 << 20):
        if arr.nbytes <= chunk_bytes:
            return jax.device_put(jnp.asarray(arr))
        rows = max(1, chunk_bytes // max(arr.nbytes // arr.shape[0], 1))
        parts = [
            jax.device_put(jnp.asarray(arr[i : i + rows]))
            for i in range(0, arr.shape[0], rows)
        ]
        return jnp.concatenate(parts, axis=0)

    features_dev = device_put_chunked(features)
    questions_dev = jax.device_put(jnp.asarray(questions))
    image_index_dev = jax.device_put(jnp.asarray(chains.image_index))
    functions_dev = jax.device_put(jnp.asarray(chains.functions))
    deps_dev = jax.device_put(jnp.asarray(chains.deps))
    num_steps_dev = jax.device_put(jnp.asarray(chains.num_steps))

    # Depth-SORTED batches with a DYNAMIC loop bound (r3 redesign, measured
    # in docs/DESIGN.md §10): questions sort by chain depth and each batch's
    # chained fori_loop runs to that batch's own max depth as a TRACED bound
    # — one compile per batch SIZE (2-3 total) instead of per bucket depth,
    # and loop-tail waste collapses from the bucket-ceiling gap (~25% of
    # executed steps under the r2 edges) to the in-batch depth spread.
    # Chain depth is NOT oracle knowledge: real serving parses the generated
    # program before chaining, so its exact depth is known pre-execution
    # (infer.pipeline.programs_to_chains); only capping GENERATOR decode
    # length would be (that cap was reverted in 6583a68).
    # TAIL batches still compile at the next power-of-two >= 32: per-step
    # TFLOP/s is flat across batch sizes, so padding the deep tail to the
    # full `batch` wastes the most expensive rows.
    # The WHOLE per-batch pipeline (question gather -> program generation ->
    # feature gather -> chained execution) is one jit per batch: the axon
    # dispatch round-trip is ~5.5 ms, so the r1 structure (8 eager/jitted
    # calls per batch) paid ~40 ms/batch in tunnel latency alone.
    num_steps_np = np.asarray(chains.num_steps)

    # The DATA caches enter as jit ARGUMENTS (device-array handles), not
    # closure constants: the axon tunnel serializes closure constants
    # into the compile request body, and the feature cache grows with N
    # (N=2048 -> ~164 MB -> HTTP 413 on top of the 151 MB of weights).
    # The weights stay closed over — they're N-independent and constant
    # folding them avoids per-call pytree-arg overhead on every dispatch.
    #
    # Program generation runs ONCE for the WHOLE eval set, not once per
    # chain batch (r3; this mirrors InferencePipeline.run, which must
    # generate every program before the host parse that yields chain
    # depths).  The generator is a sequential LSTM scan — per-iteration
    # latency-bound, nearly batch-size-independent — so one N-row decode
    # costs barely more than one 128-row decode and replaces N/128 of
    # them.  It decodes FULL program_len: real serving cannot know a
    # question's chain depth before generating its program, so capping
    # decode by the (GT-derived) depth would be oracle knowledge the
    # baseline doesn't get.
    def gen_all_impl(qs):
        return generator.apply(gen_vars, qs, method=generator.generate)

    gen_all = jax.jit(gen_all_impl)

    def batch_step(sel, depth, feats, img_idx, fns, dps, nsteps):
        img = jnp.take(feats, jnp.take(img_idx, sel, axis=0), axis=0)
        return chained_forward(
            executor, exe_vars, img,
            jnp.take(fns, sel, axis=0),
            jnp.take(dps, sel, axis=0),
            jnp.take(nsteps, sel, axis=0),
            exe_cfg, max_steps=max_steps, active_steps=depth,
        )

    batch_fn = jax.jit(batch_step)  # re-specializes per batch SIZE (2-3)
    plan = []
    for depth, _size, part, real in plan_sorted(chains.num_steps, batch):
        plan.append((jax.device_put(jnp.asarray(part)),
                     jax.device_put(jnp.asarray(depth, jnp.int32)), real))

    shared = (features_dev, image_index_dev, functions_dev,
              deps_dev, num_steps_dev)

    # BENCH_MODE=pool: the continuous-batching path (docs/DESIGN.md §10.2)
    # — ONE jitted while_loop over `batch` slots for the whole set, finished
    # questions retiring mid-loop, vs the default depth-sorted batch plan.
    mode = os.environ.get("BENCH_MODE", "pool")
    if mode == "pool":
        from explainable_spatial_vqa_tpu.infer.chain import chained_forward_pool

        pool_fn = jax.jit(
            lambda feats, img_idx, fns, dps, nsteps: chained_forward_pool(
                executor, exe_vars, feats, img_idx, fns, dps, nsteps,
                exe_cfg, max_steps=max_steps, slots=batch,
            )
        )

        def run_all():
            programs = gen_all(questions_dev)
            state = pool_fn(features_dev, image_index_dev, functions_dev,
                            deps_dev, num_steps_dev)
            return np.asarray(programs), np.asarray(state.token_cache)
    elif mode == "sorted":
        def run_all():
            programs = gen_all(questions_dev)
            outs = [batch_fn(sel, depth, *shared) for sel, depth, _real in plan]
            # materialize the generated programs and every batch's answer
            # tokens on host (the deliverables; all dispatches above are
            # async, so transfers overlap execution)
            return np.asarray(programs), [np.asarray(state.token_cache) for state in outs]
    else:
        raise ValueError(f"unknown BENCH_MODE {mode!r}")

    run_all()  # warmup + compile
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPEATS", "2"))):
        t0 = time.perf_counter()
        run_all()
        best = min(best, time.perf_counter() - t0)

    useful_flops = sum(
        analytic_flops_per_question(gen_cfg, exe_cfg, steps=int(s))
        for s in num_steps_np
    )
    stats = {
        "mean_chain_depth": float(num_steps_np.mean()),
        "max_chain_depth": int(num_steps_np.max()),
        "useful_flops_per_question": useful_flops / n,
        "flops_per_sec": useful_flops / best,
        "truncated_programs": chains.truncated,
    }
    return n / best, stats


def run_reference_style(n_questions, device):
    """The reference algorithm: per question, per step, batch=1 forwards."""
    import jax
    import jax.numpy as jnp

    # the reference deployment is fp32 torch on CPU — keep the baseline fp32
    generator, gen_vars, gen_cfg, executor, exe_vars, exe_cfg = build_pipeline(force_fp32=True)
    features, questions, chains = synth_questions(n_questions, exe_cfg, seed=1)

    gen_one = jax.jit(
        lambda q: generator.apply(gen_vars, q, method=generator.generate)
    )
    exe_one = jax.jit(
        lambda img, boxes, bm, text, tm: executor.apply(exe_vars, img, boxes, bm, text, tm)
    )

    def run_question(i):
        q = jnp.asarray(questions[i : i + 1])
        gen_one(q).block_until_ready()
        img = jnp.asarray(features[chains.image_index[i] : chains.image_index[i] + 1])
        box_cache = {}
        token_cache = {}
        for k in range(int(chains.num_steps[i])):
            dep_boxes = []
            dep_tokens = []
            for d in range(2):
                dep = int(chains.deps[i, k, d])
                if dep >= 0:
                    if dep in box_cache:
                        dep_boxes.append(box_cache[dep])
                    if dep in token_cache:
                        dep_tokens.append(token_cache[dep])
            boxes = np.zeros((1, exe_cfg.max_input_boxes, 4), np.float32)
            bmask = np.zeros((1, exe_cfg.max_input_boxes), bool)
            fill = 0
            for b, m in dep_boxes:
                take = min(exe_cfg.max_input_boxes - fill, b.shape[0])
                boxes[0, fill : fill + take] = b[:take]
                bmask[0, fill : fill + take] = m[:take]
                fill += take
            text = np.zeros((1, 3), np.int32)
            tmask = np.zeros((1, 3), bool)
            text[0, 0] = chains.functions[i, k]
            tmask[0, 0] = True
            for j, t in enumerate(dep_tokens[:2]):
                text[0, 1 + j] = t
                tmask[0, 1 + j] = True
            out = exe_one(jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(bmask),
                          jnp.asarray(text), jnp.asarray(tmask))
            routing = int(np.argmax(np.asarray(out["routing_logits"])[0]))
            if routing == 0:
                pb = np.asarray(out["pred_boxes"])[0]
                pm = np.asarray(out["pred_conf"])[0] >= exe_cfg.conf_threshold
                box_cache[k] = (pb, pm)
            else:
                token_cache[k] = int(np.argmax(np.asarray(out["token_logits"])[0]))

    run_question(0)  # warmup/compile
    # total-based throughput over per-question best-of-2 times: the same
    # statistic as the TPU side (n / total), robust to transient host
    # contention spikes (the naive single-sweep total swung ~3x on a busy
    # host) WITHOUT the median's bias — question costs vary systematically
    # with chain depth, so a median would ignore the slow deep-chain tail.
    best = np.full(n_questions, np.inf)
    for _ in range(2):
        for i in range(n_questions):
            t0 = time.perf_counter()
            run_question(i)
            best[i] = min(best[i], time.perf_counter() - t0)
    qps = n_questions / float(best.sum())
    # leave-one-out jackknife SE of the ratio statistic n/sum(t): question
    # costs vary systematically with chain depth, so this is the right
    # spread estimator for the headline vs_baseline denominator
    total = float(best.sum())
    loo = (n_questions - 1) / (total - best)
    se = float(np.sqrt((n_questions - 1) / n_questions * np.sum((loo - loo.mean()) ** 2)))
    return qps, se


_PEAK_BF16_TFLOPS = {"v4": 275.0, "v5e": 197.0, "v5p": 459.0, "v6e": 918.0}


def chip_peak_flops() -> float:
    """bf16 peak of the chip under test (TFLOP/s), env-overridable."""
    if os.environ.get("BENCH_PEAK_TFLOPS"):
        return float(os.environ["BENCH_PEAK_TFLOPS"]) * 1e12
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return _PEAK_BF16_TFLOPS.get(gen, 197.0) * 1e12


def main():
    import jax

    n = int(os.environ.get("BENCH_N", "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    baseline_n = int(os.environ.get("BENCH_BASELINE_N", "32"))

    default = jax.devices()[0]
    value, stats = run_vectorized(n, batch, default)

    # reference algorithm on CPU (the reference's deployment mode)
    cpu = jax.devices("cpu")[0] if any(
        d.platform == "cpu" for d in jax.devices("cpu")
    ) else default
    with jax.default_device(cpu):
        baseline, baseline_se = run_reference_style(baseline_n, cpu)

    mode = os.environ.get("BENCH_MODE", "pool")
    mode_label = {"pool": "continuous-batching slot pool",
                  "sorted": "depth-sorted"}[mode]
    print(json.dumps({
        "metric": "CLEVR val QA pairs/sec/chip end-to-end (generator+executor, "
                  f"CLEVR question-family program shapes, {mode_label})",
        "value": round(value, 2),
        "unit": "qa_pairs/sec/chip",
        "vs_baseline": round(value / baseline, 2),
        "baseline_n": baseline_n,
        "baseline_qps": round(baseline, 3),
        "baseline_qps_jackknife_se": round(baseline_se, 4),
        "mfu": round(stats["flops_per_sec"] / chip_peak_flops(), 4),
        "mean_chain_depth": round(stats["mean_chain_depth"], 2),
        "max_chain_depth": stats["max_chain_depth"],
        "gflops_per_question": round(stats["useful_flops_per_question"] / 1e9, 2),
        # first-class truncation accounting: synth_questions rejection-samples
        # programs to depth <= 27 and the runners execute to max_steps=27, so
        # nothing is ever cut — this key pins that invariant in the capture
        "truncated_programs": stats.get("truncated_programs", 0),
    }))


if __name__ == "__main__":
    main()
