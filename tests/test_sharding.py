"""Tensor-parallel parameter sharding: rules apply, math unchanged."""

import jax
import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.core.config import ExecutorConfig
from explainable_spatial_vqa_tpu.models.executor import ProgramExecutor
from explainable_spatial_vqa_tpu.parallel.mesh import make_mesh
from explainable_spatial_vqa_tpu.parallel.sharding import (
    param_path_strings,
    shard_params_by_rules,
)

CFG = ExecutorConfig(
    vocab_size=32, d_model=64, num_heads=4, encoder_layers=2, box_decoder_layers=1,
    num_queries=4, num_image_tokens=16, image_feature_dim=16, max_input_boxes=4,
    token_classes=16,
)


def _setup():
    model = ProgramExecutor(CFG)
    rng = np.random.RandomState(0)
    args = (
        jnp.asarray(rng.rand(4, 16, 16), jnp.float32),
        jnp.asarray(rng.rand(4, 4, 4), jnp.float32),
        jnp.ones((4, 4), bool),
        jnp.asarray(rng.randint(0, 32, (4, 3)), jnp.int32),
        jnp.ones((4, 3), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), *args)
    return model, variables, args


def test_tp_rules_shard_ffn_and_attention():
    model, variables, args = _setup()
    mesh = make_mesh((4, 2), ("data", "model"))
    sharded = shard_params_by_rules(variables["params"], mesh)

    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    specs = {
        "/".join(str(k.key) for k in path): leaf.sharding.spec
        for path, leaf in flat
    }
    assert specs["fusion/block_0/ffn/Dense_0/kernel"] == jax.sharding.PartitionSpec(None, "model")
    assert specs["fusion/block_0/ffn/Dense_1/kernel"] == jax.sharding.PartitionSpec("model", None)
    assert specs["fusion/block_0/attn/q/kernel"] == jax.sharding.PartitionSpec(None, "model", None)
    # biases and norms stay replicated
    assert specs["fusion/block_0/norm1/scale"] == jax.sharding.PartitionSpec()


def test_tp_forward_matches_replicated():
    """Sharded parameters must produce identical outputs (same math, XLA
    inserts the collectives)."""
    model, variables, args = _setup()
    mesh = make_mesh((4, 2), ("data", "model"))
    sharded = shard_params_by_rules(variables["params"], mesh)

    out_ref = model.apply(variables, *args)
    out_tp = model.apply({"params": sharded}, *args)
    np.testing.assert_allclose(
        np.asarray(out_ref["token_logits"]), np.asarray(out_tp["token_logits"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_ref["pred_boxes"]), np.asarray(out_tp["pred_boxes"]), atol=1e-5
    )


def test_chain_runner_sharded_matches_single_device():
    """Serving-path DP: the chain runner over a batch sharded across all 8
    devices must produce identical results to unsharded execution."""
    import jax.numpy as jnp

    from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
    from explainable_spatial_vqa_tpu.parallel.mesh import batch_sharding, replicated
    from explainable_spatial_vqa_tpu.train.datasets import ChainArrays

    model = ProgramExecutor(CFG)
    rng = np.random.RandomState(0)
    n = 16
    img = jnp.asarray(rng.rand(n, 16, 16), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img[:2], jnp.zeros((2, 4, 4)), jnp.ones((2, 4), bool),
        jnp.zeros((2, 3), jnp.int32), jnp.ones((2, 3), bool),
    )
    max_steps = 4
    functions = rng.randint(1, 10, (n, max_steps)).astype(np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = rng.randint(2, max_steps + 1, n).astype(np.int32)
    for i in range(n):
        for k in range(1, num_steps[i]):
            deps[i, k, 0] = k - 1
    chains = ChainArrays(np.arange(n, dtype=np.int32), functions, deps, num_steps, [])

    runner = ExecutorChainRunner(model, variables, CFG, max_steps=max_steps)
    plain = runner.run(img, chains)

    mesh = make_mesh((8,), ("data",))
    shard = batch_sharding(mesh)
    rep = replicated(mesh)
    sharded_vars = jax.device_put(variables, rep)
    runner_sharded = ExecutorChainRunner(model, sharded_vars, CFG, max_steps=max_steps)
    out = runner_sharded._run(
        jax.device_put(img, shard),
        jax.device_put(jnp.asarray(functions), shard),
        jax.device_put(jnp.asarray(deps), shard),
        jax.device_put(jnp.asarray(num_steps), shard),
    )
    np.testing.assert_allclose(
        np.asarray(out.token_cache),
        plain["token_cache"], atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(out.box_cache), plain["box_cache"], atol=1e-5
    )

    # first-class serving API: mesh= handles placement + padding itself;
    # n=16-3 is NOT divisible by 8, exercising the zero-pad round trip
    runner_mesh = ExecutorChainRunner(
        model, variables, CFG, max_steps=max_steps, mesh=mesh
    )
    m = n - 3
    sub = ChainArrays(
        chains.image_index[:m], functions[:m], deps[:m], num_steps[:m], []
    )
    out_mesh = runner_mesh.run(np.asarray(img)[:m], sub)
    np.testing.assert_allclose(
        out_mesh["token_cache"], plain["token_cache"][:m], atol=0
    )
    np.testing.assert_allclose(
        out_mesh["box_cache"], plain["box_cache"][:m], atol=1e-5
    )

    # bucketed serving inherits the mesh
    out_bucketed = runner_mesh.run_bucketed(
        np.asarray(img)[:m], sub, buckets=(2, max_steps)
    )
    np.testing.assert_allclose(
        out_bucketed["final_tokens"], plain["final_tokens"][:m], atol=0
    )


def test_pool_sharded_matches_single_device():
    """Continuous-batching over the mesh: questions dealt round-robin over
    the global deepest-first order, one independent slot pool per chip
    under shard_map (zero collectives, per-chip trip counts differ), with
    sentinel padding when n doesn't divide the axis — results must equal
    the plain single-device runner exactly."""
    from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
    from explainable_spatial_vqa_tpu.train.datasets import ChainArrays

    model = ProgramExecutor(CFG)
    rng = np.random.RandomState(3)
    m, n, max_steps = 4, 13, 4
    feats = rng.rand(m, 16, 16).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats[:2]), jnp.zeros((2, 4, 4)),
        jnp.ones((2, 4), bool), jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    functions = rng.randint(1, 10, (n, max_steps)).astype(np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = rng.randint(1, max_steps + 1, n).astype(np.int32)
    for i in range(n):
        for k in range(1, num_steps[i]):
            deps[i, k, 0] = k - 1
            if k >= 2 and (i + k) % 3 == 0:
                deps[i, k, 1] = k - 2
    image_index = rng.randint(0, m, n).astype(np.int32)
    chains = ChainArrays(image_index, functions, deps, num_steps, [])

    single = ExecutorChainRunner(model, variables, CFG, max_steps=max_steps)
    plain = single.run(jnp.asarray(feats[image_index]), chains)

    mesh = make_mesh((8,), ("data",))
    runner_mesh = ExecutorChainRunner(
        model, variables, CFG, max_steps=max_steps, mesh=mesh
    )
    pool = runner_mesh.run_pool(feats, chains, slots=2)
    for key in ("final_tokens", "final_is_token", "box_mask",
                "token_cache", "token_branch"):
        np.testing.assert_array_equal(pool[key], plain[key], err_msg=key)
    for key in ("box_cache", "conf_cache"):
        np.testing.assert_allclose(pool[key], plain[key], atol=1e-5,
                                   err_msg=key)


def test_pool_sharded_box_roi_matches_single_device():
    """Sharded pool serving with ``box_roi=True``: the per-iteration image
    gather x ROI coverage pooling must survive the shard_map per-chip pools
    bit-for-bit vs the single-device plain runner (VERDICT r3 #4)."""
    import dataclasses

    from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner
    from explainable_spatial_vqa_tpu.train.datasets import ChainArrays

    cfg = dataclasses.replace(CFG, box_roi=True)
    model = ProgramExecutor(cfg)
    rng = np.random.RandomState(5)
    m, n, max_steps = 4, 13, 4
    feats = rng.rand(m, 16, 16).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(feats[:2]), jnp.zeros((2, 4, 4)),
        jnp.ones((2, 4), bool), jnp.zeros((2, 3), jnp.int32),
        jnp.ones((2, 3), bool),
    )
    functions = rng.randint(1, 10, (n, max_steps)).astype(np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    num_steps = rng.randint(1, max_steps + 1, n).astype(np.int32)
    for i in range(n):
        for k in range(1, num_steps[i]):
            deps[i, k, 0] = k - 1
    image_index = rng.randint(0, m, n).astype(np.int32)
    chains = ChainArrays(image_index, functions, deps, num_steps, [])

    single = ExecutorChainRunner(model, variables, cfg, max_steps=max_steps)
    plain = single.run(jnp.asarray(feats[image_index]), chains)
    assert plain["box_mask"].any()  # dependency boxes exist -> ROI fires

    mesh = make_mesh((8,), ("data",))
    runner_mesh = ExecutorChainRunner(
        model, variables, cfg, max_steps=max_steps, mesh=mesh
    )
    pool = runner_mesh.run_pool(feats, chains, slots=2)
    for key in ("final_tokens", "final_is_token", "box_mask",
                "token_cache", "token_branch"):
        np.testing.assert_array_equal(pool[key], plain[key], err_msg=key)
    for key in ("box_cache", "conf_cache"):
        np.testing.assert_allclose(pool[key], plain[key], atol=1e-5,
                                   err_msg=key)


def test_pool_deal_balances_skewed_depths():
    """The deepest-first round-robin deal (infer.chain.deal_deepest_first —
    the exact function run_pool shards with) must keep per-chip USEFUL-step
    totals near-equal on a heavily skewed depth mix (VERDICT r3 #8): chips
    run independent pools with zero collectives, so wall-clock is the max
    per-chip total and imbalance is pure waste."""
    from explainable_spatial_vqa_tpu.infer.chain import deal_deepest_first

    rng = np.random.RandomState(0)
    # skewed mix: many shallow chains, a heavy tail of deep ones
    num_steps = np.concatenate([
        rng.randint(1, 3, 300),           # shallow mass
        rng.randint(3, 8, 80),            # medium
        rng.randint(12, 17, 40),          # deep tail
        np.full(5, 16),                   # a few maximal chains
    ]).astype(np.int32)
    rng.shuffle(num_steps)
    for d in (4, 8):
        perm = deal_deepest_first(num_steps, d)
        per = perm.shape[0] // d
        totals = []
        for c in range(d):
            mine = perm[c * per:(c + 1) * per]
            totals.append(int(num_steps[mine[mine >= 0]].sum()))
        totals = np.asarray(totals)
        # every row index dealt exactly once
        dealt = np.sort(perm[perm >= 0])
        np.testing.assert_array_equal(dealt, np.arange(len(num_steps)))
        # near-equal totals: spread bounded by one maximal chain's depth
        assert totals.max() - totals.min() <= int(num_steps.max()), (
            f"d={d}: per-chip useful-step totals {totals.tolist()} spread "
            f"{totals.max() - totals.min()} > max depth {num_steps.max()}"
        )


def test_seq2seq_chain_runner_sharded_matches_single_device():
    """The seq2seq chain runner's mesh serving path must match unsharded
    execution, including the non-divisible-batch pad round trip."""
    from explainable_spatial_vqa_tpu.core.config import StepSeq2SeqConfig
    from explainable_spatial_vqa_tpu.infer.chain import Seq2SeqChainRunner
    from explainable_spatial_vqa_tpu.models.step_executor import StepExecutorSeq2Seq
    from explainable_spatial_vqa_tpu.train.datasets import ChainArrays

    cfg = StepSeq2SeqConfig(
        vocab_size=16, d_model=16, num_heads=2, encoder_layers=1,
        decoder_layers=1, ffn_dim=32, max_src_len=8, max_tgt_len=4,
        num_image_tokens=4, image_feature_dim=8,
    )
    model = StepExecutorSeq2Seq(cfg)
    rng = np.random.RandomState(0)
    n, max_steps = 13, 3  # 13 % 8 != 0 -> exercises padding
    img = jnp.asarray(rng.rand(n, 4, 8), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), img[:2], jnp.zeros((2, 5), jnp.int32),
        jnp.zeros((2, 3), jnp.int32),
    )
    functions = rng.randint(3, 16, (n, max_steps)).astype(np.int32)
    deps = np.full((n, max_steps, 2), -1, np.int64)
    deps[:, 1:, 0] = np.arange(max_steps - 1)
    chains = ChainArrays(
        np.arange(n, dtype=np.int32), functions, deps,
        np.full(n, max_steps, np.int32), [],
    )

    plain = Seq2SeqChainRunner(model, variables, cfg, max_steps=max_steps).run(
        img, chains
    )
    mesh = make_mesh((8,), ("data",))
    sharded = Seq2SeqChainRunner(
        model, variables, cfg, max_steps=max_steps, mesh=mesh
    ).run(np.asarray(img), chains)
    np.testing.assert_array_equal(
        sharded["step_outputs"], plain["step_outputs"]
    )
