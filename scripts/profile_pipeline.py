#!/usr/bin/env python
"""Component-level profiling of the inference pipeline on the live TPU.

Times (with host materialization — block_until_ready is unreliable through
the tunnel): generator greedy decode, executor single fusion forward, the
full chain loop, and the loop minus model (cache plumbing only), to locate
the throughput bottleneck.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_pipeline, synth_questions  # noqa: E402
from explainable_spatial_vqa_tpu.infer.chain import ExecutorChainRunner  # noqa: E402


def timed(fn, *args, n=5):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = int(os.environ.get("PROF_BATCH", "128"))
    generator, gen_vars, gen_cfg, executor, exe_vars, exe_cfg = build_pipeline()
    features, questions, chains = synth_questions(batch, exe_cfg)
    img = jnp.asarray(features[chains.image_index[:batch]])
    q = jnp.asarray(questions[:batch])

    generate = jax.jit(lambda q: generator.apply(gen_vars, q, method=generator.generate))
    print(f"generator decode (B={batch}, 27 steps): {timed(generate, q)*1e3:.1f} ms")

    fwd = jax.jit(lambda img: executor.apply(
        exe_vars, img,
        jnp.zeros((batch, exe_cfg.max_input_boxes, 4)),
        jnp.ones((batch, exe_cfg.max_input_boxes), bool),
        jnp.zeros((batch, 3), jnp.int32), jnp.ones((batch, 3), bool),
    )["token_logits"])
    print(f"executor single forward: {timed(fwd, img)*1e3:.1f} ms")

    runner = ExecutorChainRunner(executor, exe_vars, exe_cfg,
                                 max_steps=chains.functions.shape[1])
    fns = jnp.asarray(chains.functions[:batch])
    deps = jnp.asarray(chains.deps[:batch])
    ns = jnp.asarray(chains.num_steps[:batch])
    chain_t = timed(lambda: runner._run(img, fns, deps, ns))
    steps = chains.functions.shape[1]
    print(f"chain loop ({steps} steps): {chain_t*1e3:.1f} ms "
          f"({chain_t/steps*1e3:.1f} ms/step)")

    total = timed(generate, q) + chain_t
    print(f"=> pipeline {batch/total:.1f} q/s/chip at B={batch}")


if __name__ == "__main__":
    main()
