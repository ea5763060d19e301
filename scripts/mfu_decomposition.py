#!/usr/bin/env python
"""End-to-end MFU decomposition of the serving benchmark (VERDICT r2 #1).

bench.py's headline MFU divides USEFUL flops (actual chain depths,
conservative analytic count) by TOTAL wall time.  This script splits the
gap between that number and the executor's per-(row,step) efficiency into
its three factors, each measured on the live TPU with the exact bench
configuration (N=1024, B=128, real fixture program distribution):

    MFU_e2e = MFU_step                 # executor chain at executed shapes
            x flop_efficiency          # useful / executed flops (plan_sorted
                                       #   in-batch depth spread + tail pad)
            x chain_time_share         # chain time / total time (generator
                                       #   whole-set decode + dispatch)

If the product of the measured factors reproduces the measured end-to-end
MFU, the pipeline adds no unexplained overhead, and the ceiling question
reduces to MFU_step — the XLA codegen efficiency of one executor forward
at (B=128, L=210, d=512), which docs/DESIGN.md S5 showed hand kernels do
not beat at these shapes.

Usage: python scripts/mfu_decomposition.py   (TPU; ~3 min, run alone)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import (  # noqa: E402
    analytic_flops_per_question,
    build_pipeline,
    chip_peak_flops,
    synth_questions,
)
from explainable_spatial_vqa_tpu.infer.chain import chained_forward  # noqa: E402
from explainable_spatial_vqa_tpu.infer.plan import plan_sorted  # noqa: E402


def _exe_step_flops(gen_cfg, exe_cfg):
    """Analytic flops of ONE executor chain step for ONE row (no generator,
    no image precompute): difference of the bench's per-question count."""
    return analytic_flops_per_question(gen_cfg, exe_cfg, steps=2) - (
        analytic_flops_per_question(gen_cfg, exe_cfg, steps=1)
    )


def main():
    n = int(os.environ.get("BENCH_N", "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    generator, gen_vars, gen_cfg, executor, exe_vars, exe_cfg = build_pipeline()
    features, questions, chains = synth_questions(n, exe_cfg)
    max_steps = chains.functions.shape[1]
    num_steps_np = np.asarray(chains.num_steps)

    features_dev = jax.device_put(jnp.asarray(features))
    questions_dev = jax.device_put(jnp.asarray(questions))
    shared = tuple(
        jax.device_put(jnp.asarray(a))
        for a in (chains.image_index, chains.functions, chains.deps, chains.num_steps)
    )

    gen_all = jax.jit(
        lambda qs: generator.apply(gen_vars, qs, method=generator.generate)
    )

    def batch_step(sel, depth, feats, img_idx, fns, dps, nsteps):
        img = jnp.take(feats, jnp.take(img_idx, sel, axis=0), axis=0)
        return chained_forward(
            executor, exe_vars, img,
            jnp.take(fns, sel, axis=0),
            jnp.take(dps, sel, axis=0),
            jnp.take(nsteps, sel, axis=0),
            exe_cfg, max_steps=max_steps, active_steps=depth,
        )

    batch_fn = jax.jit(batch_step)
    plan = [
        (jax.device_put(jnp.asarray(part)),
         jax.device_put(jnp.asarray(depth, jnp.int32)), depth, size, real)
        for depth, size, part, real in plan_sorted(chains.num_steps, batch)
    ]

    def time_best(fn):
        fn()  # warmup/compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_gen = time_best(lambda: np.asarray(gen_all(questions_dev)))
    t_chain = time_best(lambda: [
        np.asarray(batch_fn(sel, depth, features_dev, *shared).token_cache)
        for sel, depth, _d, _s, _r in plan
    ])
    t_total = time_best(lambda: (
        np.asarray(gen_all(questions_dev)),
        [np.asarray(batch_fn(sel, depth, features_dev, *shared).token_cache)
         for sel, depth, _d, _s, _r in plan],
    ))

    peak = chip_peak_flops()
    step_flops = _exe_step_flops(gen_cfg, exe_cfg)
    useful_steps = int(num_steps_np.sum())
    executed_steps = sum(size * d for _sel, _dep, d, size, _r in plan)
    useful_flops = sum(
        analytic_flops_per_question(gen_cfg, exe_cfg, steps=int(s))
        for s in num_steps_np
    )
    executed_exe_flops = executed_steps * step_flops

    mfu_step = executed_exe_flops / t_chain / peak
    flop_eff = useful_steps / executed_steps
    chain_share = t_chain / t_total
    mfu_e2e = useful_flops / t_total / peak

    out = {
        "n": n, "batch": batch,
        "t_generator_s": t_gen, "t_chain_s": t_chain, "t_total_s": t_total,
        "useful_steps": useful_steps, "executed_steps": executed_steps,
        "mfu_step_executed": mfu_step,
        "flop_efficiency_useful_over_executed": flop_eff,
        "chain_time_share": chain_share,
        "predicted_e2e_mfu_product": mfu_step * flop_eff * chain_share,
        "measured_e2e_mfu": mfu_e2e,
        "qa_per_sec": n / t_total,
        "peak_flops": peak,
    }
    print(json.dumps(out, indent=2))
    print(
        f"\nMFU_e2e {mfu_e2e:.3f} vs product "
        f"{mfu_step:.3f} (per-step) x {flop_eff:.3f} (packing) x "
        f"{chain_share:.3f} (chain share) = {mfu_step * flop_eff * chain_share:.3f}"
    )


if __name__ == "__main__":
    main()
