#!/usr/bin/env python
"""End-to-end MFU decomposition of the serving benchmark (VERDICT r2 #1).

bench.py's headline MFU divides USEFUL flops (actual chain depths,
conservative analytic count) by TOTAL wall time.  This script rebuilds
bench.run_vectorized's EXACT pipeline (same plan, same jits, same
async-dispatch-then-materialize structure — any deviation measures a
different program, as the first version of this script proved by timing
a per-batch-synchronizing loop at 0.40 MFU vs the bench's 0.55) and
splits the headline into measured factors:

    MFU_e2e = MFU_step                 # executor XLA efficiency at the
                                       #   EXECUTED (padded) shapes
            x flop_efficiency          # useful / executed chain flops
                                       #   (plan_sorted in-batch depth
                                       #   spread + pow2 tail padding)
            x chain_time_share         # chain wall / total wall (the rest
                                       #   is generator decode + dispatch)
            x (1 + gen_useful/chain_useful)   # generator flops credited
                                       #   to the numerator but timed in
                                       #   the non-chain segment

If the product of the measured factors reproduces the measured end-to-end
MFU, the pipeline adds no unexplained overhead, and the ceiling question
reduces to MFU_step — the XLA codegen efficiency of one executor forward
at (B<=128, L=210, d=512), which docs/DESIGN.md §5 showed hand kernels do
not beat at these shapes.

Usage: python scripts/mfu_decomposition.py   (TPU; ~5 min, run alone)
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
    build_pipeline,
    chip_peak_flops,
    flop_components,
    synth_questions,
)
from explainable_spatial_vqa_tpu.infer.chain import chained_forward  # noqa: E402
from explainable_spatial_vqa_tpu.infer.plan import plan_sorted  # noqa: E402


def main():
    n = int(os.environ.get("BENCH_N", "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    generator, gen_vars, gen_cfg, executor, exe_vars, exe_cfg = build_pipeline()
    features, questions, chains = synth_questions(n, exe_cfg)
    max_steps = chains.functions.shape[1]
    num_steps_np = np.asarray(chains.num_steps)

    questions_dev = jax.device_put(jnp.asarray(questions))
    shared = (jax.device_put(jnp.asarray(features)),) + tuple(
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

    # Segment runners with bench.run_vectorized's dispatch structure:
    # issue EVERY dispatch async, materialize deliverables at the end
    # (transfers overlap execution; a per-batch np.asarray() loop instead
    # serializes on the ~5.5 ms axon round-trip per batch).
    def run_gen():
        return np.asarray(gen_all(questions_dev))

    def run_chain():
        outs = [batch_fn(sel, depth, *shared) for sel, depth, _d, _s, _r in plan]
        return [np.asarray(o.token_cache) for o in outs]

    def run_total():
        programs = gen_all(questions_dev)
        outs = [batch_fn(sel, depth, *shared) for sel, depth, _d, _s, _r in plan]
        return np.asarray(programs), [np.asarray(o.token_cache) for o in outs]

    def time_best(fn):
        fn()  # warmup/compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_gen = time_best(run_gen)
    t_chain = time_best(run_chain)
    t_total = time_best(run_total)

    peak = chip_peak_flops()
    c = flop_components(gen_cfg, exe_cfg)

    useful_steps = int(num_steps_np.sum())
    executed_steps = sum(size * d for _sel, _dep, d, size, _r in plan)
    executed_rows = sum(size for _sel, _dep, _d, size, _r in plan)

    # chain-segment flops: image precompute once per ROW + one step per
    # executed (row, step) loop iteration
    useful_chain = useful_steps * c["exe_step"] + n * c["exe_precompute"]
    executed_chain = (
        executed_steps * c["exe_step"] + executed_rows * c["exe_precompute"]
    )
    # generator useful flops: encode + (steps+2)-token decode (bench's
    # conservative accounting); executed decode is full program_len
    useful_gen = n * c["gen_encode"] + int(
        np.minimum(gen_cfg.program_len, num_steps_np + 2).sum()
    ) * c["gen_dec_step"]
    executed_gen = n * (
        c["gen_encode"] + gen_cfg.program_len * c["gen_dec_step"]
    )

    mfu_step = executed_chain / t_chain / peak
    flop_eff = useful_chain / executed_chain
    chain_share = t_chain / t_total
    gen_credit = 1.0 + useful_gen / useful_chain
    mfu_e2e = (useful_gen + useful_chain) / t_total / peak

    out = {
        "n": n, "batch": batch,
        "t_generator_s": t_gen, "t_chain_s": t_chain, "t_total_s": t_total,
        "useful_steps": useful_steps, "executed_steps": executed_steps,
        "mfu_step_executed": mfu_step,
        "flop_efficiency_useful_over_executed": flop_eff,
        "chain_time_share": chain_share,
        "generator_numerator_credit": gen_credit,
        "generator_flop_efficiency": useful_gen / executed_gen,
        "predicted_e2e_mfu_product": mfu_step * flop_eff * chain_share * gen_credit,
        "measured_e2e_mfu": mfu_e2e,
        "qa_per_sec": n / t_total,
        "peak_flops": peak,
    }
    print(json.dumps(out, indent=2))
    print(
        f"\nMFU_e2e {mfu_e2e:.3f} vs product "
        f"{mfu_step:.3f} (per-step) x {flop_eff:.3f} (packing) x "
        f"{chain_share:.3f} (chain share) x {gen_credit:.3f} (gen credit) "
        f"= {mfu_step * flop_eff * chain_share * gen_credit:.3f}"
    )


if __name__ == "__main__":
    main()
