#!/usr/bin/env python
"""Segment-share + roofline profile of the serving pipeline on the live TPU.

Answers VERDICT r2 #1: where does serving wall-time actually go (generator
LSTM decode vs executor chain loop vs cache plumbing vs dispatch), how much
of the executor block is bound by fp32 LN/softmax IO, and how close is each
piece to its arithmetic-intensity bound.

Methodology (established in scripts/bench_pallas_block.py): every timed
quantity chains K applications inside ONE jit and returns a scalar, so axon
dispatch (~5.5 ms) and host transfer do not pollute per-application times; a
data dependency between iterations stops XLA hoisting loop-invariant work.

Usage: python scripts/profile_segments.py [--batch 128] [--depth 12] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_pipeline, synth_questions, chip_peak_flops  # noqa: E402
from explainable_spatial_vqa_tpu.infer.chain import chained_forward  # noqa: E402
from explainable_spatial_vqa_tpu.ops import lowp  # noqa: E402

HBM_BW = float(os.environ.get("PROF_HBM_GBS", "819")) * 1e9  # v5e HBM GB/s


def timed_chain(make_fn, x0, iters, repeats=3):
    """Best per-application seconds: `iters` chained applications in one jit.

    make_fn(x) must return an array shaped like x (the carry) so iterations
    depend on each other."""

    @jax.jit
    def chain(x):
        y = jax.lax.fori_loop(0, iters, lambda _, y: make_fn(y), x)
        return jnp.sum(y.astype(jnp.float32))

    np.asarray(chain(x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(chain(x0))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    B, D = args.batch, args.depth

    dev = jax.devices()[0]
    print(f"device: {dev.platform}")
    generator, gen_vars, gen_cfg, executor, exe_vars, exe_cfg = build_pipeline()
    features, questions, chains = synth_questions(B, exe_cfg)
    img = jnp.asarray(features[chains.image_index[:B] % features.shape[0]])
    q0 = jnp.asarray(questions[:B])
    fns = jnp.asarray(chains.functions[:B, :D])
    deps = jnp.asarray(chains.deps[:B, :D])
    nsteps = jnp.minimum(jnp.asarray(chains.num_steps[:B]), D)

    # ---- dispatch round-trip --------------------------------------------
    noop = jax.jit(lambda x: x + 1.0)
    np.asarray(noop(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(noop(jnp.zeros(())))
    dispatch = (time.perf_counter() - t0) / 10
    print(f"dispatch round-trip: {dispatch*1e3:.2f} ms")

    # ---- generator decode ------------------------------------------------
    def gen_fn(q):
        toks = generator.apply(gen_vars, q, method=generator.generate)
        # data dependency XLA cannot fold away (multiplying by 0 gets DCE'd):
        # rotate the question tokens by a genuine function of the output;
        # values change between iterations but shapes/time do not
        return ((q + jnp.sum(toks) % 2) % gen_cfg.vocab_size).astype(q.dtype)

    t_gen = timed_chain(gen_fn, q0, args.iters)
    print(f"generator greedy decode (B={B}, {gen_cfg.program_len} steps): "
          f"{t_gen*1e3:.2f} ms")

    # ---- executor chain loop, lowp variants -------------------------------
    boxes0 = jnp.zeros((B, exe_cfg.max_input_boxes, 4), jnp.float32)
    bmask0 = jnp.ones((B, exe_cfg.max_input_boxes), bool)
    text0 = jnp.zeros((B, 3), jnp.int32)
    tmask0 = jnp.ones((B, 3), bool)

    def fwd_fn(x):
        out = executor.apply(exe_vars, x, boxes0, bmask0, text0, tmask0)
        # genuine (but numerically negligible) dependency — see gen_fn
        return x + jnp.sum(out["token_logits"]).astype(x.dtype) * 1e-24

    def chain_fn(x):
        state = chained_forward(executor, exe_vars, x, fns, deps, nsteps,
                                exe_cfg, max_steps=D)
        return x + jnp.sum(state.conf_cache).astype(x.dtype) * 1e-24

    variants = [
        ("fp32-IO (default)", (False, False)),
        ("lowp norms", (True, False)),
        ("lowp softmax", (False, True)),
        ("lowp both", (True, True)),
    ]
    results = {}
    for name, (norms, sm) in variants:
        lowp.use_lowp_norms(norms)
        lowp.use_lowp_softmax(sm)
        jax.clear_caches()
        t_fwd = timed_chain(fwd_fn, img, args.iters)
        t_chain = timed_chain(chain_fn, img, max(2, args.iters // 2))
        results[name] = (t_fwd, t_chain)
        print(f"{name:20s} executor fwd {t_fwd*1e3:7.2f} ms | "
              f"chain({D}) {t_chain*1e3:8.2f} ms "
              f"({t_chain/D*1e3:6.2f} ms/step, plumbing "
              f"{(t_chain - D*t_fwd)*1e3:+7.2f} ms)")
    lowp.use_lowp_serving(False)

    t_fwd0, t_chain0 = results["fp32-IO (default)"]
    plumbing = t_chain0 - D * t_fwd0

    # ---- segment shares of a depth-D bucket batch -------------------------
    total = t_gen + t_chain0
    print("\nsegment shares of one bucket batch (default precision):")
    for seg, t in [("generator decode", t_gen),
                   ("executor forwards", D * t_fwd0),
                   ("chain plumbing (gather/scatter)", plumbing),
                   ("dispatch (1/batch)", dispatch)]:
        print(f"  {seg:34s} {t*1e3:8.2f} ms  {t/total*100:5.1f}%")

    # ---- roofline model of one executor forward ---------------------------
    d, H = exe_cfg.d_model, exe_cfg.num_heads
    L = 1 + exe_cfg.num_image_tokens + exe_cfg.max_input_boxes + 3
    ffn = 4 * d
    enc_flops = exe_cfg.encoder_layers * (
        4 * 2 * L * d * d + 2 * 2 * L * L * d + 2 * 2 * L * d * ffn
    ) * B
    Q = exe_cfg.num_queries
    dec_flops = exe_cfg.box_decoder_layers * (
        4 * 2 * Q * d * d + 2 * 2 * Q * Q * d + 2 * 2 * Q * d * d
        + 2 * 2 * L * d * d + 2 * 2 * Q * L * d + 2 * 2 * Q * d * ffn
    ) * B
    flops = enc_flops + dec_flops

    def enc_block_bytes(score_bytes, ln_bytes):
        """Minimal HBM traffic of one encoder block at batch B (bytes).
        Activations bf16 (2B/elem) except the score/LN materializations."""
        act = 2
        x_io = B * L * d * act
        qkv = 3 * B * L * d * act          # q,k,v written
        scores = B * H * L * L * score_bytes * 2  # written + read
        weights = B * H * L * L * act * 2         # softmax out (always bf16)
        attn_out = B * L * d * act * 2
        ffn_mid = B * L * ffn * act * 2
        lnorm = 2 * (B * L * d * (ln_bytes + act))  # write IO + read back
        weights_bytes = (4 * d * d + 2 * d * ffn) * 2
        return (x_io * 2 + qkv * 2 + scores + weights + attn_out + ffn_mid
                + lnorm + weights_bytes)

    peak = chip_peak_flops()
    print("\nroofline (one executor forward, encoder blocks only):")
    rows = []
    for name, score_b, ln_b in [("fp32-IO", 4, 4), ("bf16-IO (lowp)", 2, 2)]:
        bytes_enc = exe_cfg.encoder_layers * enc_block_bytes(score_b, ln_b)
        t_compute = enc_flops / peak
        t_mem = bytes_enc / HBM_BW
        bound = max(t_compute, t_mem)
        rows.append((name, bytes_enc, t_compute, t_mem, bound))
        print(f"  {name:16s} bytes {bytes_enc/1e6:7.1f} MB | compute-bound "
              f"{t_compute*1e3:6.2f} ms | mem-bound {t_mem*1e3:6.2f} ms | "
              f"bound {bound*1e3:6.2f} ms")
    t_fwd_low = results["lowp both"][0]
    print(f"\nmeasured fwd: fp32-IO {t_fwd0*1e3:.2f} ms, lowp {t_fwd_low*1e3:.2f} ms; "
          f"analytic matmul-only floor {flops/peak*1e3:.2f} ms "
          f"(fwd MFU {flops/t_fwd0/peak:.3f} -> {flops/t_fwd_low/peak:.3f})")

    print(json.dumps({
        "batch": B, "depth": D,
        "dispatch_ms": dispatch * 1e3,
        "generator_ms": t_gen * 1e3,
        "chain_ms": {name: r[1] * 1e3 for name, r in results.items()},
        "fwd_ms": {name: r[0] * 1e3 for name, r in results.items()},
        "plumbing_ms": plumbing * 1e3,
        "flops_per_fwd": flops,
        "fwd_mfu_default": flops / t_fwd0 / peak,
        "fwd_mfu_lowp": flops / t_fwd_low / peak,
    }))


if __name__ == "__main__":
    main()
