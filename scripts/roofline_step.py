#!/usr/bin/env python
"""Composite roofline bound for ONE executor chain step at serving shapes.

Completes VERDICT r2 #1's fallback criterion: either serving reaches MFU
>= 0.60, or DESIGN.md carries a roofline table proving the measured MFU is
within a few percent of the arithmetic-intensity bound AT THESE SHAPES.

Method: decompose the chain step into its constituent matmul classes
(encoder QKVO / attention scores+apply / FFN; DETR decoder self+cross+FFN;
box-embed MLP), time EACH CLASS standalone on the live TPU (chained inside
one jit, scalar return — the bench_pallas_block methodology), and sum the
class times into a composite matmul bound.  The gap between the measured
full step and that bound is the true non-matmul overhead (LN, softmax,
masking, residuals, routing, cache scatter) — everything XLA could at best
fuse to zero.  Per-class efficiency also shows WHY the bound sits below
chip peak: the attention and decoder matmuls are shape-starved (K=128 or
M=10 rows), not badly scheduled.

Usage: python scripts/roofline_step.py [--batch 128] [--iters 16]
Writes a markdown table to stdout (paste target: docs/DESIGN.md §10).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_pipeline, synth_questions, chip_peak_flops  # noqa: E402


def timed(fn, x0, iters, repeats=3):
    """Best per-application seconds for `iters` chained applications of fn
    inside one jit (data-dependent carry; scalar return)."""

    @jax.jit
    def chain(x):
        y = jax.lax.fori_loop(0, iters, lambda _, y: fn(y), x)
        return jnp.sum(y.astype(jnp.float32))

    np.asarray(chain(x0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(chain(x0))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def matmul_class(name, m, k, n, batch=1, dtype=jnp.bfloat16):
    """Return (name, flops, timing-callable factory).  The carry is the
    left operand; the right operand is a constant captured at trace time so
    chained iterations depend on each other through the output."""
    # non-uniform rhs so XLA cannot strength-reduce the matmul
    shape = (batch, k, n) if batch > 1 else (k, n)
    rhs = ((jnp.arange(np.prod(shape)) % 13).reshape(shape)
           .astype(dtype) * 0.02)
    eq = "bmk,bkn->bmn" if batch > 1 else "mk,kn->mn"

    # the carry must keep shape (.., m, k): slice the output's last dim down
    # to k (n >= k) or pad it back up (n < k), rescaled so values stay O(1)
    def fn(x):
        y = jnp.einsum(eq, x, rhs, preferred_element_type=jnp.float32)
        if n >= k:
            y = y[..., :k]
        else:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, k - n)],
                        constant_values=1.0)
        return (y * (1.0 / k)).astype(dtype)

    x0 = jnp.ones((batch, m, k) if batch > 1 else (m, k), dtype)
    flops = 2.0 * batch * m * k * n
    return name, flops, fn, x0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--platform", default="tpu",
                    help="cpu = smoke-test the harness (numbers meaningless)")
    args = ap.parse_args()
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    B = args.batch

    dev = jax.devices()[0]
    print(f"device: {dev.platform}")
    peak = chip_peak_flops()

    _, _, _, executor, exe_vars, exe_cfg = build_pipeline()
    d = exe_cfg.d_model
    L = 1 + exe_cfg.num_image_tokens + exe_cfg.max_input_boxes + 3
    H = exe_cfg.num_heads
    hd = d // H
    ffn = 4 * d
    Q = exe_cfg.num_queries
    EL, DL = exe_cfg.encoder_layers, exe_cfg.box_decoder_layers

    # one chain step's matmuls, with per-step multiplicity
    classes = [
        # (spec, multiplicity per step)
        (matmul_class("enc QKVO  (BL,d)x(d,d)", B * L, d, d), 4 * EL),
        (matmul_class(f"enc scores (B·H){L}x{hd}x{L}", L, hd, L, batch=B * H), EL),
        (matmul_class(f"enc apply  (B·H){L}x{L}x{hd}", L, L, hd, batch=B * H), EL),
        (matmul_class("enc FFN-up (BL,d)x(d,4d)", B * L, d, ffn), EL),
        (matmul_class("enc FFN-dn (BL,4d)x(4d,d)", B * L, ffn, d), EL),
        (matmul_class("dec self QKVO (BQ,d)x(d,d)", B * Q, d, d), 4 * DL),
        (matmul_class(f"dec self attn (B·H){Q}x{hd}x{Q}", Q, hd, Q, batch=B * H), 2 * DL),
        (matmul_class("dec cross q/out (BQ,d)x(d,d)", B * Q, d, d), 2 * DL),
        (matmul_class("dec cross k+v (BL,d)x(d,d)", B * L, d, d), 2 * DL),
        (matmul_class(f"dec cross scr (B·H){Q}x{hd}x{L}", Q, hd, L, batch=B * H), DL),
        (matmul_class(f"dec cross apl (B·H){Q}x{L}x{hd}", Q, L, hd, batch=B * H), DL),
        (matmul_class("dec FFN-up (BQ,d)x(d,4d)", B * Q, d, ffn), DL),
        (matmul_class("dec FFN-dn (BQ,4d)x(4d,d)", B * Q, ffn, d), DL),
        (matmul_class("box MLP L1 (B·10,4)x(4,d)", B * exe_cfg.max_input_boxes, 4, d), 1),
        (matmul_class("box MLP L2 (B·10,d)x(d,d)", B * exe_cfg.max_input_boxes, d, d), 1),
    ]

    print(f"\nshapes: B={B} L={L} d={d} H={H} ffn={ffn} Q={Q} "
          f"encoder x{EL} decoder x{DL}; peak {peak/1e12:.0f} TFLOP/s\n")
    rows = []
    total_t = total_f = 0.0
    for (name, flops, fn, x0), mult in classes:
        t = timed(fn, x0, args.iters)
        eff = flops / t / peak
        rows.append((name, mult, flops * mult, t * mult, eff))
        total_t += t * mult
        total_f += flops * mult
        print(f"  {name:36s} x{mult:2d}  {t*1e3:7.3f} ms/app  "
              f"{flops/t/1e12:6.1f} TFLOP/s  ({eff*100:4.1f}% peak)")

    print(f"\ncomposite matmul bound: {total_t*1e3:.2f} ms/step "
          f"({total_f/1e9:.1f} GFLOP -> {total_f/total_t/1e12:.1f} TFLOP/s, "
          f"{total_f/total_t/peak*100:.1f}% of peak)")

    # measured full chain step for comparison (same methodology, via the
    # real chained_forward at depth 12 / num_steps>=12)
    from explainable_spatial_vqa_tpu.infer.chain import chained_forward

    features, questions, chains = synth_questions(B, exe_cfg)
    img = jnp.asarray(features[chains.image_index[:B] % features.shape[0]])
    D = 12
    fns = jnp.asarray(chains.functions[:B, :D])
    deps = jnp.asarray(chains.deps[:B, :D])
    nsteps = jnp.full((B,), D, jnp.int32)

    @jax.jit
    def full(img):
        state = chained_forward(executor, exe_vars, img, fns, deps, nsteps,
                                exe_cfg, D)
        return jnp.sum(state.box_cache.astype(jnp.float32))

    np.asarray(full(img))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(full(img))
        best = min(best, time.perf_counter() - t0)
    per_step = best / D
    print(f"measured chain step ({D} steps): {per_step*1e3:.2f} ms/step "
          f"({total_f/per_step/1e12:.1f} TFLOP/s, "
          f"{total_f/per_step/peak*100:.1f}% of peak)")
    print(f"non-matmul overhead: {(per_step-total_t)*1e3:.2f} ms/step "
          f"({(per_step/total_t-1)*100:.1f}% over the composite bound)")

    print("\n| class | x | GFLOP/step | ms/step | % peak |")
    print("|---|---|---|---|---|")
    for name, mult, f, t, eff in rows:
        print(f"| {name} | {mult} | {f/1e9:.2f} | {t*1e3:.3f} | {eff*100:.1f} |")
    print(f"| **composite bound** | | {total_f/1e9:.1f} | {total_t*1e3:.2f} "
          f"| {total_f/total_t/peak*100:.1f} |")
    print(f"| **measured step** | | {total_f/1e9:.1f} | {per_step*1e3:.2f} "
          f"| {total_f/per_step/peak*100:.1f} |")


if __name__ == "__main__":
    main()
