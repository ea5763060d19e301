#!/usr/bin/env python
"""Measure the fused Pallas encoder blocks vs XLA at production shapes.

Shapes: the thesis executor encoder (d=512, H=4, ffn=2048) at the chained-
inference serving batch (B in {128, 256, 512}) and L=224 (210 fusion tokens
padded to the bf16 tile multiple).  Each variant is timed as N chained
applications inside one jit (fori_loop), so per-call dispatch and host
transfer are amortized; the result is materialized on host once (the axon
tunnel's block_until_ready returns early, see CLAUDE.md).

Usage: python scripts/bench_pallas_block.py [--iters 20] [--batches 128,256,512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from explainable_spatial_vqa_tpu.models.layers import EncoderBlock
from explainable_spatial_vqa_tpu.ops.pallas_block import (
    fuse_encoder_params,
    fused_encoder_block,
    fused_encoder_block_tiled,
)

D_MODEL, HEADS, FFN, LENGTH = 512, 4, 2048, 224


def block_flops(batch: int) -> float:
    """Forward matmul FLOPs (2*MACs) of one encoder block application."""
    qkvo = 4 * 2 * LENGTH * D_MODEL * D_MODEL
    attn = 2 * 2 * LENGTH * LENGTH * D_MODEL
    ffn = 2 * 2 * LENGTH * D_MODEL * FFN
    return batch * (qkvo + attn + ffn)


def timed(fn, x, iters: int, repeats: int = 3) -> float:
    """Best per-application ms over `repeats` timed runs of `iters` chained
    applications.  Only a scalar reduction crosses the tunnel so host
    transfer does not pollute the timing."""

    @jax.jit
    def chain(x0):
        y = jax.lax.fori_loop(0, iters, lambda _, y: fn(y), x0)
        return jnp.sum(y.astype(jnp.float32))

    np.asarray(chain(x))  # compile + warmup
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(chain(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--tiles", default="2,4,8")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind if hasattr(dev, 'device_kind') else '?'})")

    block = EncoderBlock(D_MODEL, HEADS, FFN, dropout=0.0, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    x_init = jnp.asarray(rng.randn(2, LENGTH, D_MODEL), jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x_init.astype(jnp.float32))
    w_bf16 = fuse_encoder_params(variables["params"], dtype=jnp.bfloat16)

    def xla_fn(y):
        return block.apply(variables, y).astype(jnp.bfloat16)

    results = []
    for batch in [int(b) for b in args.batches.split(",")]:
        x = jnp.asarray(rng.randn(batch, LENGTH, D_MODEL), jnp.bfloat16)
        x = jax.device_put(x, dev)
        gflop = block_flops(batch) / 1e9

        def report(name, ms):
            tflops = gflop / ms
            results.append((batch, name, ms, tflops))
            print(f"B={batch:4d}  {name:28s} {ms:8.3f} ms  {tflops:7.2f} TFLOP/s")

        report("xla bf16 (production)", timed(xla_fn, x, args.iters))
        try:
            report(
                "pallas per-seq (r1)",
                timed(lambda y: fused_encoder_block(y, None, w_bf16, HEADS), x, args.iters),
            )
        except Exception as e:  # pragma: no cover - measurement script
            print(f"B={batch:4d}  pallas per-seq (r1)          FAILED: {type(e).__name__}: {e}")
        for tb in [int(t) for t in args.tiles.split(",")]:
            for chunks in ([1, 2] if tb <= 2 else [tb]):
                name = f"pallas tiled TB={tb} fc={chunks}"
                try:
                    report(
                        name,
                        timed(
                            lambda y: fused_encoder_block_tiled(
                                y, None, w_bf16, HEADS,
                                batch_tile=tb, ffn_chunks=chunks,
                            ),
                            x, args.iters,
                        ),
                    )
                except Exception as e:  # pragma: no cover
                    print(f"B={batch:4d}  {name:28s} FAILED: {type(e).__name__}: {e}")

    print("\nsummary (ms/apply):")
    for batch, name, ms, tflops in results:
        print(f"  {batch:4d}  {name:28s} {ms:8.3f}  {tflops:7.2f}")


if __name__ == "__main__":
    main()
