"""Fully-fused post-LN transformer encoder block as one Pallas kernel.

Motivation (see ops/pallas_attention.py): at the executor's sequence length
(~210 tokens) plain fused attention cannot beat XLA — the win is eliminating
every HBM round-trip of the (L, d) activations across the whole block:

    h  = MHA(x)            (QKV proj + per-head attention + out proj)
    x1 = LN1(x + h)
    f  = FFN(x1)           (d -> 4d -> d, ReLU)
    y  = LN2(x1 + f)

One grid cell processes one sequence entirely in VMEM; weights are broadcast
to every cell (the compiler keeps them resident across the grid).  VMEM
budget at d=512, L<=256, ffn=2048, bf16 weights: ~7.3 MB weights + ~2.5 MB
activations — comfortably under the 16 MB/core limit.

Numerics match models.layers.EncoderBlock (post-LN, fp32 LayerNorm/softmax)
to ~1e-5 (fp32 weights) / 4e-3 (bf16 weights vs fp32 reference); the adapter
`fuse_encoder_params` lifts a linen EncoderBlock's variables into the
kernel's flat weight list.  Interpret mode runs on CPU for tests; Mosaic
compiles the same kernel on TPU.

Measured on v5e at production serving shapes (L=224, d=512, H=4, ffn=2048,
bf16 weights; scripts/bench_pallas_block.py, ms per block application, timed
as 20 chained applications inside one jit with only a scalar reduction
crossing the axon tunnel — naive timings that materialize the (B, L, d)
output on host are transfer-dominated and flipped the verdict):

    B      XLA bf16        per-seq kernel   tiled TB=2 fc=2
    128    3.07 (63 TF/s)  3.40             3.81
    256    4.80 (81 TF/s)  5.13             5.27
    512    8.63 (90 TF/s)  8.70             9.14

XLA wins at every batch size and is already at ~45% of v5e bf16 peak at
B=512 (the fp32 LayerNorm/softmax segments bound the ceiling); the Pallas
kernels close to within 0.7-10% as the batch amortizes weight residency but
never cross over.  fp32 weights exceed the 16 MB VMEM scoped limit (bf16
fits; batch_tile=4 overflows even in bf16 — use TB=2).  Verdict
(resolved-by-measurement): the production path stays on XLA bf16 — don't
hand-schedule what the compiler already schedules well.  Both kernels remain
available behind ``use_fused_encoder_block`` (EncoderBlock routes eligible
deterministic bf16 calls), numerically validated, for shapes where the
balance may differ.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_encoder_block",
    "fused_encoder_block_tiled",
    "fuse_encoder_params",
    "fused_block_enabled",
    "fused_block_interpret",
    "pad_len",
    "use_fused_encoder_block",
]

# Global inference dispatch (mirrors ops.attention.use_pallas_attention):
# when enabled, eligible EncoderBlock calls (post-LN, deterministic,
# key-padding mask, d_model % 128 == 0) route to the fused per-sequence
# Pallas kernel.  OFF by default everywhere: the measurement table in the
# module docstring shows XLA bf16 wins at every serving batch size, so this
# is an opt-in escape hatch for shapes where the balance differs, not a
# production default.  Training always keeps the XLA path (the kernel
# defines no VJP).
_USE_FUSED = False
_INTERPRET = False  # tests: run the kernel in interpret mode on CPU


def use_fused_encoder_block(enable: bool = True, interpret: bool = False) -> None:
    """Toggle the fused-block dispatch.

    The flag is read at TRACE time: jitted functions compiled before the
    toggle keep their old routing (jax caches the trace).  Set it before the
    first jitted call of the session; to switch an already-compiled function,
    clear its cache (``fn.clear_cache()`` / ``jax.clear_caches()``) first.
    """
    global _USE_FUSED, _INTERPRET
    _USE_FUSED = enable
    _INTERPRET = interpret


def fused_block_enabled() -> bool:
    if not _USE_FUSED:
        return False
    if _INTERPRET:
        return True
    from explainable_spatial_vqa_tpu.ops.pallas_attention import pallas_available

    return pallas_available()


def fused_block_interpret() -> bool:
    return _INTERPRET

NEG_INF = -1e30
LN_EPS = 1e-6  # flax.linen.LayerNorm default


def pad_len(length: int, multiple: int = 8) -> int:
    return ((length + multiple - 1) // multiple) * multiple


def _block_kernel(num_heads: int,
                  x_ref, mask_ref,
                  wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  wo_ref, bo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                  out_ref):
    x = x_ref[0].astype(jnp.float32)  # (L, d)
    length, d_model = x.shape
    head_dim = d_model // num_heads
    keep = mask_ref[pl.program_id(0), :] > 0  # (L,)

    w_dtype = wq_ref.dtype
    xc = x.astype(w_dtype)
    q = jnp.dot(xc, wq_ref[...], preferred_element_type=jnp.float32) + bq_ref[...]
    k = jnp.dot(xc, wk_ref[...], preferred_element_type=jnp.float32) + bk_ref[...]
    v = jnp.dot(xc, wv_ref[...], preferred_element_type=jnp.float32) + bv_ref[...]

    scale = 1.0 / np.sqrt(head_dim).astype(np.float32)
    head_outs = []
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        scores = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
        scores = jnp.where(keep[None, :], scores, NEG_INF)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        weights = jnp.exp(scores)
        weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-30)
        head_outs.append(jnp.dot(weights, vh, preferred_element_type=jnp.float32))
    attn = jnp.concatenate(head_outs, axis=-1)  # scatter is not lowerable

    o = jnp.dot(attn.astype(w_dtype), wo_ref[...],
                preferred_element_type=jnp.float32) + bo_ref[...]

    def layer_norm(t, scale_ref, bias_ref):
        mean = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t - mean), axis=-1, keepdims=True)
        normed = (t - mean) * jax.lax.rsqrt(var + LN_EPS)
        return normed * scale_ref[...] + bias_ref[...]

    x1 = layer_norm(x + o, ln1s_ref, ln1b_ref)

    h1 = jnp.dot(x1.astype(w_dtype), w1_ref[...],
                 preferred_element_type=jnp.float32) + b1_ref[...]
    h1 = jnp.maximum(h1, 0.0)
    f = jnp.dot(h1.astype(w_dtype), w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]

    out_ref[0] = layer_norm(x1 + f, ln2s_ref, ln2b_ref).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_encoder_block(
    x: jnp.ndarray,  # (B, L, d)
    mask: Optional[jnp.ndarray],  # (B, L) bool/float or None
    weights: Tuple[jnp.ndarray, ...],  # see fuse_encoder_params order
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    batch, length, d_model = x.shape
    assert length % 8 == 0 and d_model % 128 == 0, "pad L to 8, d to 128"
    if mask is None:
        mask_f = jnp.ones((batch, length), jnp.float32)
    else:
        mask_f = mask.astype(jnp.float32)

    seq_spec = pl.BlockSpec((1, length, d_model), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((batch, length), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)

    def const_spec(w):
        return pl.BlockSpec(w.shape, lambda b: tuple(0 for _ in w.shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_block_kernel, num_heads),
        grid=(batch,),
        in_specs=[seq_spec, mask_spec] + [const_spec(w) for w in weights],
        out_specs=seq_spec,
        out_shape=jax.ShapeDtypeStruct((batch, length, d_model), x.dtype),
        interpret=interpret,
    )(x, mask_f, *weights)


def _tiled_kernel(num_heads: int, batch_tile: int, ffn_chunks: int,
                  x_ref, mask_ref,
                  wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  wo_ref, bo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
                  out_ref):
    """Batch-tiled variant: one grid cell processes ``batch_tile`` sequences.

    Projections and the FFN run on the flattened (batch_tile*L, d) row block
    (bigger MXU tiles, fewer weight revisits per row); attention runs
    per-sequence per-head.  All matmuls are in the weights' dtype (bf16 in
    production) with fp32 accumulation; LayerNorm/softmax are fp32, matching
    models.layers.EncoderBlock's mixed-precision contract.
    """
    tb, length, d_model = x_ref.shape
    head_dim = d_model // num_heads
    w_dtype = wq_ref.dtype

    x = x_ref[...].astype(jnp.float32)          # (TB, L, d)
    xf = x.reshape(tb * length, d_model).astype(w_dtype)
    q = jnp.dot(xf, wq_ref[...], preferred_element_type=jnp.float32) + bq_ref[...]
    k = jnp.dot(xf, wk_ref[...], preferred_element_type=jnp.float32) + bk_ref[...]
    v = jnp.dot(xf, wv_ref[...], preferred_element_type=jnp.float32) + bv_ref[...]
    q = q.reshape(tb, length, d_model).astype(w_dtype)
    k = k.reshape(tb, length, d_model).astype(w_dtype)
    v = v.reshape(tb, length, d_model).astype(w_dtype)

    base = pl.program_id(0) * tb
    scale = 1.0 / np.sqrt(head_dim).astype(np.float32)
    seq_outs = []
    for t in range(tb):
        keep = mask_ref[base + t, :] > 0        # (L,)
        head_outs = []
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            scores = jnp.dot(q[t, :, sl], k[t, :, sl].T,
                             preferred_element_type=jnp.float32) * scale
            scores = jnp.where(keep[None, :], scores, NEG_INF)
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            weights = jnp.exp(scores)
            weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-30)
            head_outs.append(jnp.dot(weights.astype(w_dtype), v[t, :, sl],
                                     preferred_element_type=jnp.float32))
        seq_outs.append(jnp.concatenate(head_outs, axis=-1))
    attn = jnp.stack(seq_outs).reshape(tb * length, d_model)

    o = jnp.dot(attn.astype(w_dtype), wo_ref[...],
                preferred_element_type=jnp.float32) + bo_ref[...]

    def layer_norm(t, scale_ref, bias_ref):
        mean = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t - mean), axis=-1, keepdims=True)
        normed = (t - mean) * jax.lax.rsqrt(var + LN_EPS)
        return normed * scale_ref[...] + bias_ref[...]

    x1 = layer_norm(x.reshape(tb * length, d_model) + o, ln1s_ref, ln1b_ref)

    # FFN, row-chunked so the (rows, ffn_dim) hidden never exceeds the VMEM
    # budget at large batch tiles.
    x1c = x1.astype(w_dtype)
    rows = tb * length
    chunk = rows // ffn_chunks
    f_parts = []
    for c in range(ffn_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        h1 = jnp.dot(x1c[sl], w1_ref[...],
                     preferred_element_type=jnp.float32) + b1_ref[...]
        h1 = jnp.maximum(h1, 0.0)
        f_parts.append(jnp.dot(h1.astype(w_dtype), w2_ref[...],
                               preferred_element_type=jnp.float32))
    f = jnp.concatenate(f_parts, axis=0) if ffn_chunks > 1 else f_parts[0]
    f = f + b2_ref[...]

    y = layer_norm(x1 + f, ln2s_ref, ln2b_ref)
    out_ref[...] = y.reshape(tb, length, d_model).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "batch_tile", "ffn_chunks", "interpret")
)
def fused_encoder_block_tiled(
    x: jnp.ndarray,  # (B, L, d)
    mask: Optional[jnp.ndarray],  # (B, L) bool/float or None
    weights: Tuple[jnp.ndarray, ...],  # see fuse_encoder_params order
    num_heads: int,
    batch_tile: int = 4,
    ffn_chunks: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    batch, length, d_model = x.shape
    assert length % 8 == 0 and d_model % 128 == 0, "pad L to 8, d to 128"
    assert batch % batch_tile == 0, "batch must divide by batch_tile"
    assert (batch_tile * length) % ffn_chunks == 0
    if mask is None:
        mask_f = jnp.ones((batch, length), jnp.float32)
    else:
        mask_f = mask.astype(jnp.float32)

    seq_spec = pl.BlockSpec((batch_tile, length, d_model), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((batch, length), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)

    def const_spec(w):
        return pl.BlockSpec(w.shape, lambda b: tuple(0 for _ in w.shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_tiled_kernel, num_heads, batch_tile, ffn_chunks),
        grid=(batch // batch_tile,),
        in_specs=[seq_spec, mask_spec] + [const_spec(w) for w in weights],
        out_specs=seq_spec,
        out_shape=jax.ShapeDtypeStruct((batch, length, d_model), x.dtype),
        interpret=interpret,
    )(x, mask_f, *weights)


def fuse_encoder_params(block_params: Dict[str, Any],
                        dtype: Any = jnp.float32) -> Tuple[jnp.ndarray, ...]:
    """Flatten a linen EncoderBlock's params into the kernel's weight order.

    Expects the models.layers.EncoderBlock tree: attn/{q,k,v,out}, ffn/
    {Dense_0,Dense_1}, norm1, norm2.  DenseGeneral kernels (d, H, Dh) are
    reshaped to (d, d); the out projection (H, Dh, d) to (d, d).
    """
    attn = block_params["attn"]
    d_model = attn["q"]["kernel"].shape[0]

    def qkv(name):
        kernel = jnp.asarray(attn[name]["kernel"]).reshape(d_model, d_model)
        bias = jnp.asarray(attn[name]["bias"]).reshape(d_model)
        return kernel.astype(dtype), bias.astype(jnp.float32)

    wq, bq = qkv("q")
    wk, bk = qkv("k")
    wv, bv = qkv("v")
    wo = jnp.asarray(attn["out"]["kernel"]).reshape(d_model, d_model).astype(dtype)
    bo = jnp.asarray(attn["out"]["bias"]).reshape(d_model).astype(jnp.float32)
    ffn = block_params["ffn"]
    w1 = jnp.asarray(ffn["Dense_0"]["kernel"]).astype(dtype)
    b1 = jnp.asarray(ffn["Dense_0"]["bias"]).astype(jnp.float32)
    w2 = jnp.asarray(ffn["Dense_1"]["kernel"]).astype(dtype)
    b2 = jnp.asarray(ffn["Dense_1"]["bias"]).astype(jnp.float32)
    ln1s = jnp.asarray(block_params["norm1"]["scale"]).astype(jnp.float32)
    ln1b = jnp.asarray(block_params["norm1"]["bias"]).astype(jnp.float32)
    ln2s = jnp.asarray(block_params["norm2"]["scale"]).astype(jnp.float32)
    ln2b = jnp.asarray(block_params["norm2"]["bias"]).astype(jnp.float32)
    return (wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b)
