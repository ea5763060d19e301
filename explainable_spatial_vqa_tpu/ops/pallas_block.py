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

Measured on v5e (B=128, L=216, d=512, H=4): XLA fp32 56.3 ms / XLA bf16
29.9 ms / this kernel (bf16 weights) 49.4 ms.  fp32 weights exceed the 16 MB
VMEM scoped limit by ~140 KB at this size (bf16 fits).  Verdict: the
per-cell whole-sequence layout serializes the batch through one core and
feeds the MXU (216x512)x(512x512) tiles, while XLA batches the projections
over all 128x216 rows — XLA's fusion wins at this scale, so the kernel
remains an opt-in reference implementation; the production path stays on
XLA (bf16), which is also what bench.py measures.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_encoder_block", "fuse_encoder_params", "pad_len"]

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
