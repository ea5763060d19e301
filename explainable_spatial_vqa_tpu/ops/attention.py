"""Scaled dot-product attention.

``dot_product_attention`` is the XLA path: a single fused
einsum-softmax-einsum that XLA maps onto the MXU; sequence lengths here are
short (<=250 tokens), so full materialization of the score matrix is optimal
(no flash-style tiling needed — the whole score tile fits in VMEM).

A Pallas fused kernel for the executor's fusion encoder lives in
:mod:`explainable_spatial_vqa_tpu.ops.pallas_attention`; this module is the
reference implementation and the fallback on CPU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = [
    "dot_product_attention",
    "make_causal_mask",
    "combine_masks",
    "use_pallas_attention",
]

NEG_INF = -1e30  # large-but-finite; avoids NaNs from all-masked rows

# Global kernel dispatch: when enabled, self-attention calls with key-padding
# masks route to the Pallas fused kernel (ops.pallas_attention); everything
# else stays on the XLA path.  Enabled for TPU inference/training runs.
_USE_PALLAS = False


def use_pallas_attention(enable: bool = True) -> None:
    global _USE_PALLAS
    _USE_PALLAS = enable


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention over (..., T, H, D) tensors (head axis second-to-last-but-one).

    q: (B, Tq, H, D); k, v: (B, Tk, H, D); mask: broadcastable to
    (B, H, Tq, Tk), True = attend.  Returns (B, Tq, H, D).
    Softmax runs in float32 regardless of input dtype (bfloat16-safe).
    """
    if _USE_PALLAS:
        from explainable_spatial_vqa_tpu.ops import pallas_attention

        same_len = q.shape[1] == k.shape[1]
        key_pad_only = mask is None or (
            mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1
        )
        if same_len and key_pad_only and pallas_attention.pallas_available():
            return pallas_attention.fused_attention(q, k, v, mask)

    dtype = q.dtype
    depth = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(depth, jnp.float32))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    if dtype == jnp.bfloat16:
        from explainable_spatial_vqa_tpu.ops.lowp import lowp_softmax_enabled

        if lowp_softmax_enabled():
            # bf16-IO softmax: the (B, H, Tq, Tk) score matrix MATERIALIZES
            # in bf16 (halving its HBM write + read between the two matmuls;
            # -1e30 is representable — bf16 keeps fp32's exponent range).
            # The optimization_barrier pins the bf16 buffer as the fusion
            # boundary (otherwise XLA folds the down-up convert pair into one
            # fp32 fusion and the bandwidth win evaporates); the max/exp/sum
            # chain below upcasts to fp32 in-register inside the fused
            # reduction kernel, so accumulation precision is kept.
            import jax

            scores = jax.lax.optimization_barrier(
                scores.astype(jnp.bfloat16)
            ).astype(jnp.float32)
    weights = jnp.exp(scores - scores.max(axis=-1, keepdims=True))
    weights = weights / (weights.sum(axis=-1, keepdims=True) + 1e-30)
    weights = weights.astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32).astype(
        dtype
    )


def make_causal_mask(length: int) -> jnp.ndarray:
    """(1, 1, T, T) lower-triangular boolean mask."""
    idx = jnp.arange(length)
    return (idx[None, :] <= idx[:, None])[None, None, :, :]


def combine_masks(*masks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """AND together broadcastable boolean masks, ignoring Nones."""
    present = [m for m in masks if m is not None]
    if not present:
        return None
    out = present[0]
    for m in present[1:]:
        out = jnp.logical_and(out, m)
    return out
