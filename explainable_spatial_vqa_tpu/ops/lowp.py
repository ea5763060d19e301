"""Low-precision-IO (bf16) LayerNorm and softmax dispatch for serving.

Rationale (docs/DESIGN.md §10): at serving shapes the executor's fusion
encoder is HBM-bandwidth-bound between its matmuls — the fp32 attention
score/weight matrices ``(B, H, L, L)`` and fp32 LayerNorm outputs double the
bytes moved per block relative to bf16.  Both segments tolerate bf16 *IO*
as long as the *accumulations* stay fp32:

- LayerNorm: flax's ``_compute_stats`` computes mean/var in float32
  regardless of the module dtype (``force_float32_reductions=True``), so
  ``nn.LayerNorm(dtype=bfloat16)`` is exactly bf16-in/bf16-out with fp32
  statistics.  Parameters stay fp32 (``param_dtype`` is independent), so
  checkpoints are unaffected.
- Softmax: attention scores are still accumulated in fp32 on the MXU
  (``preferred_element_type``); with lowp enabled they MATERIALIZE in bf16
  (halving the score-matrix HBM write+read) and the max/exp/sum chain
  upcasts back to fp32 in-register inside the fused reduction kernel.

Flags follow the module-global trace-time pattern of
``ops.attention.use_pallas_attention``: jitted functions compiled BEFORE a
toggle keep their old routing (jax caches traces) — set flags before the
first jitted call, or ``jax.clear_caches()`` first.  Both default OFF —
and measurement kept them off: on the live TPU the lowp paths did NOT beat
fp32-IO at serving shapes (LN unchanged because XLA already fuses it into
the matmul epilogue; bf16-materialized softmax ~7% SLOWER — the convert
pair plus fusion barrier outweigh the bandwidth saved; docs/DESIGN.md §10).
bench.py therefore does NOT enable lowp; the module stays as the
parity-gated (tests/test_lowp.py) opt-in for future shapes where the
bandwidth math differs.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "use_lowp_norms",
    "use_lowp_softmax",
    "use_lowp_serving",
    "lowp_norms_enabled",
    "lowp_softmax_enabled",
    "norm_dtype",
]

_LOWP_NORMS = False
_LOWP_SOFTMAX = False


def use_lowp_norms(enable: bool = True) -> None:
    global _LOWP_NORMS
    _LOWP_NORMS = enable


def use_lowp_softmax(enable: bool = True) -> None:
    global _LOWP_SOFTMAX
    _LOWP_SOFTMAX = enable


def use_lowp_serving(enable: bool = True) -> None:
    """Enable/disable both bf16-IO segments (the serving configuration)."""
    use_lowp_norms(enable)
    use_lowp_softmax(enable)


def lowp_norms_enabled() -> bool:
    return _LOWP_NORMS


def lowp_softmax_enabled() -> bool:
    return _LOWP_SOFTMAX


def norm_dtype(compute_dtype) -> jnp.dtype:
    """LayerNorm module dtype: the block's compute dtype when lowp norms are
    enabled (bf16 IO, fp32 stats — see module docstring), else float32."""
    if _LOWP_NORMS and compute_dtype == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32
