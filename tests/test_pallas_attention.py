"""Pallas fused attention: numeric parity with the XLA path (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.ops.attention import (
    dot_product_attention,
    make_causal_mask,
    use_pallas_attention,
)
from explainable_spatial_vqa_tpu.ops.pallas_attention import fused_attention


def _qkv(B=2, L=16, H=2, D=8, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, L, H, D), jnp.float32)  # noqa: E731
    return mk(), mk(), mk()


def test_parity_no_mask():
    q, k, v = _qkv()
    ref = dot_product_attention(q, k, v)
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_parity_key_padding_mask():
    q, k, v = _qkv(seed=1)
    mask = jnp.ones((2, 1, 1, 16), bool).at[:, :, :, -5:].set(False)
    ref = dot_product_attention(q, k, v, mask)
    out = fused_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_causal_falls_back_to_xla():
    q, k, v = _qkv(seed=2)
    causal = make_causal_mask(16)
    ref = dot_product_attention(q, k, v, causal)
    out = fused_attention(q, k, v, causal, interpret=True)  # fallback path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_global_dispatch_flag():
    q, k, v = _qkv(seed=3)
    ref = dot_product_attention(q, k, v)
    use_pallas_attention(True)
    try:
        # on CPU pallas_available() is False -> still XLA, must be identical
        out = dot_product_attention(q, k, v)
    finally:
        use_pallas_attention(False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)
