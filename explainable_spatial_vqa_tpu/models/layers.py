"""Shared neural building blocks (Flax linen).

- sinusoidal 1D positional encoding (parity with the reference's
  ``PositionalEncoding``, train_transformer_full_annotation_new.py:16-30),
- 2D sine-cosine positional embeddings for image feature grids and box
  centers (thesis §3.4.2 p.17-18),
- multi-head attention with explicit, functional KV caches (the reference
  re-runs its whole decoder per generated token with no cache —
  train_transformer_iqap.py:213-268; here decode is a ``lax.scan`` over a
  cache, see :mod:`explainable_spatial_vqa_tpu.ops.decoding`),
- pre/post-LN transformer encoder and decoder blocks.

All matmul-bearing modules compute in ``dtype`` (bfloat16 by default in
training) with float32 parameters and float32 softmax/layernorm.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from explainable_spatial_vqa_tpu.ops.attention import (
    dot_product_attention,
    make_causal_mask,
)

__all__ = [
    "sinusoidal_positions",
    "posemb_2d_sincos",
    "posemb_2d_sincos_at",
    "PositionalEncoding",
    "MultiHeadAttention",
    "FeedForward",
    "EncoderBlock",
    "DecoderBlock",
    "TransformerEncoder",
    "TransformerDecoder",
    "make_causal_mask",
]

KVCache = Dict[str, jnp.ndarray]


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) interleaved sin/cos table; identical values to the
    reference PositionalEncoding buffer."""
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model))
    table = np.zeros((max_len, d_model), dtype=np.float32)
    table[:, 0::2] = np.sin(position * div_term)
    table[:, 1::2] = np.cos(position * div_term)
    return table


def posemb_2d_sincos(h: int, w: int, d_model: int) -> np.ndarray:
    """(h*w, d_model) 2D sine-cosine embedding: first half encodes x, second
    half y (thesis p.17)."""
    assert d_model % 2 == 0, "d_model must be even for 2D sincos"
    half = d_model // 2
    x_table = sinusoidal_positions(w, half)  # (w, half)
    y_table = sinusoidal_positions(h, half)  # (h, half)
    out = np.zeros((h, w, d_model), dtype=np.float32)
    out[:, :, :half] = x_table[None, :, :]
    out[:, :, half:] = y_table[:, None, :]
    return out.reshape(h * w, d_model)


def posemb_2d_sincos_at(xy: jnp.ndarray, d_model: int, temperature: float = 10000.0) -> jnp.ndarray:
    """Continuous 2D sincos embedding evaluated at normalized (x, y) in [0,1].

    ``xy``: (..., 2).  Used for box-center positional features (thesis p.18).
    Coordinates are scaled to a nominal 14-step grid so that the frequency
    spectrum matches the image-grid embedding.
    """
    assert d_model % 2 == 0
    half = d_model // 2
    freqs = jnp.exp(
        jnp.arange(0, half, 2, dtype=jnp.float32) * (-np.log(temperature) / half)
    )  # (half/2,)
    coords = xy[..., None] * 14.0  # (..., 2, 1) nominal grid scale
    angles = coords * freqs  # (..., 2, half/2)
    # INTERLEAVE sin/cos per frequency ([sin f0, cos f0, sin f1, ...]) to
    # match sinusoidal_positions' channel layout — a box token at (x, y)
    # then aligns channel-for-channel with the image patch at (x, y)
    emb = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    emb = emb.reshape(emb.shape[:-3] + (2, half))  # (..., 2, half)
    return emb.reshape(emb.shape[:-2] + (d_model,))


class PositionalEncoding(nn.Module):
    """Adds the fixed sinusoidal table; optional dropout, as in the reference."""

    d_model: int
    max_len: int = 5000
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True, offset=0) -> jnp.ndarray:
        table = jnp.asarray(sinusoidal_positions(self.max_len, self.d_model), dtype=x.dtype)
        if isinstance(offset, int) and offset == 0:
            x = x + table[: x.shape[-2]]
        else:
            # traced offset (single-token decode step)
            import jax

            x = x + jax.lax.dynamic_slice_in_dim(table, offset, x.shape[-2], axis=0)
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class MultiHeadAttention(nn.Module):
    """MHA with optional functional KV cache for single-token decode.

    Cache protocol: ``cache = {"k": (B, L, H, D), "v": (B, L, H, D)}`` with a
    scalar ``index`` marking the write position.  ``__call__`` with
    ``cache=None`` is the full-sequence path; with a cache it consumes a
    single query token, writes its K/V at ``index`` and attends over
    ``cache[:index+1]`` via masking (static shapes — scan-friendly).
    """

    d_model: int
    num_heads: int
    dtype: Any = jnp.float32

    def setup(self) -> None:
        assert self.d_model % self.num_heads == 0
        self.head_dim = self.d_model // self.num_heads
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            features=(self.num_heads, self.head_dim),
            dtype=self.dtype,
            name=name,
        )
        self.q_proj = dense("q")
        self.k_proj = dense("k")
        self.v_proj = dense("v")
        self.out_proj = nn.DenseGeneral(
            features=self.d_model, axis=(-2, -1), dtype=self.dtype, name="out"
        )

    def __call__(
        self,
        query: jnp.ndarray,
        keyvalue: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        q = self.q_proj(query)
        k = self.k_proj(keyvalue)
        v = self.v_proj(keyvalue)
        out = dot_product_attention(q, k, v, mask)
        return self.out_proj(out)

    def project_kv(self, keyvalue: jnp.ndarray) -> KVCache:
        """Precompute K/V (used once per sequence for cross-attention)."""
        return {"k": self.k_proj(keyvalue), "v": self.v_proj(keyvalue)}

    def attend_precomputed(
        self, query: jnp.ndarray, kv: KVCache, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        q = self.q_proj(query)
        out = dot_product_attention(q, kv["k"], kv["v"], mask)
        return self.out_proj(out)

    def decode_step(
        self, query_token: jnp.ndarray, cache: KVCache, index: jnp.ndarray
    ) -> Tuple[jnp.ndarray, KVCache]:
        """query_token: (B, 1, d_model); returns ((B, 1, d_model), new cache)."""
        q = self.q_proj(query_token)  # (B, 1, H, D)
        k_new = self.k_proj(query_token)  # (B, 1, H, D)
        v_new = self.v_proj(query_token)
        max_len = cache["k"].shape[1]
        onehot = (jnp.arange(max_len) == index)[None, :, None, None]
        cache = {
            "k": jnp.where(onehot, k_new, cache["k"]),
            "v": jnp.where(onehot, v_new, cache["v"]),
        }
        valid = (jnp.arange(max_len) <= index)[None, None, None, :]  # (1,1,1,L)
        out = dot_product_attention(q, cache["k"], cache["v"], valid)
        return self.out_proj(out), cache

    def init_cache(self, batch: int, max_len: int) -> KVCache:
        shape = (batch, max_len, self.num_heads, self.head_dim)
        return {
            "k": jnp.zeros(shape, dtype=self.dtype),
            "v": jnp.zeros(shape, dtype=self.dtype),
        }


class FeedForward(nn.Module):
    d_model: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.ffn_dim, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return h


class EncoderBlock(nn.Module):
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    norm: str = "post"  # torch nn.Transformer default; "pre" available
    dtype: Any = jnp.float32

    def setup(self) -> None:
        from explainable_spatial_vqa_tpu.ops.lowp import norm_dtype

        self.attn = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype)
        self.ffn = FeedForward(self.d_model, self.ffn_dim, self.dropout, dtype=self.dtype)
        # norm dtype resolves at trace time: fp32 IO by default, bf16 IO
        # (fp32 stats) when serving opts into ops.lowp — params stay fp32
        self.norm1 = nn.LayerNorm(dtype=norm_dtype(self.dtype))
        self.norm2 = nn.LayerNorm(dtype=norm_dtype(self.dtype))
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.norm == "pre":
            h = self.attn(self.norm1(x).astype(self.dtype), self.norm1(x).astype(self.dtype), mask)
            x = x + self.drop(h, deterministic=deterministic)
            h = self.ffn(self.norm2(x).astype(self.dtype), deterministic)
            return x + self.drop(h, deterministic=deterministic)
        if self._fused_eligible(deterministic, mask):
            return self._fused_forward(x, mask)
        h = self.attn(x, x, mask)
        x = self.norm1(x + self.drop(h, deterministic=deterministic)).astype(self.dtype)
        h = self.ffn(x, deterministic)
        return self.norm2(x + self.drop(h, deterministic=deterministic)).astype(self.dtype)

    def _fused_eligible(self, deterministic: bool, mask) -> bool:
        """Route to the fused Pallas kernel (ops.pallas_block) when it is the
        measured winner: TPU serving (deterministic, post-LN, bf16 compute,
        key-padding mask only) with MXU-aligned d_model.  Training and init
        stay on the XLA path (the kernel defines no VJP; init must create the
        submodule params)."""
        if self.is_initializing() or not deterministic:
            return False
        from explainable_spatial_vqa_tpu.ops import pallas_block as pb

        if not pb.fused_block_enabled():
            return False
        if self.dtype != jnp.bfloat16 and not pb.fused_block_interpret():
            return False  # fp32 weights overflow the 16 MB VMEM budget
        if self.d_model % 128 != 0 or (self.d_model // self.num_heads) % 128 != 0:
            return False
        return mask is None or (
            mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1
        )

    def _fused_forward(self, x: jnp.ndarray, mask) -> jnp.ndarray:
        from explainable_spatial_vqa_tpu.ops import pallas_block as pb

        batch, length, _ = x.shape
        key_mask = None if mask is None else mask[:, 0, 0, :]
        pad = pb.pad_len(length) - length
        if pad:
            if key_mask is None:
                key_mask = jnp.ones((batch, length), bool)
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
        weights = pb.fuse_encoder_params(self.variables["params"], dtype=self.dtype)
        x = x.astype(self.dtype)
        # per-sequence kernel: the faster of the two at every measured
        # serving batch (see the table in ops/pallas_block.py; the tiled
        # variant never wins and stays opt-in via direct call)
        y = pb.fused_encoder_block(
            x, key_mask, weights, self.num_heads,
            interpret=pb.fused_block_interpret(),
        )
        return y[:, :length].astype(self.dtype)


class DecoderBlock(nn.Module):
    """Decoder block with self-attention + cross-attention; supports both the
    teacher-forced full-sequence path and cached single-token decode."""

    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    norm: str = "post"
    dtype: Any = jnp.float32

    def setup(self) -> None:
        from explainable_spatial_vqa_tpu.ops.lowp import norm_dtype

        self.self_attn = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype)
        self.cross_attn = MultiHeadAttention(self.d_model, self.num_heads, dtype=self.dtype)
        self.ffn = FeedForward(self.d_model, self.ffn_dim, self.dropout, dtype=self.dtype)
        self.norm1 = nn.LayerNorm(dtype=norm_dtype(self.dtype))
        self.norm2 = nn.LayerNorm(dtype=norm_dtype(self.dtype))
        self.norm3 = nn.LayerNorm(dtype=norm_dtype(self.dtype))
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray,
        self_mask: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        h = self.self_attn(x, x, self_mask)
        x = self.norm1(x + self.drop(h, deterministic=deterministic)).astype(self.dtype)
        h = self.cross_attn(x, memory, memory_mask)
        x = self.norm2(x + self.drop(h, deterministic=deterministic)).astype(self.dtype)
        h = self.ffn(x, deterministic)
        return self.norm3(x + self.drop(h, deterministic=deterministic)).astype(self.dtype)

    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray) -> Dict[str, Any]:
        """Self-attention KV cache + precomputed cross-attention K/V."""
        return {
            "self": self.self_attn.init_cache(batch, max_len),
            "cross": self.cross_attn.project_kv(memory),
        }

    def decode_step(
        self,
        x: jnp.ndarray,
        cache: Dict[str, Any],
        index: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        h, self_cache = self.self_attn.decode_step(x, cache["self"], index)
        x = self.norm1(x + h).astype(self.dtype)
        h = self.cross_attn.attend_precomputed(x, cache["cross"], memory_mask)
        x = self.norm2(x + h).astype(self.dtype)
        h = self.ffn(x, deterministic=True)
        x = self.norm3(x + h).astype(self.dtype)
        return x, {"self": self_cache, "cross": cache["cross"]}


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    norm: str = "post"
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize block activations in backward

    def setup(self) -> None:
        block_cls = (nn.remat(EncoderBlock, static_argnums=(3,))
                     if self.remat else EncoderBlock)
        self.blocks = [
            block_cls(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout, self.norm, self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for block in self.blocks:
            x = block(x, mask, deterministic)
        return x


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    norm: str = "post"
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.blocks = [
            DecoderBlock(
                self.d_model, self.num_heads, self.ffn_dim, self.dropout, self.norm, self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(
        self,
        x: jnp.ndarray,
        memory: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        causal = make_causal_mask(x.shape[1])
        for block in self.blocks:
            x = block(x, memory, causal, memory_mask, deterministic)
        return x

    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray) -> Tuple[Dict[str, Any], ...]:
        return tuple(block.init_cache(batch, max_len, memory) for block in self.blocks)

    def decode_step(
        self,
        x: jnp.ndarray,
        caches: Tuple[Dict[str, Any], ...],
        index: jnp.ndarray,
        memory_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Tuple[Dict[str, Any], ...]]:
        new_caches = []
        for block, cache in zip(self.blocks, caches):
            x, cache = block.decode_step(x, cache, index, memory_mask)
            new_caches.append(cache)
        return x, tuple(new_caches)
