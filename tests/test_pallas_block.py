"""Fused Pallas encoder block: numeric parity with the linen EncoderBlock."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.models.layers import EncoderBlock
from explainable_spatial_vqa_tpu.ops.pallas_block import (
    fuse_encoder_params,
    fused_encoder_block,
    pad_len,
)


@pytest.mark.parametrize("masked", [False, True])
def test_fused_block_matches_linen(masked):
    d_model, num_heads, length, batch = 128, 4, 16, 2
    block = EncoderBlock(d_model, num_heads, d_model * 4, dropout=0.0)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, length, d_model), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)

    if masked:
        key_mask = jnp.ones((batch, length), bool).at[:, -5:].set(False)
        mask4 = key_mask[:, None, None, :]
    else:
        key_mask, mask4 = None, None

    ref = block.apply(variables, x, mask4)
    weights = fuse_encoder_params(variables["params"])
    out = fused_encoder_block(x, key_mask, weights, num_heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("batch_tile,ffn_chunks", [(2, 1), (4, 2)])
def test_tiled_block_matches_linen(masked, batch_tile, ffn_chunks):
    from explainable_spatial_vqa_tpu.ops.pallas_block import (
        fused_encoder_block_tiled,
    )

    d_model, num_heads, length, batch = 128, 4, 16, 4
    block = EncoderBlock(d_model, num_heads, d_model * 4, dropout=0.0)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(batch, length, d_model), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)

    if masked:
        # distinct mask per sequence exercises the per-cell base-row indexing
        key_mask = jnp.ones((batch, length), bool)
        for b in range(batch):
            key_mask = key_mask.at[b, length - 1 - b :].set(False)
        mask4 = key_mask[:, None, None, :]
    else:
        key_mask, mask4 = None, None

    ref = block.apply(variables, x, mask4)
    weights = fuse_encoder_params(variables["params"])
    out = fused_encoder_block_tiled(
        x, key_mask, weights, num_heads,
        batch_tile=batch_tile, ffn_chunks=ffn_chunks, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("batch", [3, 4])  # odd -> per-seq, even -> tiled
def test_encoder_block_fused_dispatch_matches_xla(batch):
    """EncoderBlock's fused-kernel route (used on TPU serving) must equal the
    XLA path, including the L-padding round trip (L=14 pads to 16)."""
    from explainable_spatial_vqa_tpu.ops import pallas_block as pb

    d_model, num_heads, length = 128, 1, 14
    block = EncoderBlock(d_model, num_heads, d_model * 4, dropout=0.0)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(batch, length, d_model), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    key_mask = jnp.ones((batch, length), bool).at[:, -3:].set(False)
    mask4 = key_mask[:, None, None, :]

    ref = block.apply(variables, x, mask4)
    pb.use_fused_encoder_block(True, interpret=True)
    try:
        out = block.apply(variables, x, mask4)
    finally:
        pb.use_fused_encoder_block(False)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pad_len():
    assert pad_len(210) == 216
    assert pad_len(216) == 216
    assert pad_len(1) == 8
