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


def test_pad_len():
    assert pad_len(210) == 216
    assert pad_len(216) == 216
    assert pad_len(1) == 8
