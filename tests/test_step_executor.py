"""Step-executor seq2seq: shapes, jit, and cache-consistency of decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.core.config import StepSeq2SeqConfig
from explainable_spatial_vqa_tpu.models.step_executor import (
    StepExecutorSeq2Seq,
    image_grid_to_tokens,
)
from explainable_spatial_vqa_tpu.ops.decoding import greedy_decode

CFG = StepSeq2SeqConfig(
    vocab_size=16, d_model=16, num_heads=2, encoder_layers=1, decoder_layers=1,
    ffn_dim=32, max_src_len=8, max_tgt_len=4, num_image_tokens=4, image_feature_dim=8,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = StepExecutorSeq2Seq(CFG)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((2, CFG.num_image_tokens, CFG.image_feature_dim))
    src = jnp.zeros((2, 5), dtype=jnp.int32)
    tgt = jnp.zeros((2, 4), dtype=jnp.int32)
    variables = model.init(rng, img, src, tgt)
    return model, variables


def _inputs(batch=2, src_len=5):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, CFG.num_image_tokens, CFG.image_feature_dim), jnp.float32)
    src = jnp.asarray(rng.randint(1, CFG.vocab_size, (batch, src_len)), jnp.int32)
    return img, src


def test_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    img, src = _inputs()
    tgt = jnp.zeros((2, 4), dtype=jnp.int32)
    logits = model.apply(variables, img, src, tgt)
    assert logits.shape == (2, 4, CFG.vocab_size)


def test_image_grid_to_tokens():
    grid = jnp.arange(2 * 3 * 2 * 2).reshape(2, 3, 2, 2)
    tokens = image_grid_to_tokens(grid)
    assert tokens.shape == (2, 4, 3)
    # token 0 = channel values at spatial (0, 0)
    np.testing.assert_array_equal(np.asarray(tokens[0, 0]), np.asarray(grid[0, :, 0, 0]))


def test_cached_decode_matches_full_redecode(model_and_vars):
    """Greedy decode via scan+KV-cache must match the reference-style
    re-run-the-whole-decoder-per-token loop exactly."""
    model, variables = model_and_vars
    img, src = _inputs()
    pad_mask = jnp.ones_like(src, dtype=bool)
    memory, key_mask = model.apply(variables, img, src, pad_mask, method=model.encode)

    max_len = CFG.max_tgt_len
    start = 1

    # reference-style loop: grow the prefix, full decode, take the last logits
    ys = jnp.full((img.shape[0], 1), start, dtype=jnp.int32)
    for _ in range(max_len):
        logits = model.apply(variables, ys, memory, key_mask, method=model.decode)
        next_tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        ys = jnp.concatenate([ys, next_tok[:, None]], axis=1)
    naive = np.asarray(ys[:, 1:])

    cached = np.asarray(
        greedy_decode(model, variables, memory, key_mask, start, max_len)
    )
    np.testing.assert_array_equal(cached, naive)


def test_decode_is_jittable(model_and_vars):
    model, variables = model_and_vars
    img, src = _inputs()

    @jax.jit
    def run(img, src):
        memory, key_mask = model.apply(variables, img, src, None, method=model.encode)
        return greedy_decode(model, variables, memory, None, 1, CFG.max_tgt_len, end_token=2)

    out = run(img, src)
    assert out.shape == (2, CFG.max_tgt_len)


def test_padding_mask_effect(model_and_vars):
    """Padded src positions must not influence the encoder output when masked."""
    model, variables = model_and_vars
    img, src = _inputs()
    src_a = src.at[:, -2:].set(0)
    src_b = src.at[:, -2:].set(7)
    mask = jnp.ones_like(src, dtype=bool).at[:, -2:].set(False)
    mem_a, _ = model.apply(variables, img, src_a, mask, method=model.encode)
    mem_b, _ = model.apply(variables, img, src_b, mask, method=model.encode)
    # positions other than the padded ones agree
    np.testing.assert_allclose(
        np.asarray(mem_a[:, : -2]), np.asarray(mem_b[:, : -2]), atol=1e-5
    )
