"""Transformer / LSTM IQAP family tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from explainable_spatial_vqa_tpu.core.config import IQAPConfig, LstmIQAPConfig
from explainable_spatial_vqa_tpu.models.iqap import TransformerIQAP, generate_programs
from explainable_spatial_vqa_tpu.models.lstm_iqap import LstmIQAP

IQAP_CFG = IQAPConfig(
    vocab_size=20, program_vocab_size=12, num_answer_classes=6, embed_dim=16,
    hidden_dim=16, num_heads=2, encoder_layers=1, decoder_layers=1,
    num_image_tokens=4, image_feature_dim=8, program_len=5, max_question_len=7,
    dropout=0.0,
)


def _inputs(batch=2):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, 4, 8), jnp.float32)
    q = jnp.asarray(rng.randint(1, 20, (batch, 7)), jnp.int32)
    return img, q


def test_transformer_iqap_forward_and_generate():
    model = TransformerIQAP(IQAP_CFG)
    img, q = _inputs()
    variables = model.init(jax.random.PRNGKey(0), img, q, method=model.init_all)
    out = model.apply(variables, img, q)
    assert out["answer_logits"].shape == (2, 6)
    tokens, logits = generate_programs(model, variables, out["memory"])
    assert tokens.shape == (2, 5)
    assert logits.shape == (2, 5, 12)

    # generation semantics parity: logits at step t from cached decode equal
    # the reference-style full re-decode on the generated prefix
    prefix = jnp.concatenate(
        [jnp.full((2, 1), IQAP_CFG.sos_token, jnp.int32), tokens[:, :-1]], axis=1
    )
    tf_logits = model.apply(
        variables, prefix, out["memory"], method=model.decode_programs_tf
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(tf_logits), atol=2e-4)


def test_transformer_iqap_bbox_head():
    cfg = IQAPConfig(
        vocab_size=20, program_vocab_size=12, num_answer_classes=6, embed_dim=16,
        hidden_dim=16, num_heads=2, encoder_layers=1, decoder_layers=1,
        num_image_tokens=4, image_feature_dim=8, program_len=5, max_question_len=7,
        dropout=0.0, with_bbox_head=True, num_bbox_slots=3,
    )
    model = TransformerIQAP(cfg)
    img, q = _inputs()
    variables = model.init(jax.random.PRNGKey(0), img, q)
    out = model.apply(variables, img, q)
    boxes = np.asarray(out["pred_boxes"])
    assert boxes.shape == (2, 3, 4)
    assert (boxes >= 0).all() and (boxes <= 1).all()


@pytest.mark.parametrize("with_prog", [True, False], ids=["iqap", "iqa"])
def test_lstm_iqap(with_prog):
    cfg = LstmIQAPConfig(
        vocab_size=20, program_vocab_size=12, num_answer_classes=6, embed_dim=16,
        hidden_dim=24, image_feature_dim=8, image_spatial=(2, 2), program_len=5,
        with_program_decoder=with_prog, dropout=0.0,
    )
    model = LstmIQAP(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 8, 2, 2), jnp.float32)
    q = jnp.asarray(rng.randint(1, 20, (2, 7)), jnp.int32)
    targets = jnp.asarray(rng.randint(0, 12, (2, 5)), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        img, q, targets,
    )
    out = model.apply(variables, img, q, targets)
    assert out["answer_logits"].shape == (2, 6)
    if with_prog:
        assert out["program_logits"].shape == (2, 5, 12)
        assert out["program_tokens"].shape == (2, 5)
        # teacher forcing path needs the sample rng
        out_tf = model.apply(
            variables, img, q, targets, deterministic=False, teacher_forcing=1.0,
            rngs={"sample": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        )
        assert out_tf["program_logits"].shape == (2, 5, 12)
    else:
        assert "program_logits" not in out
