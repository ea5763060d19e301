"""Tokenizer / vocabulary parity tests."""

import json
import pathlib

from explainable_spatial_vqa_tpu.core import tokenizer as tok
from explainable_spatial_vqa_tpu.core import vocab as voc

EXAMPLES = pathlib.Path("/root/reference/code/examples")


def test_question_tokenize_parity(golden, fixture_val_question, fixture_train_question):
    for tag, q in (("val", fixture_val_question), ("train", fixture_train_question)):
        tokens = tok.tokenize(q["question"], punct_to_keep=[";", ","], punct_to_remove=["?", "."])
        assert tokens == golden[tag]["question_tokens"]


def test_program_tokenize_parity(golden):
    for tag in ("val", "train"):
        tokens = tok.tokenize(golden[tag]["postfix"])
        assert tokens == golden[tag]["program_tokens_postfix"]


def test_encode_decode_roundtrip():
    vocab = dict(tok.SPECIAL_TOKENS)
    for w in ["how", "many", "red", "things"]:
        vocab[w] = len(vocab)
    ids = tok.encode(["<START>", "how", "many", "red", "things", "<END>"], vocab)
    inv = voc.invert_vocab(vocab)
    assert tok.decode(ids, inv) == ["<START>", "how", "many", "red", "things", "<END>"]
    # decode stops at first <END>
    assert tok.decode(ids + [4, 5], inv)[-1] == "<END>"


def test_unknown_token_handling():
    vocab = dict(tok.SPECIAL_TOKENS)
    assert tok.encode(["zzz"], vocab, allow_unk=True) == [3]
    try:
        tok.encode(["zzz"], vocab, allow_unk=False)
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_clevr_vocab_parity(golden_synthetic):
    collections = []
    for split in ("val", "test", "train"):
        with open(EXAMPLES / f"CLEVR_{split}_questions_first.json") as f:
            collections.append(json.load(f)["questions"])
    built = voc.build_clevr_vocab(collections)
    assert built == golden_synthetic["clevr_vocab"]


def test_split_vocab_parity(golden):
    built = voc.build_split_vocab(golden["annotated_val"])
    assert built == golden["split_vocab"]


def test_split_vocab_parity_synthetic(golden_synthetic):
    built = voc.build_split_vocab(golden_synthetic["annotated"])
    assert built == golden_synthetic["split_vocab"]


def test_apply_split_vocab_parity(golden):
    import copy

    vocabs = golden["split_vocab"]
    converted = [
        voc.apply_split_vocab(copy.deepcopy(q), vocabs) for q in golden["annotated_val"]
    ]
    assert converted == golden["annotated_val_converted"]


def test_apply_split_vocab_parity_synthetic(golden_synthetic):
    import copy

    vocabs = golden_synthetic["split_vocab"]
    converted = [
        voc.apply_split_vocab(copy.deepcopy(q), vocabs) for q in golden_synthetic["annotated"]
    ]
    assert converted == golden_synthetic["converted"]


def test_bbox_text_detection():
    assert voc.is_bounding_box_text("[0.1234 0.5678 0.9012 0.3456]")
    assert voc.is_bounding_box_text("[0.1 0.2 0.3 0.4] [0.5 0.6 0.7 0.8]".replace("0.1", "0.1000"))
    assert not voc.is_bounding_box_text("true")
    assert not voc.is_bounding_box_text("")
    assert not voc.is_bounding_box_text("[0.1 0.2 0.3 0.4] extra")


def test_canonicalize():
    assert voc.canonicalize("yes") == "true"
    assert voc.canonicalize("No") == "false"
    assert voc.canonicalize("True") == "true"
    assert voc.canonicalize("cube") == "cube"
