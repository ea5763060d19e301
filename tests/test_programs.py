"""Program structure utilities: parity with reference serializations."""

from explainable_spatial_vqa_tpu.core import programs as prog


def test_postfix_prefix_parity(golden, fixture_val_question, fixture_train_question):
    for tag, q in (("val", fixture_val_question), ("train", fixture_train_question)):
        assert prog.program_to_str(q["program"], "postfix") == golden[tag]["postfix"]
        assert prog.program_to_str(q["program"], "prefix") == golden[tag]["prefix"]
        assert prog.is_chain(q["program"]) == golden[tag]["is_chain"]


def test_roundtrip_postfix(fixture_train_question):
    program = fixture_train_question["program"]
    postfix = prog.list_to_postfix(program)
    rebuilt = prog.postfix_to_list(postfix)
    # Round-tripped program must serialize identically in every mode.
    for mode in ("postfix", "prefix"):
        assert prog.program_to_str(rebuilt, mode) == prog.program_to_str(program, mode)


def test_roundtrip_prefix(fixture_train_question):
    program = fixture_train_question["program"]
    prefix = prog.list_to_prefix(program)
    rebuilt = prog.prefix_to_list(prefix)
    for mode in ("postfix", "prefix"):
        assert prog.program_to_str(rebuilt, mode) == prog.program_to_str(program, mode)


def test_arity():
    assert prog.arity("scene") == 0
    for f in ("union", "intersect", "less_than", "greater_than", "equal_color",
              "equal_integer", "equal_object"):
        assert prog.arity(f) == 2
    for f in ("filter_size", "unique", "relate", "count", "query_color", "same_shape"):
        assert prog.arity(f) == 1


def test_function_token_roundtrip():
    cases = [
        {"function": "filter_size", "value_inputs": ["large"]},
        {"function": "scene", "value_inputs": []},
        {"function": "relate", "value_inputs": ["left"]},
    ]
    for c in cases:
        token = prog.function_token(c)
        assert prog.parse_function_token(token) == c
    assert prog.function_token(cases[0]) == "filter_size[large]"


def test_chain_detection():
    chain = [
        {"function": "scene", "inputs": [], "value_inputs": []},
        {"function": "count", "inputs": [0], "value_inputs": []},
    ]
    assert prog.is_chain(chain)
    tree = [
        {"function": "scene", "inputs": [], "value_inputs": []},
        {"function": "scene", "inputs": [], "value_inputs": []},
        {"function": "union", "inputs": [0, 1], "value_inputs": []},
    ]
    assert not prog.is_chain(tree)
