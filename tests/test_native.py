"""Native symbolic engine: parity with the Python executor on random programs
(fuzz), fixtures, and the poisoning semantics; plus a batched path check."""

import json
import pathlib

import numpy as np
import pytest

from explainable_spatial_vqa_tpu.clevr import native
from explainable_spatial_vqa_tpu.clevr.executor import INVALID, Executor, execute_program
from explainable_spatial_vqa_tpu.clevr.scenes import Scene


def execute_tolerant(scene, program):
    """Python execution with the annotate-layer poisoning semantics: stop at
    the first error or INVALID (ill-typed fuzz programs raise otherwise)."""
    ex = Executor(scene)
    outputs = []
    for node in program:
        try:
            inputs = [outputs[i] for i in node.get("inputs", [])]
            value = ex.apply(node["function"], inputs, node.get("value_inputs", []))
        except Exception:
            break
        outputs.append(value)
        if value == INVALID:
            break
    return outputs

REF = pathlib.Path("/root/reference/code")

needs_native = pytest.mark.skipif(
    not native.native_available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def scene(fixture_scene):
    return Scene.from_raw(fixture_scene)


def _random_program(rng, max_len=14):
    """Random *type-plausible* CLEVR program: dependencies are drawn from
    pools matching each function's input type, so the only runtime failures
    are the real ones (unique over non-singleton sets -> INVALID and the
    positional poisoning cascade), which both engines must agree on."""
    attrs_list = ["color", "shape", "size", "material"]
    fns = []
    sets, objs, ints, bools, vals = [], [], [], [], []
    n = rng.randint(3, max_len)
    for i in range(n):
        if i == 0 or (not sets and not objs):
            fns.append({"function": "scene", "inputs": [], "value_inputs": []})
            sets.append(i)
            continue
        choice = rng.randint(0, 12)
        if choice <= 2 and sets:
            attr = attrs_list[rng.randint(0, 4)]
            value = native.ATTR_VALUES[attr][rng.randint(0, len(native.ATTR_VALUES[attr]))]
            fns.append({"function": f"filter_{attr}", "inputs": [int(rng.choice(sets))],
                        "value_inputs": [value]})
            sets.append(i)
        elif choice == 3 and sets:
            fns.append({"function": "unique", "inputs": [int(rng.choice(sets))],
                        "value_inputs": []})
            objs.append(i)  # may be INVALID at runtime -> poisoning path
        elif choice == 4 and objs:
            rel = ["left", "right", "front", "behind"][rng.randint(0, 4)]
            fns.append({"function": "relate", "inputs": [int(rng.choice(objs))],
                        "value_inputs": [rel]})
            sets.append(i)
        elif choice == 5 and len(sets) >= 2:
            fn = ["union", "intersect"][rng.randint(0, 2)]
            deps = [int(rng.choice(sets)), int(rng.choice(sets))]
            fns.append({"function": fn, "inputs": deps, "value_inputs": []})
            sets.append(i)
        elif choice == 6 and sets:
            fn = ["count", "exist"][rng.randint(0, 2)]
            fns.append({"function": fn, "inputs": [int(rng.choice(sets))],
                        "value_inputs": []})
            (ints if fn == "count" else bools).append(i)
        elif choice == 7 and objs:
            attr = attrs_list[rng.randint(0, 4)]
            fns.append({"function": f"query_{attr}", "inputs": [int(rng.choice(objs))],
                        "value_inputs": []})
            vals.append(i)
        elif choice == 8 and len(ints) >= 1 and len(ints + bools) >= 2:
            fn = ["equal_integer", "less_than", "greater_than"][rng.randint(0, 3)]
            pool = ints if fn != "equal_integer" else ints + bools
            deps = [int(rng.choice(pool)), int(rng.choice(pool))]
            fns.append({"function": fn, "inputs": deps, "value_inputs": []})
            bools.append(i)
        elif choice == 9 and len(vals) >= 2:
            attr = attrs_list[rng.randint(0, 4)]
            deps = [int(rng.choice(vals)), int(rng.choice(vals))]
            fns.append({"function": f"equal_{attr}", "inputs": deps, "value_inputs": []})
            bools.append(i)
        elif choice == 10 and objs:
            attr = attrs_list[rng.randint(0, 4)]
            fns.append({"function": f"same_{attr}", "inputs": [int(rng.choice(objs))],
                        "value_inputs": []})
            sets.append(i)
        else:
            fns.append({"function": "scene", "inputs": [], "value_inputs": []})
            sets.append(i)
    return fns


@needs_native
def test_native_parity_fixture_question(scene, fixture_val_question):
    program = fixture_val_question["program"]
    assert native.execute_native(scene, program) == execute_program(scene, program)


@needs_native
def test_native_parity_synthetic(scene, golden_synthetic):
    for q in golden_synthetic["questions"]:
        program = q["program"]
        py = execute_program(scene, program)
        nat = native.execute_native(scene, program)
        assert nat == py, program


@needs_native
def test_native_parity_fuzz(scene):
    rng = np.random.RandomState(0)
    packed = native.PackedScene(scene)
    mismatches = []
    for trial in range(500):
        program = _random_program(rng)
        py = execute_tolerant(scene, program)
        nat = native.execute_native(scene, program, packed)
        if nat != py:
            mismatches.append((trial, program, py, nat))
    assert not mismatches, mismatches[:2]


@needs_native
def test_native_batch(scene, golden_synthetic):
    packed = native.PackedScene(scene)
    programs = [native.pack_program(q["program"]) for q in golden_synthetic["questions"]]
    out = native.execute_batch_native(packed, programs)
    assert out.shape[0] == sum(p.shape[0] for p in programs)
    # spot-check: first program's outputs equal single-program execution
    first = golden_synthetic["questions"][0]["program"]
    single = native.execute_native(scene, first, packed)
    decoded = native._decode(out[: len(first)], first, packed.n_obj)
    assert decoded == single


@needs_native
def test_native_speedup(scene):
    """The native engine must beat the Python executor by a wide margin."""
    import time

    rng = np.random.RandomState(1)
    programs = [_random_program(rng) for _ in range(3000)]
    packed = native.PackedScene(scene)
    packed_programs = [native.pack_program(p) for p in programs]

    t0 = time.perf_counter()
    for p in programs:
        execute_tolerant(scene, p)
    python_time = time.perf_counter() - t0

    native_time = min(
        __import__("timeit").timeit(
            lambda: native.execute_batch_native(packed, packed_programs), number=1
        )
        for _ in range(3)
    )
    # timing under parallel test load is noisy; require a clear win, not a ratio
    assert native_time < python_time, (python_time, native_time)
