#!/usr/bin/env python
"""Regenerate the golden parity fixtures in tests/data/ by running the
REFERENCE implementation (mounted read-only at /root/reference) as the oracle.

Only needed when the fixture inputs change; the checked-in goldens are the
source of truth for parity tests.  Requires the reference mount.
"""

import copy
import importlib.util
import json
import os
import sys
import tempfile

REF = "/root/reference/code"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data")


def load_mod(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_annotate(mod, scene, questions):
    with tempfile.TemporaryDirectory() as td:
        sp, qp = os.path.join(td, "s.json"), os.path.join(td, "q.json")
        json.dump({"scenes": [scene]}, open(sp, "w"))
        json.dump({"questions": questions}, open(qp, "w"))
        return mod.annotate_questions_with_relevant_objects(sp, qp)


def synthetic_questions():
    """The fixed synthetic program suite (mirrors tests/data usage)."""

    def n(fn, inputs=(), vals=()):
        return {"function": fn, "inputs": list(inputs), "value_inputs": list(vals)}

    programs = {
        "count_large": [n("scene"), n("filter_size", [0], ["large"]), n("count", [1])],
        "relate_query": [n("scene"), n("filter_shape", [0], ["cylinder"]), n("unique", [1]),
                         n("relate", [2], ["left"]), n("filter_color", [3], ["gray"]),
                         n("unique", [4]), n("query_material", [5])],
        "union_intersect": [n("scene"), n("filter_size", [0], ["small"]), n("scene"),
                            n("filter_shape", [2], ["cube"]), n("union", [1, 3]),
                            n("count", [4]), n("scene"), n("filter_material", [6], ["metal"]),
                            n("intersect", [1, 7]), n("count", [8]), n("greater_than", [5, 9])],
        "invalid_unique": [n("scene"), n("unique", [0]), n("query_color", [1]),
                           n("scene"), n("count", [3])],
        "equal_compare": [n("scene"), n("filter_color", [0], ["gray"]), n("count", [1]),
                          n("scene"), n("filter_material", [3], ["rubber"]), n("count", [4]),
                          n("equal_integer", [2, 5])],
        "same_attrs": [n("scene"), n("filter_size", [0], ["large"]),
                       n("filter_material", [1], ["metal"]), n("unique", [2]),
                       n("same_color", [3]), n("exist", [4])],
        "less_than": [n("scene"), n("filter_shape", [0], ["sphere"]), n("count", [1]),
                      n("scene"), n("filter_shape", [3], ["cube"]), n("count", [4]),
                      n("less_than", [2, 5])],
        "query_size_shape": [n("scene"), n("filter_color", [0], ["brown"]),
                             n("unique", [1]), n("query_size", [2])],
    }
    return [
        {"image_index": 0, "question": f"synthetic {name}", "question_index": i,
         "image_filename": "x.png", "split": "val", "question_family_index": 0,
         "answer": "yes", "program": program}
        for i, (name, program) in enumerate(programs.items())
    ]


def main():
    sys.path.insert(0, os.path.join(REF, "preprocess_questions"))
    up = load_mod("utils_programs", f"{REF}/preprocess_questions/utils_programs.py")
    upre = load_mod("utils_preprocess", f"{REF}/preprocess_questions/utils_preprocess.py")
    v3 = load_mod("pcv3", f"{REF}/preprocess_scenes/preprocess_continousv3.py")
    pfa = load_mod("pfa", f"{REF}/preprocess_scenes/preprocess_full_annotation.py")
    pss = load_mod("pss", f"{REF}/preprocess_scenes/preprocess_into_single_string.py")
    pwa = load_mod("pwa", f"{REF}/preprocess_questions/preprocess_with_annotations.py")
    bv = load_mod("bvoc", f"{REF}/preprocess_questions/build_vocab.py")

    scene = json.load(open(f"{REF}/inspecting_scripts/CLEVR_val_scenes_first.json"))["scenes"][0]
    q_val = json.load(open(f"{REF}/inspecting_scripts/CLEVR_val_questions_first.json"))["questions"][0]
    q_train = json.load(open(f"{REF}/examples/CLEVR_train_questions_first.json"))["questions"][0]
    synthetic = synthetic_questions()
    all_q = synthetic + [q_val]

    # -- golden_reference.json ------------------------------------------------
    golden = {}
    for tag, q in (("val", q_val), ("train", q_train)):
        golden[tag] = {
            "question": q["question"], "answer": q["answer"],
            "postfix": up.list_to_str(up.list_to_postfix(q["program"])),
            "prefix": up.list_to_str(up.list_to_prefix(q["program"])),
            "is_chain": up.is_chain(q["program"]),
            "question_tokens": upre.tokenize(q["question"], punct_to_keep=[";", ","],
                                             punct_to_remove=["?", "."]),
        }
        golden[tag]["program_tokens_postfix"] = upre.tokenize(golden[tag]["postfix"])
    golden["scene_bboxes_4dec"] = [v3.approximate_bounding_box(o, scene)
                                   for o in scene["objects"]]
    golden["scene_bboxes_1dec"] = [pfa.approximate_bounding_box(o, scene)
                                   for o in scene["objects"]]
    annotated_val = ref_annotate(v3, scene, [q_val])
    golden["annotated_val"] = copy.deepcopy(annotated_val)
    vocabs = v3.build_vocab_from_dataset(annotated_val)
    golden["split_vocab"] = vocabs
    golden["annotated_val_converted"] = [v3.apply_vocab(copy.deepcopy(a), vocabs)
                                         for a in annotated_val]
    json.dump(golden, open(f"{OUT}/golden_reference.json", "w"), indent=1)

    # -- golden_synthetic.json ------------------------------------------------
    annotated = ref_annotate(v3, scene, synthetic)
    vocabs = v3.build_vocab_from_dataset(annotated)
    converted = [v3.apply_vocab(copy.deepcopy(a), vocabs) for a in annotated]
    prog_v = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    ans_v, ques_v = dict(prog_v), dict(prog_v)
    for path in (f"{REF}/examples/CLEVR_val_questions_first.json",
                 f"{REF}/examples/CLEVR_test_questions_first.json",
                 f"{REF}/examples/CLEVR_train_questions_first.json"):
        for q in json.load(open(path)).get("questions", []):
            for item in q.get("program", []):
                fn = item.get("function", "undefined_function")
                for vi in item.get("value_inputs") or [None]:
                    key = f"{fn}[{vi}]" if vi is not None else fn
                    prog_v.setdefault(key, len(prog_v))
            if "answer" in q:
                ans_v.setdefault(q["answer"], len(ans_v))
            for w in bv.tokenize(q.get("question", "")):
                ques_v.setdefault(w.lower(), len(ques_v))
    json.dump({"questions": synthetic, "annotated": annotated, "split_vocab": vocabs,
               "converted": converted,
               "clevr_vocab": {"program_token_to_idx": prog_v,
                               "question_token_to_idx": ques_v,
                               "answer_token_to_idx": ans_v}},
              open(f"{OUT}/golden_synthetic.json", "w"), indent=1)

    # -- golden_full_annotation.json ------------------------------------------
    annotated = ref_annotate(pfa, scene, all_q)
    vocab = pfa.build_vocab_from_dataset(annotated)
    converted = [pfa.apply_vocab(copy.deepcopy(a), vocab) for a in annotated]
    json.dump({"questions": all_q, "annotated": annotated, "joint_vocab": vocab,
               "converted": converted},
              open(f"{OUT}/golden_full_annotation.json", "w"), indent=1)

    # -- golden_single_string.json ---------------------------------------------
    with tempfile.TemporaryDirectory() as td:
        sp, qp = os.path.join(td, "s.json"), os.path.join(td, "q.json")
        json.dump({"scenes": [scene]}, open(sp, "w"))
        json.dump({"questions": all_q}, open(qp, "w"))
        annotated = pss.annotate_questions_autoregressive_string(sp, qp)
    strings = [a["annotated_program_string"] for a in annotated]
    json.dump({"questions": all_q, "strings": strings},
              open(f"{OUT}/golden_single_string.json", "w"), indent=1)

    # -- golden_mapped_sequences.json ------------------------------------------
    records = [{"image_index": q["image_index"], "question": q["question"],
                "answer": q["answer"], "annotated_program_string": s}
               for q, s in zip(all_q, strings)]
    with tempfile.TemporaryDirectory() as td:
        jp = os.path.join(td, "ann.json")
        json.dump({"questions": records}, open(jp, "w"))
        (ql, al, pl, ii, t2i, _) = pwa.build_vocab_and_data(jp)
    json.dump({"records": records, "token_to_id": t2i,
               "q_ids": pwa.convert_to_ids(ql, t2i, 20).tolist(),
               "a_ids": pwa.convert_to_ids(al, t2i, 5).tolist(),
               "p_ids": pwa.convert_to_ids(pl, t2i, 100).tolist(),
               "image_index": list(map(int, ii))},
              open(f"{OUT}/golden_mapped_sequences.json", "w"), indent=1)

    print("goldens regenerated in", OUT)


if __name__ == "__main__":
    main()
