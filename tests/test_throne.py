"""THRONE-style evaluator (evalsuite/throne.py) + chair2throne converter."""
import json

from dropoutdecoding_tpu.cli.chair2throne import convert
from dropoutdecoding_tpu.evalsuite.throne import evaluate_throne


def test_throne_scoring():
    responses = [
        {"image_id": 1, "response": "a dog sitting on a chair"},
        {"image_id": 2, "response": "a cat next to a dog"},  # cat is FP
        {"image_id": 3, "response": "an empty room"},  # misses everything
    ]
    gt = {1: {"dog", "chair"}, 2: {"dog"}, 3: {"person"}}
    out = evaluate_throne(responses, gt)
    assert out["num_responses"] == 3
    assert out["per_class"]["dog"]["tp"] == 2
    assert out["per_class"]["cat"]["fp"] == 1
    assert out["per_class"]["person"]["fn"] == 1
    assert out["hallucination_rate"] == 1 / 3
    assert 0 < out["macro_f1"] <= 1


def test_chair2throne_roundtrip(tmp_path):
    cap = tmp_path / "caps.jsonl"
    with open(cap, "w") as f:
        for i, text in [(1, "a dog"), (2, "a cat"), (1, "dup ignored")]:
            f.write(json.dumps({"image_id": i, "caption": text}) + "\n")
    out = tmp_path / "throne.jsonl"
    n = convert(str(cap), str(out))
    assert n == 2
    recs = [json.loads(l) for l in open(out)]
    assert recs[0] == {
        "image_id": 1,
        "question": "Describe the image.",
        "response": "a dog",
    }
    # converted output feeds the evaluator directly
    score = evaluate_throne(recs, {1: {"dog"}, 2: {"dog"}})
    assert score["per_class"]["cat"]["fp"] == 1
