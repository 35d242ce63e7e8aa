"""Integration tests of the harness post-passes without a model: caption
JSONL -> chunked self-critical eval -> CHAIR results tree (reference
chair_test.py:375-460 formats), and the POPE question-builder path
(reference pope_metric/main.py)."""
import json
import os

import pytest

from dropoutdecoding_tpu.cli.chair_test import chair_eval
from dropoutdecoding_tpu.cli.pope_test import refresh_questions
from dropoutdecoding_tpu.evalsuite.coco import Coco
from dropoutdecoding_tpu.evalsuite.metrics.evalcap import chunked_self_critical_eval

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


@pytest.fixture
def coco_dir(tmp_path):
    ann = tmp_path / "annotations"
    ann.mkdir()
    images = [
        {"id": i, "file_name": f"COCO_val2014_{i:012d}.jpg"} for i in range(1, 7)
    ]
    captions = {
        "images": images,
        "annotations": [
            {"id": 100 + i, "image_id": i, "caption": f"a dog next to a chair number {i}"}
            for i in range(1, 7)
        ]
        + [
            {"id": 200 + i, "image_id": i, "caption": "a dog sitting on a chair"}
            for i in range(1, 7)
        ],
    }
    instances = {
        "categories": [
            {"id": 1, "name": "dog"},
            {"id": 2, "name": "chair"},
            {"id": 3, "name": "cat"},
            {"id": 4, "name": "car"},
        ],
        "images": images,
        "annotations": [
            # vary per-image object sets so POPE negatives exist
            {"image_id": i, "category_id": 1 + ((i + j) % 4), "id": 1000 + i * 10 + j}
            for i in range(1, 7)
            for j in range(3)
        ],
    }
    with open(ann / "captions_val2014.json", "w") as f:
        json.dump(captions, f)
    with open(ann / "instances_val2014.json", "w") as f:
        json.dump(instances, f)
    return tmp_path


def test_chair_eval_end_to_end(coco_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    coco = Coco(str(coco_dir / "annotations" / "captions_val2014.json"))
    # per-image GT: seg objects (image 1: chair/cat/car, 2: cat/car/dog,
    # 3: car/dog/chair) + caption objects {dog, chair} everywhere
    captions = [
        {"image_id": 1, "caption": "a dog sitting on a chair"},  # clean
        {"image_id": 2, "caption": "a dog next to a sheep"},  # sheep halluc.
        {"image_id": 3, "caption": "a cat and a chair"},  # cat halluc.
    ]
    formatted = chunked_self_critical_eval(coco, captions)
    fpath = tmp_path / "formatted.json"
    with open(fpath, "w") as f:
        json.dump(formatted, f)

    chair_eval(
        chair_input_path=str(fpath),
        model_type="llava-1.5",
        num_images=500,
        output_dir=str(tmp_path / "results"),
        dataset_name="coco",
        data_dir=str(coco_dir),
        metric="testmethod",
        verbosity=True,
    )
    out_dir = tmp_path / "results" / "testmethod" / "llava_llava-1.5" / "coco"
    stem = "llava_llava-1.5_coco_num_images_500_chair_results"
    assert (out_dir / f"{stem}.txt").exists()
    assert (out_dir / f"{stem}.json").exists()
    table = (out_dir / f"{stem}.txt").read_text().splitlines()
    assert table[0] == "SPICE\tMETEOR\tCIDEr\tCHAIRs\tCHAIRi"
    values = table[1].split("\t")
    assert len(values) == 5
    with open(out_dir / f"{stem}.json") as f:
        result = json.load(f)
    # 2 of 3 captions hallucinate (sheep on img 2, cat on img 3)
    assert result["overall_metrics"]["CHAIRs"] == pytest.approx(2 / 3)
    halluc = {
        s["image_id"]: s["mscoco_hallucinated_words"] for s in result["sentences"]
    }
    assert halluc[1] == []
    assert halluc[2] == [["sheep", "sheep"]]
    assert halluc[3] == [["cat", "cat"]]


def test_pope_refresh_questions(coco_dir, tmp_path):
    out = str(tmp_path / "pope_out")
    paths = refresh_questions(str(coco_dir), out, n_images=4, seed=0)
    assert set(paths) == {"random", "popular", "adversarial"}
    for strategy, path in paths.items():
        with open(path) as f:
            qs = [json.loads(l) for l in f]
        assert qs, strategy
        labels = {q["label"] for q in qs}
        assert labels == {"yes", "no"}
        for q in qs:
            assert q["text"].startswith("Is there a")


def test_make_engine_quantize_flag_plumbing(monkeypatch, tiny_llava):
    """--quantize w8a8 + --int8-kv reach the engine: int8 weight leaves,
    w8a8_prefill and int8_kv set (the CLI->engine wiring the e2e tests
    bypass via their fake make_engine)."""
    from argparse import Namespace

    from dropoutdecoding_tpu.cli import chair_test as cli
    from dropoutdecoding_tpu.models import llava as llava_mod

    _, cfg, params, _, _, _ = tiny_llava

    class _Tok:
        eos_token_id = 2

    class _Proc:
        tokenizer = _Tok()

    from dropoutdecoding_tpu.utils import processor as proc_mod

    monkeypatch.setattr(
        proc_mod.VlmProcessor, "from_checkpoint",
        staticmethod(lambda path: _Proc()),
    )
    monkeypatch.setattr(llava_mod, "load", lambda path, dtype: (cfg, params))

    args = Namespace(
        model="llava-1.5", model_path="/unused", opera=False, vcd=False,
        original=False, num_beams=None, avg=False, voting_numbers=3,
        use_random=False, seed=None, quantize="w8a8", int8_kv=True,
    )
    engine, _ = cli.make_engine(args)
    assert engine.w8a8_prefill is True
    assert engine.int8_kv is True
    assert isinstance(engine.params.lm["layers"]["q_proj"], dict)  # int8
    assert set(engine.params.lm["layers"]["q_proj"]) == {"q", "s"}

    args.quantize = None
    args.int8_kv = False
    engine2, _ = cli.make_engine(args)
    assert engine2.w8a8_prefill is False and engine2.int8_kv is False
    assert not isinstance(engine2.params.lm["layers"]["q_proj"], dict)
