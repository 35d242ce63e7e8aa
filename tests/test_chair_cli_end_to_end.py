"""Whole-harness integration: cli.chair_test.main() with a tiny random
LLaVA engine over a synthetic COCO directory (images + annotations),
producing captions, the self-critical JSON, and the CHAIR results tree —
the complete L5→L4 pipeline of SURVEY.md §3.1 minus real weights."""
import json
import os
from argparse import Namespace

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


@pytest.fixture
def synthetic_coco(tmp_path):
    rng = np.random.default_rng(0)
    ann = tmp_path / "annotations"
    val = tmp_path / "val2014"
    ann.mkdir()
    val.mkdir()
    images = []
    for i in range(1, 5):
        name = f"COCO_val2014_{i:012d}.jpg"
        Image.fromarray(
            (rng.random((40, 52, 3)) * 255).astype(np.uint8), "RGB"
        ).save(val / name, "JPEG")
        images.append({"id": i, "file_name": name})
    captions = {
        "images": images,
        "annotations": [
            {"id": 10 * i + j, "image_id": i, "caption": f"a dog and a chair {j}"}
            for i in range(1, 5)
            for j in range(2)
        ],
    }
    instances = {
        "categories": [{"id": 1, "name": "dog"}, {"id": 2, "name": "chair"}],
        "images": images,
        "annotations": [
            {"id": 900 + i, "image_id": i, "category_id": 1 + i % 2}
            for i in range(1, 5)
        ],
    }
    (ann / "captions_val2014.json").write_text(json.dumps(captions))
    (ann / "instances_val2014.json").write_text(json.dumps(instances))
    return tmp_path


class _TinyProcessor:
    """Stands in for VlmProcessor: fixed prompt ids + 28px pixel pipeline."""

    def __init__(self, cfg):
        self.cfg = cfg

        class _Tok:
            eos_token_id = 2

        self.tokenizer = _Tok()

    def __call__(self, prompt, image=None):
        ids = np.array([[1, 5, 9, self.cfg.image_token_index, 11, 13]], np.int32)
        out = {"input_ids": ids}
        if image is not None:
            arr = np.asarray(image.resize((28, 28)), np.float32) / 255.0
            out["pixel_values"] = arr.transpose(2, 0, 1)[None]
        return out

    def decode(self, token_ids, skip_special_tokens=True):
        return "a dog next to a chair token" + "".join(
            f" t{int(t)}" for t in token_ids
        )


def test_chair_cli_main_end_to_end(synthetic_coco, tmp_path, monkeypatch, tiny_llava):
    from dropoutdecoding_tpu.cli import chair_test as cli
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

    _, cfg, params, _, _, _ = tiny_llava

    def fake_make_engine(args):
        eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=2),
            max_len=48,
            ensemble=not cli.str2bool(args.original),
        )
        eng.param_dtype = jnp.float32
        return eng, _TinyProcessor(cfg)

    monkeypatch.setattr(cli, "make_engine", fake_make_engine)
    monkeypatch.chdir(tmp_path)

    args = cli.build_parser().parse_args(
        [
            "--method", "itest",
            "--coco-data-dir", str(synthetic_coco),
            "--model-path", "/unused",
            "--image-numbers", "4",
            "--seed", "0",
            "--output-dir", str(tmp_path / "outputs"),
            "--sample-save-name", str(tmp_path / "sample.log"),
            "--throne", "True",
        ]
    )
    cli.main(args)

    # sample persistence (reference chair_test.py:222-243)
    assert len(open(tmp_path / "sample.log").read().split()) == 4
    # caption JSONL
    out_files = os.listdir(tmp_path / "outputs")
    jsonl = [f for f in out_files if f.startswith("itest")]
    assert jsonl
    records = [
        json.loads(l)
        for l in open(tmp_path / "outputs" / jsonl[0])
        if l.strip()
    ]
    assert len(records) == 4
    assert set(records[0]) == {"image_id", "caption"}
    # results tree (reference chair_eval layout)
    stem = "results/itest/llava_llava-1.5/coco/llava_llava-1.5_coco_num_images_500_chair_results"
    table = open(tmp_path / f"{stem}.txt").read().splitlines()
    assert table[0] == "SPICE\tMETEOR\tCIDEr\tCHAIRs\tCHAIRi"
    result = json.load(open(tmp_path / f"{stem}.json"))
    assert 0.0 <= result["overall_metrics"]["CHAIRs"] <= 1.0
    assert len(result["sentences"]) == 4
    # THRONE export + score (--throne True)
    throne = json.load(
        open(tmp_path / "results/itest/llava_llava-1.5/coco/llava_llava-1.5_coco_throne_results.json")
    )
    assert throne["num_responses"] == 4
    assert 0.0 <= throne["hallucination_rate"] <= 1.0


def _mk_fake_engine(cfg, params, *, ensemble, use_cd=False, num_beams=1):
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

    eng = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(),
        gen=GenerationConfig(
            max_new_tokens=4,
            eos_token_id=2,
            pad_token_id=2,
            use_cd=use_cd,
            num_beams=num_beams,
        ),
        max_len=48,
        ensemble=ensemble,
    )
    eng.param_dtype = jnp.float32
    return eng


def _run_cli(cli, synthetic_coco, workdir, extra):
    args = cli.build_parser().parse_args(
        [
            "--method", "itest",
            "--coco-data-dir", str(synthetic_coco),
            "--model-path", "/unused",
            "--image-numbers", "4",
            "--seed", "0",
            "--output-dir", str(workdir / "outputs"),
            "--sample-save-name", str(workdir / "sample.log"),
        ]
        + extra
    )
    cli.main(args)
    out = [f for f in os.listdir(workdir / "outputs") if f.startswith("itest")]
    records = [
        json.loads(l)
        for l in open(workdir / "outputs" / out[0])
        if l.strip()
    ]
    return {r["image_id"]: r["caption"] for r in records}


def test_chair_cli_batched_original_matches_serial(
    synthetic_coco, tmp_path, monkeypatch, tiny_llava
):
    """--original --batch-size N must run the batched greedy path and
    produce token-identical captions to the serial loop (round-2 verdict
    weak #3: the flag used to be silently ignored for --original)."""
    from dropoutdecoding_tpu.cli import chair_test as cli

    _, cfg, params, _, _, _ = tiny_llava

    monkeypatch.setattr(
        cli,
        "make_engine",
        lambda args: (
            _mk_fake_engine(cfg, params, ensemble=False),
            _TinyProcessor(cfg),
        ),
    )

    d1 = tmp_path / "serial"
    d2 = tmp_path / "batched"
    d1.mkdir(); d2.mkdir()
    monkeypatch.chdir(d1)
    serial = _run_cli(cli, synthetic_coco, d1, ["--original", "True"])
    monkeypatch.chdir(d2)
    batched = _run_cli(
        cli, synthetic_coco, d2, ["--original", "True", "--batch-size", "3"]
    )
    assert serial == batched
    assert len(serial) == 4


def test_chair_cli_batched_vcd_matches_serial(
    synthetic_coco, tmp_path, monkeypatch, tiny_llava
):
    """--vcd --batch-size N captions == serial --vcd (vcd_generate's
    per-row key streams make every batched row sample exactly like its
    own B=1 call)."""
    from dropoutdecoding_tpu.cli import chair_test as cli

    _, cfg, params, _, _, _ = tiny_llava

    monkeypatch.setattr(
        cli,
        "make_engine",
        lambda args: (
            _mk_fake_engine(cfg, params, ensemble=False, use_cd=True),
            _TinyProcessor(cfg),
        ),
    )

    d1 = tmp_path / "serial"
    d2 = tmp_path / "batched"
    d1.mkdir(); d2.mkdir()
    monkeypatch.chdir(d1)
    serial = _run_cli(cli, synthetic_coco, d1, ["--vcd", "True"])
    monkeypatch.chdir(d2)
    batched = _run_cli(
        cli, synthetic_coco, d2, ["--vcd", "True", "--batch-size", "3"]
    )
    assert serial == batched
    assert len(serial) == 4


def test_chair_cli_batched_beam_matches_serial(
    synthetic_coco, tmp_path, monkeypatch, tiny_llava
):
    """--num-beams N --batch-size M captions == serial beam (beam_generate
    runs B independent searches in one program) — with this, every method
    the CLI offers accepts --batch-size."""
    from dropoutdecoding_tpu.cli import chair_test as cli

    _, cfg, params, _, _, _ = tiny_llava

    monkeypatch.setattr(
        cli,
        "make_engine",
        lambda args: (
            _mk_fake_engine(cfg, params, ensemble=False, num_beams=3),
            _TinyProcessor(cfg),
        ),
    )

    d1 = tmp_path / "serial"
    d2 = tmp_path / "batched"
    d1.mkdir(); d2.mkdir()
    monkeypatch.chdir(d1)
    serial = _run_cli(
        cli, synthetic_coco, d1, ["--original", "True", "--num-beams", "3"]
    )
    monkeypatch.chdir(d2)
    batched = _run_cli(
        cli,
        synthetic_coco,
        d2,
        ["--original", "True", "--num-beams", "3", "--batch-size", "3"],
    )
    assert serial == batched
    assert len(serial) == 4


def test_chair_cli_spec_gamma_matches_original(
    synthetic_coco, tmp_path, monkeypatch, tiny_llava
):
    """--spec-gamma (speculative greedy) captions == plain --original
    captions: greedy acceptance guarantees token identity; only the
    number of target dispatches changes."""
    from dropoutdecoding_tpu.cli import chair_test as cli
    from dropoutdecoding_tpu.engine.speculative import SpeculativeGreedy

    _, cfg, params, _, _, _ = tiny_llava

    def fake_plain(args):
        return _mk_fake_engine(cfg, params, ensemble=False), _TinyProcessor(cfg)

    def fake_spec(args):
        eng = _mk_fake_engine(cfg, params, ensemble=False)
        eng._spec = SpeculativeGreedy(engine=eng, draft_lm=params.lm, gamma=3)
        return eng, _TinyProcessor(cfg)

    d1 = tmp_path / "plain"
    d2 = tmp_path / "spec"
    d1.mkdir(); d2.mkdir()
    monkeypatch.setattr(cli, "make_engine", fake_plain)
    monkeypatch.chdir(d1)
    plain = _run_cli(cli, synthetic_coco, d1, ["--original", "True"])
    monkeypatch.setattr(cli, "make_engine", fake_spec)
    monkeypatch.chdir(d2)
    spec = _run_cli(
        cli, synthetic_coco, d2,
        ["--original", "True", "--spec-gamma", "3"],
    )
    assert plain == spec
    assert len(plain) == 4


def test_chair_cli_spec_ngram_matches_original(
    synthetic_coco, tmp_path, monkeypatch, tiny_llava
):
    """--spec-gamma with the ngram (prompt-lookup) draft: captions ==
    plain --original through the CLI — greedy acceptance guarantees
    token identity with zero draft weight streams."""
    from dropoutdecoding_tpu.cli import chair_test as cli
    from dropoutdecoding_tpu.engine.speculative import SpeculativeGreedy

    _, cfg, params, _, _, _ = tiny_llava

    def fake_plain(args):
        return _mk_fake_engine(cfg, params, ensemble=False), _TinyProcessor(cfg)

    def fake_spec(args):
        eng = _mk_fake_engine(cfg, params, ensemble=False)
        eng._spec = SpeculativeGreedy(
            engine=eng, draft_lm=None, gamma=3, draft="ngram"
        )
        return eng, _TinyProcessor(cfg)

    d1 = tmp_path / "plain"
    d2 = tmp_path / "spec"
    d1.mkdir(); d2.mkdir()
    monkeypatch.setattr(cli, "make_engine", fake_plain)
    monkeypatch.chdir(d1)
    plain = _run_cli(cli, synthetic_coco, d1, ["--original", "True"])
    monkeypatch.setattr(cli, "make_engine", fake_spec)
    monkeypatch.chdir(d2)
    spec = _run_cli(
        cli, synthetic_coco, d2,
        ["--original", "True", "--spec-gamma", "3", "--spec-draft", "ngram"],
    )
    assert plain == spec
    assert len(plain) == 4


def test_chair_cli_opera_end_to_end(
    synthetic_coco, tmp_path, monkeypatch, tiny_llava
):
    """--opera True runs the native OPERA arm (the round-3 CLI gate is
    gone).  At penalty_weights=0 with a full candidate pool the captions
    must equal plain --num-beams beam search (engine equivalence is pinned
    in tests/test_opera.py; this checks the CLI wiring end to end)."""
    from dropoutdecoding_tpu.cli import chair_test as cli

    _, cfg, params, _, _, _ = tiny_llava

    def fake_beam(args):
        return (
            _mk_fake_engine(cfg, params, ensemble=False, num_beams=3),
            _TinyProcessor(cfg),
        )

    def fake_opera(args):
        eng = _mk_fake_engine(cfg, params, ensemble=False, num_beams=3)
        eng._opera = dict(
            num_beams=3,
            scale_factor=args.scale_factor,
            threshold=args.threshold,
            num_attn_candidates=6,
            penalty_weights=0.0,
            length_penalty=1.0,
        )
        return eng, _TinyProcessor(cfg)

    d1 = tmp_path / "beam"
    d2 = tmp_path / "opera"
    d1.mkdir(); d2.mkdir()
    monkeypatch.setattr(cli, "make_engine", fake_beam)
    monkeypatch.chdir(d1)
    beam = _run_cli(
        cli, synthetic_coco, d1, ["--original", "True", "--num-beams", "3"]
    )
    monkeypatch.setattr(cli, "make_engine", fake_opera)
    monkeypatch.chdir(d2)
    opera = _run_cli(
        cli, synthetic_coco, d2,
        ["--opera", "True", "--threshold", "1000000"],
    )
    assert opera == beam
    assert len(opera) == 4


def test_chair_cli_opera_flag_surface(tiny_llava):
    """The reference OPERA knobs parse with their chair-arm defaults
    (reference chair_test.py:312-323) and --opera excludes --batch-size."""
    from dropoutdecoding_tpu.cli import chair_test as cli

    p = cli.build_parser()
    args = p.parse_args(
        ["--method", "m", "--coco-data-dir", "d", "--model-path", "m"]
    )
    assert args.scale_factor == 5.0
    assert args.threshold == 15
    assert args.num_attn_candidates == 1
    assert args.penalty_weights == 1.0
