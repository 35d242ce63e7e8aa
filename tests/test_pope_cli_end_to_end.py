"""Whole-harness POPE integration: cli.pope_test.main() with a tiny engine
over synthetic COCO — question generation, single-token probing, answer
archive, confusion-matrix scoring (reference pope_test.py flow)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


@pytest.fixture
def synthetic_coco(tmp_path):
    rng = np.random.default_rng(1)
    ann = tmp_path / "annotations"
    val = tmp_path / "val2014"
    ann.mkdir()
    val.mkdir()
    images = []
    for i in range(1, 7):
        name = f"COCO_val2014_{i:012d}.jpg"
        Image.fromarray(
            (rng.random((36, 44, 3)) * 255).astype(np.uint8), "RGB"
        ).save(val / name, "JPEG")
        images.append({"id": i, "file_name": name})
    instances = {
        "categories": [
            {"id": k, "name": n}
            for k, n in enumerate(
                ["dog", "chair", "cat", "car", "person", "bench"], start=1
            )
        ],
        "images": images,
        "annotations": [
            {"id": 900 + i * 10 + j, "image_id": i, "category_id": 1 + (i + j) % 6}
            for i in range(1, 7)
            for j in range(3)
        ],
    }
    (ann / "instances_val2014.json").write_text(json.dumps(instances))
    (ann / "captions_val2014.json").write_text(
        json.dumps({"images": images, "annotations": []})
    )
    return tmp_path


class _TinyProcessor:
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
        return "Yes" if (sum(int(t) for t in token_ids) % 2 == 0) else "No"


def test_pope_cli_main_end_to_end(synthetic_coco, tmp_path, monkeypatch, tiny_llava):
    from dropoutdecoding_tpu.cli import chair_test as chair_cli
    from dropoutdecoding_tpu.cli import pope_test as cli
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
            ensemble=True,
        )
        eng.param_dtype = jnp.float32
        return eng, _TinyProcessor(cfg)

    # pope_test imports make_engine from chair_test inside main()
    monkeypatch.setattr(chair_cli, "make_engine", fake_make_engine)

    pope_dir = str(tmp_path / "pope_out")
    args = cli.build_parser().parse_args(
        [
            "--model", "llava",
            "--model-path", "/unused",
            "--coco-data-dir", str(synthetic_coco),
            "--pope-dir", pope_dir,
            "--refresh-data", "True",
            "--number", "6",
            "--seed", "0",
        ]
    )
    cli.main(args)

    # question files for all three strategies
    qdir = os.path.join(pope_dir, "output", "coco")
    for strategy in ("random", "popular", "adversarial"):
        qs = [
            json.loads(l)
            for l in open(os.path.join(qdir, f"coco_pope_{strategy}.json"))
        ]
        assert qs and {q["label"] for q in qs} == {"yes", "no"}
    # timestamped answer archives (one per strategy) + snapshot sidecars
    listing = os.listdir(os.path.join(pope_dir, "answer"))
    ans = [a for a in listing if a.endswith("_ans.json")]
    metas = [a for a in listing if a.endswith("_ans.meta.json")]
    assert len(ans) == 3 and len(metas) == 3
    with open(os.path.join(pope_dir, "answer", ans[0])) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 6
    assert set(rows[0]) == {"question", "answer"}
    # the run's question snapshot exists and holds the three files used
    with open(os.path.join(pope_dir, "answer", metas[0])) as f:
        meta = json.load(f)
    snap = meta["question_snapshot"]
    assert os.path.isdir(snap), snap
    snap_files = sorted(os.listdir(snap))
    assert snap_files == [
        "coco_pope_adversarial.json",
        "coco_pope_popular.json",
        "coco_pope_random.json",
    ]
    # snapshot content == the live question files at run time
    for fn in snap_files:
        with open(os.path.join(snap, fn)) as a, open(
            os.path.join(qdir, fn)
        ) as b:
            assert a.read() == b.read()


def test_pope_cli_batched_matches_per_question(
    synthetic_coco, tmp_path, monkeypatch, tiny_llava
):
    """--batch-size N (right-padded variable-length batched prefill)
    produces answer archives identical to the per-question path on the
    same question files."""
    import time as _time

    from dropoutdecoding_tpu.cli import chair_test as chair_cli
    from dropoutdecoding_tpu.cli import pope_test as cli
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

    _, cfg, params, _, _, _ = tiny_llava

    class _VarProcessor(_TinyProcessor):
        """Question-length-dependent token count — exercises text_lens."""

        def __call__(self, prompt, image=None):
            extra = len(prompt) % 3
            ids = np.array(
                [[1, 5, 9, self.cfg.image_token_index, 11, 13] + [7] * extra],
                np.int32,
            )
            out = {"input_ids": ids}
            if image is not None:
                arr = np.asarray(image.resize((28, 28)), np.float32) / 255.0
                out["pixel_values"] = arr.transpose(2, 0, 1)[None]
            return out

    def fake_make_engine(args):
        eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=2),
            max_len=48,
            ensemble=True,
        )
        eng.param_dtype = jnp.float32
        return eng, _VarProcessor(cfg)

    monkeypatch.setattr(chair_cli, "make_engine", fake_make_engine)

    def run(pope_dir, batch):
        args = cli.build_parser().parse_args(
            [
                "--model", "llava",
                "--model-path", "/unused",
                "--coco-data-dir", str(synthetic_coco),
                "--pope-dir", pope_dir,
                "--refresh-data", "True",
                "--number", "5",  # not a batch multiple: tail-group path
                "--seed", "0",
                "--batch-size", str(batch),
            ]
        )
        cli.main(args)
        out = {}
        ans_dir = os.path.join(pope_dir, "answer")
        for f in os.listdir(ans_dir):
            for strategy in ("random", "popular", "adversarial"):
                if f.endswith(f"_{strategy}_ans.json"):
                    with open(os.path.join(ans_dir, f)) as fh:
                        out[strategy] = [json.loads(l) for l in fh]
        return out

    seq = run(str(tmp_path / "pope_seq"), 1)
    _time.sleep(1.1)  # answer archives are second-stamped
    bat = run(str(tmp_path / "pope_bat"), 3)
    assert set(seq) == {"random", "popular", "adversarial"}
    for strategy in seq:
        assert seq[strategy] == bat[strategy], strategy


def test_pope_cli_vendored_questions_no_coco_annotations(
    tmp_path, monkeypatch, tiny_llava
):
    """Without --refresh-data the CLI seeds its question dir from the
    VENDORED canonical sets — no instances_val2014.json anywhere (round-2
    verdict missing item 4).  Only val2014 images for the probed questions
    need to exist."""
    import json as _json

    from dropoutdecoding_tpu.cli import chair_test as chair_cli
    from dropoutdecoding_tpu.cli import pope_test as cli
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.evalsuite.pope import vendored_question_dir
    from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

    _, cfg, params, _, _, _ = tiny_llava

    def fake_make_engine(args):
        eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=2),
            max_len=48,
            ensemble=True,
        )
        eng.param_dtype = jnp.float32
        return eng, _TinyProcessor(cfg)

    monkeypatch.setattr(chair_cli, "make_engine", fake_make_engine)

    # coco dir with ONLY images (no annotations/), named for the first two
    # questions of each canonical strategy file
    coco_dir = tmp_path / "coco"
    (coco_dir / "val2014").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for strategy in ("random", "popular", "adversarial"):
        with open(
            os.path.join(vendored_question_dir(), f"coco_pope_{strategy}.json")
        ) as f:
            qs = [_json.loads(l) for l in f if l.strip()][:2]
        for q in qs:
            p = coco_dir / "val2014" / q["image"]
            if not p.exists():
                Image.fromarray(
                    (rng.random((40, 52, 3)) * 255).astype(np.uint8), "RGB"
                ).save(p, "JPEG")

    pope_dir = str(tmp_path / "pope_out")
    args = cli.build_parser().parse_args(
        [
            "--model", "llava",
            "--model-path", "/unused",
            "--coco-data-dir", str(coco_dir),
            "--pope-dir", pope_dir,
            "--number", "2",
            "--seed", "0",
        ]
    )
    cli.main(args)

    # questions seeded byte-exact from package data
    qdir = os.path.join(pope_dir, "output", "coco")
    for strategy in ("random", "popular", "adversarial"):
        with open(os.path.join(qdir, f"coco_pope_{strategy}.json"), "rb") as f_a:
            got = f_a.read()
        with open(
            os.path.join(vendored_question_dir(), f"coco_pope_{strategy}.json"),
            "rb",
        ) as f_b:
            assert got == f_b.read()
    # answers produced for all three strategies
    ans = [
        f
        for f in os.listdir(os.path.join(pope_dir, "answer"))
        if f.endswith("_ans.json")
    ]
    assert len(ans) == 3


def test_pope_cli_prefix_cache_matches_per_question(
    synthetic_coco, tmp_path, monkeypatch, tiny_llava
):
    """--prefix-cache True (shared-prefix KV + per-question extend)
    produces answer archives identical to the per-question path."""
    import time as _time

    from dropoutdecoding_tpu.cli import chair_test as chair_cli
    from dropoutdecoding_tpu.cli import pope_test as cli
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

    _, cfg, params, _, _, _ = tiny_llava

    class _VarProcessor(_TinyProcessor):
        def __call__(self, prompt, image=None):
            extra = len(prompt) % 3
            ids = np.array(
                [[1, 5, 9, self.cfg.image_token_index, 11, 13] + [7] * extra],
                np.int32,
            )
            out = {"input_ids": ids}
            if image is not None:
                arr = np.asarray(image.resize((28, 28)), np.float32) / 255.0
                out["pixel_values"] = arr.transpose(2, 0, 1)[None]
            return out

    def fake_make_engine(args):
        eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=2),
            max_len=48,
            ensemble=True,
        )
        eng.param_dtype = jnp.float32
        return eng, _VarProcessor(cfg)

    monkeypatch.setattr(chair_cli, "make_engine", fake_make_engine)

    def run(pope_dir, extra_flags):
        args = cli.build_parser().parse_args(
            [
                "--model", "llava",
                "--model-path", "/unused",
                "--coco-data-dir", str(synthetic_coco),
                "--pope-dir", pope_dir,
                "--refresh-data", "True",
                "--number", "5",
                "--seed", "0",
            ]
            + extra_flags
        )
        cli.main(args)
        out = {}
        ans_dir = os.path.join(pope_dir, "answer")
        for f in os.listdir(ans_dir):
            for strategy in ("random", "popular", "adversarial"):
                if f.endswith(f"_{strategy}_ans.json"):
                    with open(os.path.join(ans_dir, f)) as fh:
                        out[strategy] = [json.loads(l) for l in fh]
        return out

    seq = run(str(tmp_path / "pope_seq"), [])
    _time.sleep(1.1)
    pc = run(str(tmp_path / "pope_pc"), ["--prefix-cache", "True"])
    assert set(seq) == {"random", "popular", "adversarial"}
    for strategy in seq:
        assert seq[strategy] == pc[strategy], strategy


def test_pope_cli_prefix_cache_llava_next(
    synthetic_coco, tmp_path, monkeypatch
):
    """--prefix-cache for --model llava-next: the anyres-tile prefix KV +
    per-question extends produce the same answer archives as the
    per-question path."""
    import time as _time

    import jax

    from dropoutdecoding_tpu.cli import chair_test as chair_cli
    from dropoutdecoding_tpu.cli import pope_test as cli
    from dropoutdecoding_tpu.engine.llavanext_engine import LlavaNextEngine
    from dropoutdecoding_tpu.models import llavanext as next_mod
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlamaConfig,
        LlavaNextConfig,
    )

    cfg = LlavaNextConfig(
        text=LlamaConfig(
            vocab_size=64, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=12,
        ),
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=7,
        ),
        image_grid_pinpoints=((28, 56), (56, 28), (56, 56)),
        image_token_index=32,
    )
    params = next_mod.init_params(cfg, jax.random.key(0), jnp.float32)

    class _NextProcessor(_TinyProcessor):
        def __call__(self, prompt, image=None):
            extra = len(prompt) % 3
            ids = np.array(
                [[1, 5, self.cfg.image_token_index, 11, 13] + [7] * extra],
                np.int32,
            )
            # pixel handling goes through next_image_prep, not here
            return {"input_ids": ids}

    def fake_make_engine(args):
        eng = LlavaNextEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=4, eos_token_id=2, pad_token_id=2),
            max_len=128,
            ensemble=True,
        )
        eng.param_dtype = jnp.float32
        return eng, _NextProcessor(cfg)

    monkeypatch.setattr(chair_cli, "make_engine", fake_make_engine)

    def run(pope_dir, extra_flags):
        args = cli.build_parser().parse_args(
            [
                "--model", "llava-next",
                "--model-path", "/unused",
                "--coco-data-dir", str(synthetic_coco),
                "--pope-dir", pope_dir,
                "--refresh-data", "True",
                "--number", "5",
                "--seed", "0",
            ]
            + extra_flags
        )
        cli.main(args)
        out = {}
        ans_dir = os.path.join(pope_dir, "answer")
        for f in os.listdir(ans_dir):
            for strategy in ("random", "popular", "adversarial"):
                if f.endswith(f"_{strategy}_ans.json"):
                    with open(os.path.join(ans_dir, f)) as fh:
                        out[strategy] = [json.loads(l) for l in fh]
        return out

    seq = run(str(tmp_path / "pope_seq"), [])
    _time.sleep(1.1)
    pc = run(str(tmp_path / "pope_pc"), ["--prefix-cache", "True"])
    assert set(seq) == {"random", "popular", "adversarial"}
    for strategy in seq:
        assert seq[strategy] == pc[strategy], strategy


def test_pope_cli_prefix_cache_rejects_instructblip(synthetic_coco, tmp_path):
    from dropoutdecoding_tpu.cli import pope_test as cli

    args = cli.build_parser().parse_args(
        [
            "--model", "instructblip",
            "--model-path", "/unused",
            "--coco-data-dir", str(synthetic_coco),
            "--pope-dir", str(tmp_path / "pope"),
            "--prefix-cache", "True",
        ]
    )
    with pytest.raises(SystemExit, match="Q-Former"):
        cli.main(args)
