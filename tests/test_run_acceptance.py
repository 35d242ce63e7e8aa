"""Acceptance rig (cli/run_acceptance.py): stage orchestration, report
schema, band checks — driven with the tiny fake engine (real weights and
COCO are absent in CI; the rig's job here is proving the one-command path
works end to end so a weights-holder only supplies paths)."""
import json
import os
from argparse import Namespace

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


@pytest.fixture
def synthetic_coco(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    ann = tmp_path / "coco" / "annotations"
    val = tmp_path / "coco" / "val2014"
    ann.mkdir(parents=True)
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
            {"id": 10 * i + j, "image_id": i,
             "caption": f"a dog and a chair {j}"}
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
    return tmp_path / "coco"


class _TinyProcessor:
    def __init__(self, cfg):
        self.cfg = cfg

        class _Tok:
            eos_token_id = 2

        self.tokenizer = _Tok()

    def __call__(self, prompt, image=None):
        ids = np.array(
            [[1, 5, 9, self.cfg.image_token_index, 11, 13]], np.int32
        )
        out = {"input_ids": ids}
        if image is not None:
            arr = np.asarray(image.resize((28, 28)), np.float32) / 255.0
            out["pixel_values"] = arr.transpose(2, 0, 1)[None]
        return out

    def decode(self, token_ids, skip_special_tokens=True):
        return "a dog next to a chair" + "".join(
            f" t{int(t)}" for t in token_ids
        )


def test_acceptance_rig_end_to_end(synthetic_coco, tmp_path, monkeypatch,
                                   tiny_llava):
    from dropoutdecoding_tpu.cli import chair_test as chair_cli
    from dropoutdecoding_tpu.cli import run_acceptance as rig
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import (
        EnsembleConfig,
        GenerationConfig,
    )

    _, cfg, params, _, _, _ = tiny_llava

    def fake_engine(args):
        eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(use_random=bool(getattr(args, "use_random",
                                                       False))),
            gen=GenerationConfig(
                max_new_tokens=4, eos_token_id=2, pad_token_id=2
            ),
            max_len=48,
            ensemble=not bool(getattr(args, "original", False)),
        )
        eng.param_dtype = jnp.float32
        return eng, _TinyProcessor(cfg)

    monkeypatch.setattr(chair_cli, "make_engine", fake_engine)
    work = tmp_path / "acc"
    args = rig.build_parser().parse_args(
        [
            "--model-path", "/unused",
            "--coco-data-dir", str(synthetic_coco),
            "--work-dir", str(work),
            "--images", "4",
            "--stages", "smoke,greedy,k3_vote,random",
            "--no-assert",
        ]
    )
    report = rig.main(args)

    # report landed on disk, signed, with every requested stage
    on_disk = json.loads((work / "acceptance_report.json").read_text())
    assert on_disk["signature_sha256"] == report["signature_sha256"]
    for stage in ("smoke", "greedy", "k3_vote", "random"):
        s = on_disk["stages"][stage]
        assert s["captions_file"] and os.path.exists(s["captions_file"])
        assert s["captions_sha256"]
        assert s["metrics"] is not None
        assert 0.0 <= s["metrics"]["CHAIRs"] <= 100.0
    # tiny random model can't hit the 7B bands: checks exist and name them
    names = {c["check"] for c in on_disk["checks"]}
    assert {"greedy.CHAIRs", "greedy.CHAIRi", "k3_vote.CHAIRs",
            "k3_vote.CHAIRi", "ordering.random_gt_k3"} <= names
    assert on_disk["verdict"] in ("pass", "FAIL")


def test_acceptance_band_checks_pass_and_fail():
    from dropoutdecoding_tpu.cli.run_acceptance import _check_bands

    report = {
        "stages": {
            "greedy": {"metrics": {"CHAIRs": 27.8, "CHAIRi": 7.2}},
            "k3_vote": {"metrics": {"CHAIRs": 25.8, "CHAIRi": 6.6}},
            "random": {"metrics": {"CHAIRs": 32.0, "CHAIRi": 7.6}},
        }
    }
    assert _check_bands(report, slack=0.0)  # BASELINE.md reference values

    bad = {
        "stages": {
            "greedy": {"metrics": {"CHAIRs": 40.0, "CHAIRi": 7.2}},
            "k3_vote": {"metrics": {"CHAIRs": 25.8, "CHAIRi": 6.6}},
            "random": {"metrics": {"CHAIRs": 20.0, "CHAIRi": 6.0}},
        }
    }
    assert not _check_bands(bad, slack=0.0)
    failing = {c["check"] for c in bad["checks"] if c["status"] == "FAIL"}
    assert "greedy.CHAIRs" in failing
    assert "ordering.random_gt_k3" in failing
