"""im-consistency producers (evalsuite/im_classifier): COCO class table,
the engine-native projection classifier, the CLIP zero-shot head on tiny
random towers, and the chair CLI --consistency-im arm end-to-end — the
analysis the reference ships only a dormant consumer for
(im_consistency.py:24-44, missing .npy inputs)."""
import json
import os
from argparse import Namespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast core gate


class _StubTokenizer:
    eos_token_id = 2

    def __init__(self, vocab=64):
        self.vocab = vocab

    def _wid(self, w):
        return 4 + (sum(map(ord, w)) % (self.vocab - 4))

    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [self._wid(w) for w in text.split()]}


def test_coco_class_words_is_the_80_class_table():
    from dropoutdecoding_tpu.evalsuite.im_classifier import coco_class_words

    cw = coco_class_words()
    assert len(cw) == 80
    assert "dining table" in cw
    # synonym surfaces roll up to their node
    assert "puppy" in cw["dog"]
    assert all(ws for ws in cw.values())


def test_class_token_table_and_projection_labels():
    from dropoutdecoding_tpu.evalsuite.im_classifier import (
        class_token_table,
        projection_labels,
    )

    tok = _StubTokenizer()
    table = class_token_table(tok, {"dog": ["dog", "puppy"],
                                    "chair": ["chair"]})
    dog_id = tok._wid("dog")
    # a projection table containing the 'dog' token fires dog only
    topk = np.full((6, 5), 3, np.int32)
    topk[2, 1] = dog_id
    labels = projection_labels(topk, table)
    assert "dog" in labels
    chair_id = tok._wid("chair")
    if chair_id != dog_id:  # stub hash collisions aside
        assert "chair" not in labels
    # empty table fires nothing
    assert projection_labels(np.full((6, 5), 3, np.int32) * 0 + 3,
                             {"dog": {dog_id}}) in (set(),)


def test_clip_zero_shot_on_tiny_towers():
    from dropoutdecoding_tpu.evalsuite.im_classifier import ClipZeroShot
    from dropoutdecoding_tpu.models import clip_text, clip_vit
    from dropoutdecoding_tpu.utils.config import (
        ClipTextConfig,
        ClipVisionConfig,
    )

    vcfg = ClipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=7,
        projection_dim=16,
    )
    tcfg = ClipTextConfig(
        vocab_size=64, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, projection_dim=16,
    )
    vparams = clip_vit.init_params(vcfg, jax.random.key(0), jnp.float32)
    tparams = clip_text.init_params(tcfg, jax.random.key(1), jnp.float32)
    post_ln = (np.ones((32,), np.float32), np.zeros((32,), np.float32))
    vproj = np.random.default_rng(2).normal(size=(32, 16)).astype(np.float32)

    zs = ClipZeroShot(
        vcfg, vparams, post_ln, vproj, tcfg, tparams,
        _StubTokenizer(), ["dog", "chair", "cat", "car", "person"],
    )
    px = np.random.default_rng(3).normal(size=(1, 3, 28, 28)).astype(
        np.float32
    )
    labels = zs.labels(px, top_n=2)
    assert len(labels) == 2
    assert labels <= {"dog", "chair", "cat", "car", "person"}
    # deterministic
    assert zs.labels(px, top_n=2) == labels


def test_clip_text_hf_weight_mapping_roundtrip():
    """params_from_hf consumes HF CLIPModel naming and produces the same
    apply() output as init-shaped params built from those tensors."""
    from dropoutdecoding_tpu.models import clip_text
    from dropoutdecoding_tpu.utils.config import ClipTextConfig

    tcfg = ClipTextConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=8, projection_dim=8,
    )
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.05

    sd = {
        "text_model.embeddings.token_embedding.weight": t(32, 16),
        "text_model.embeddings.position_embedding.weight": t(8, 16),
        "text_model.final_layer_norm.weight": np.ones(16, np.float32),
        "text_model.final_layer_norm.bias": np.zeros(16, np.float32),
        "text_projection.weight": t(8, 16),  # HF [out, in]
    }
    for i in range(2):
        p = f"text_model.encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            sd[p + ln + ".weight"] = np.ones(16, np.float32)
            sd[p + ln + ".bias"] = np.zeros(16, np.float32)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"self_attn.{proj}.weight"] = t(16, 16)
            sd[p + f"self_attn.{proj}.bias"] = np.zeros(16, np.float32)
        sd[p + "mlp.fc1.weight"] = t(32, 16)
        sd[p + "mlp.fc1.bias"] = np.zeros(32, np.float32)
        sd[p + "mlp.fc2.weight"] = t(16, 32)
        sd[p + "mlp.fc2.bias"] = np.zeros(16, np.float32)

    params = clip_text.params_from_hf(tcfg, sd, jnp.float32)
    ids = jnp.asarray([[1, 5, 9, 2, 0, 0]], jnp.int32)
    out = clip_text.apply(tcfg, params, ids, jnp.asarray([3]))
    assert out.shape == (1, 8)
    assert np.isfinite(np.asarray(out)).all()
    # the projection is transposed from HF [out, in] to [in, out]
    assert params["text_projection"].shape == (16, 8)


def test_chair_cli_consistency_im_projection(tmp_path, monkeypatch,
                                             tiny_llava):
    """--consistency-im projection end to end on the tiny engine: the
    CLI produces the im-consistency table (round-5 verdict item 7)."""
    from PIL import Image

    from dropoutdecoding_tpu.cli import chair_test as cli
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import (
        EnsembleConfig,
        GenerationConfig,
    )

    _, cfg, params, _, _, _ = tiny_llava

    rng = np.random.default_rng(0)
    ann = tmp_path / "annotations"
    val = tmp_path / "val2014"
    ann.mkdir()
    val.mkdir()
    images = []
    for i in range(1, 4):
        name = f"COCO_val2014_{i:012d}.jpg"
        Image.fromarray(
            (rng.random((40, 52, 3)) * 255).astype(np.uint8), "RGB"
        ).save(val / name, "JPEG")
        images.append({"id": i, "file_name": name})
    (ann / "captions_val2014.json").write_text(json.dumps({
        "images": images,
        "annotations": [
            {"id": 10 * i + j, "image_id": i,
             "caption": f"a dog and a chair {j}"}
            for i in range(1, 4) for j in range(2)
        ],
    }))
    (ann / "instances_val2014.json").write_text(json.dumps({
        "categories": [{"id": 1, "name": "dog"},
                       {"id": 2, "name": "chair"}],
        "images": images,
        "annotations": [
            {"id": 900 + i, "image_id": i, "category_id": 1 + i % 2}
            for i in range(1, 4)
        ],
    }))

    class _Proc:
        def __init__(self, cfg):
            self.cfg = cfg
            self.tokenizer = _StubTokenizer(cfg.text.vocab_size)

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
            return "a dog next to a chair"

    def fake_make_engine(args):
        eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=4, eos_token_id=2,
                                 pad_token_id=2),
            max_len=48,
            ensemble=True,
        )
        eng.param_dtype = jnp.float32
        return eng, _Proc(cfg)

    monkeypatch.setattr(cli, "make_engine", fake_make_engine)
    monkeypatch.chdir(tmp_path)

    args = cli.build_parser().parse_args([
        "--method", "imtest",
        "--coco-data-dir", str(tmp_path),
        "--model-path", "/unused",
        "--image-numbers", "3",
        "--seed", "0",
        "--output-dir", str(tmp_path / "outputs"),
        "--sample-save-name", str(tmp_path / "sample.log"),
        "--consistency-im", "projection",
    ])
    cli.main(args)

    out = json.load(
        open(tmp_path / "outputs" / "imtest_im_consistency.json")
    )
    assert out["mode"] == "projection"
    assert 0.0 <= out["consistency"] <= 1.0
    assert len(out["labels"]) == 3
    for v in out["labels"].values():
        assert isinstance(v, list)
