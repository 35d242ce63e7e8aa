"""Chunked prefill (serving: bound the decode stall of long prefills).

Causal attention factorizes, so prefilling in C-token chunks that attend
[valid prefix | causal self] is numerically the one-shot prefill — the
chunked PrefillState must match prefill()'s, and a server that pumps
decode steps between chunks must emit exactly the same tokens for every
request (pumped steps only advance OTHER slots)."""
import numpy as np
import pytest

import jax.numpy as jnp

from dropoutdecoding_tpu.engine.generate import LlavaEngine
from dropoutdecoding_tpu.engine.serving import DecodeServer
from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def _engine(cfg, params, **kw):
    defaults = dict(
        cfg=cfg,
        params=params,
        gen=GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0),
        max_len=64,
        ensemble=True,
        ens=EnsembleConfig(mask_policy="epis"),
        seed=24,
    )
    defaults.update(kw)
    e = LlavaEngine(**defaults)
    e.param_dtype = jnp.float32
    return e


def test_chunked_prefill_state_matches_one_shot(tiny_llava, rng):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)

    ref = eng.prefill(input_ids, pixels)
    # merged length = 5 text + 16 visual - 1 = 20 -> 3 chunks of 8 with pad
    got = eng.prefill_chunked(input_ids, pixels, chunk=8)

    np.testing.assert_allclose(
        np.asarray(got.last_logits), np.asarray(ref.last_logits),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(got.first_token), np.asarray(ref.first_token)
    )
    np.testing.assert_allclose(
        np.asarray(got.epis), np.asarray(ref.epis), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.topk_ids), np.asarray(ref.topk_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(got.cur_len), np.asarray(ref.cur_len)
    )
    np.testing.assert_allclose(
        np.asarray(got.cache.k), np.asarray(ref.cache.k),
        rtol=1e-5, atol=1e-5,
    )
    # full generation from the chunked state == from the one-shot state
    ref_tok, _ = eng._decode(eng.params, ref)
    got_tok, _ = eng._decode(eng.params, got)
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(ref_tok))


def test_server_submit_chunked_matches_solo(tiny_llava, rng):
    """A request joining via submit_chunked while another stream decodes:
    both requests' tokens == their solo generations, and the pump really
    ran (the active stream advanced during the chunked prefill)."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)

    px2 = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    ids2 = np.array([[1, 5, 9, 32, 11, 13]])
    solo_a = eng.generate(input_ids, pixels).tokens[0]
    solo_b = eng.generate(ids2, px2).tokens[0]

    srv = DecodeServer(engine=eng, n_slots=2)
    srv.submit("a", input_ids, pixels)
    srv.step()  # stream a is mid-flight
    steps_before = int(np.asarray(srv._carry["steps"])[0])
    srv.submit_chunked("b", ids2, px2, chunk=8, pump_steps=1)
    steps_after = int(np.asarray(srv._carry["steps"])[0])
    assert steps_after > steps_before  # pump advanced the active stream

    results = {}
    for _ in range(10):
        srv.step()
        results.update(srv.harvest())
        if len(results) == 2:
            break
    np.testing.assert_array_equal(results["a"], solo_a)
    np.testing.assert_array_equal(results["b"], solo_b)


def test_chunked_prefill_rejects_batches(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    with pytest.raises(ValueError, match="B=1"):
        eng.prefill_chunked(
            np.repeat(input_ids, 2, 0), np.repeat(pixels, 2, 0), chunk=8
        )


def test_instructblip_chunked_rejected():
    from dropoutdecoding_tpu.engine.instructblip_engine import (
        InstructBlipEngine,
    )

    with pytest.raises(NotImplementedError, match="64 tokens"):
        InstructBlipEngine.prefill_chunked(None)


@pytest.fixture(scope="module")
def tiny_llava_next_shared():
    import torch
    from transformers import (
        CLIPVisionConfig as HFVCfg,
        LlavaNextConfig as HFCfg,
        LlavaNextForConditionalGeneration,
        MistralConfig as HFMCfg,
    )

    from dropoutdecoding_tpu.models import llavanext as next_mod
    from dropoutdecoding_tpu.utils.config import LlavaNextConfig

    pinpoints = [[28, 56], [56, 28], [56, 56]]
    torch.manual_seed(21)
    hf_cfg = HFCfg(
        vision_config=HFVCfg(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            image_size=28,
            patch_size=7,
        ).to_dict(),
        text_config=HFMCfg(
            vocab_size=64,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=256,
        ).to_dict(),
        image_token_index=32,
        image_grid_pinpoints=pinpoints,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        attn_implementation="eager",
    )
    from dropoutdecoding_tpu.utils.hf_io import state_dict_from_torch_module

    model = LlavaNextForConditionalGeneration(hf_cfg).eval().float()
    d = hf_cfg.to_dict()
    d["text_config"]["num_key_value_heads"] = 2
    cfg = LlavaNextConfig.from_hf_dict(d)
    params = next_mod.params_from_hf(
        cfg, state_dict_from_torch_module(model), jnp.float32
    )
    return cfg, params, pinpoints


def test_llavanext_chunked_prefill_matches_one_shot(tiny_llava_next_shared):
    """NeXT chunked prefill (the ~3k-token serving case, tiny shapes here)
    == one-shot: suffix-padded merged sequence + dynamic real_len through
    the same chunk program."""
    import numpy as np
    from PIL import Image

    from dropoutdecoding_tpu.engine.llavanext_engine import LlavaNextEngine
    from dropoutdecoding_tpu.models import llavanext as next_mod
    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    cfg, params, pinpoints = tiny_llava_next_shared
    rng = np.random.default_rng(3)
    prep = LlavaNextImagePreprocessor(pinpoints, tile_size=28)
    img = Image.fromarray(
        (rng.random((40, 50, 3)) * 255).astype(np.uint8), "RGB"
    )
    tiles, orig = prep(img)
    e = LlavaNextEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(mask_policy="epis", topk=10),
        gen=GenerationConfig(max_new_tokens=4, eos_token_id=63, pad_token_id=63),
        max_len=next_mod.max_image_tokens(cfg) + 32,
        ensemble=True,
        seed=506,
    )
    e.param_dtype = jnp.float32
    ids = np.array([[1, 5, 32, 11]])

    ref = e.prefill(ids, tiles, orig)
    got = e.prefill_chunked(ids, tiles, orig, chunk=8)
    np.testing.assert_allclose(
        np.asarray(got.last_logits), np.asarray(ref.last_logits),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(got.first_token), np.asarray(ref.first_token)
    )
    np.testing.assert_array_equal(
        np.asarray(got.cur_len), np.asarray(ref.cur_len)
    )
    # compare only VALID visual slots and cache rows < real_len: positions
    # past them hold junk in BOTH paths (the one-shot masks them in
    # attention, the chunked path never attends them) and every consumer
    # masks them (drops &= visual_mask; decode base_mask < cur_len)
    valid = np.asarray(got.visual_mask)[0]
    np.testing.assert_allclose(
        np.asarray(got.epis)[0][valid], np.asarray(ref.epis)[0][valid],
        rtol=1e-4, atol=1e-5,
    )
    n = int(np.asarray(ref.cur_len)[0])
    np.testing.assert_allclose(
        np.asarray(got.cache.k)[:, :, :n],
        np.asarray(ref.cache.k)[:, :, :n],
        rtol=1e-5, atol=1e-5,
    )
    ref_tok, _ = e._decode(e.params, ref)
    got_tok, _ = e._decode(e.params, got)
    np.testing.assert_array_equal(np.asarray(got_tok), np.asarray(ref_tok))


def test_llavanext_int8_prefix_cache_probe(tiny_llava_next_shared):
    """NeXT prefix cache under int8_kv: quantized handle, answers track
    the dense-prefix answers on decisive rows."""
    import numpy as np

    from dropoutdecoding_tpu.engine.llavanext_engine import LlavaNextEngine
    from dropoutdecoding_tpu.models import llavanext as next_mod
    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor
    from PIL import Image

    cfg, params, pinpoints = tiny_llava_next_shared
    rng = np.random.default_rng(9)
    prep = LlavaNextImagePreprocessor(pinpoints, tile_size=28)
    img = Image.fromarray(
        (rng.random((40, 50, 3)) * 255).astype(np.uint8), "RGB"
    )
    tiles, orig = prep(img)

    def eng(int8):
        e = LlavaNextEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(topk=10),
            gen=GenerationConfig(
                max_new_tokens=1, eos_token_id=63, pad_token_id=63
            ),
            max_len=next_mod.max_image_tokens(cfg) + 32,
            ensemble=True,
            int8_kv=int8,
            int8_prefix_cache=int8,
        )
        e.param_dtype = jnp.float32
        return e

    prefix_ids = np.array([[1, 5, 32, 11]])
    tails = np.asarray(rng.integers(3, 60, size=(2, 4)), np.int32)
    dense, quant = eng(False), eng(True)
    hd = dense.probe_prefix(prefix_ids, tiles, orig)
    hq = quant.probe_prefix(prefix_ids, tiles, orig)
    assert isinstance(hq[0].k, dict) and hq[0].k["q"].dtype == jnp.int8
    rd = dense.probe_extend(hd, tails)
    rq = quant.probe_extend(hq, tails)
    la, lb = np.asarray(rd.last_logits), np.asarray(rq.last_logits)
    scale = np.abs(la).max() + 1e-9
    noise = np.abs(la - lb).max() / scale
    assert noise < 0.05, noise
    top2 = np.sort(la, axis=-1)[:, -2:]
    decisive = (top2[:, 1] - top2[:, 0]) / scale > 2 * noise
    np.testing.assert_array_equal(
        np.asarray(rq.first_token)[decisive],
        np.asarray(rd.first_token)[decisive],
    )


def test_caption_service_llava_next_chunked(tiny_llava_next_shared):
    """The HTTP service layer serves LLaVA-NeXT with chunked prefill:
    captions match the engine's own generate."""
    import numpy as np
    from PIL import Image

    from dropoutdecoding_tpu.cli.serve import CaptionService
    from dropoutdecoding_tpu.engine.llavanext_engine import LlavaNextEngine
    from dropoutdecoding_tpu.models import llavanext as next_mod

    cfg, params, pinpoints = tiny_llava_next_shared

    class _Proc:
        def __call__(self, prompt, image=None):
            return {"input_ids": np.array([[1, 5, 32, 11]], np.int32)}

        def decode(self, token_ids, skip_special_tokens=True):
            return " ".join(f"t{int(t)}" for t in token_ids)

    eng = LlavaNextEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(topk=10),
        gen=GenerationConfig(max_new_tokens=4, eos_token_id=-1, pad_token_id=0),
        max_len=next_mod.max_image_tokens(cfg) + 32,
        ensemble=True,
        seed=506,
    )
    eng.param_dtype = jnp.float32
    # expected: engine generate on the same prepped image
    from dropoutdecoding_tpu.cli.chair_test import next_image_prep
    from dropoutdecoding_tpu.utils.processor import LlavaNextImagePreprocessor

    rng = np.random.default_rng(4)
    img = Image.fromarray(
        (rng.random((40, 50, 3)) * 255).astype(np.uint8), "RGB"
    )
    tiles, orig = next_image_prep(eng)(img)
    expected = " ".join(
        f"t{int(t)}" for t in eng.generate(
            np.array([[1, 5, 32, 11]]), tiles, orig
        ).tokens[0]
    )

    svc = CaptionService(eng, _Proc(), "llava-next", n_slots=2,
                         chunked_prefill=8)
    got = svc.caption(img, "Describe.", timeout=300)
    assert got == expected
