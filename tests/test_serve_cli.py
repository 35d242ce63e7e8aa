"""CaptionService end-to-end with a tiny engine (threaded worker +
DecodeServer), without HTTP."""
import pytest

import numpy as np
from PIL import Image

import jax.numpy as jnp

from dropoutdecoding_tpu.cli.serve import CaptionService
from dropoutdecoding_tpu.engine.generate import LlavaEngine
from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


class _TinyProcessor:
    def __init__(self, cfg):
        self.cfg = cfg

    def __call__(self, prompt, image=None):
        ids = np.array([[1, 5, 9, self.cfg.image_token_index, 11, 13]], np.int32)
        out = {"input_ids": ids}
        if image is not None:
            arr = np.asarray(image.resize((28, 28)), np.float32) / 255.0
            out["pixel_values"] = arr.transpose(2, 0, 1)[None]
        return out

    def decode(self, token_ids, skip_special_tokens=True):
        return " ".join(f"t{int(t)}" for t in token_ids)


def test_caption_service_concurrent(tiny_llava, rng):
    _, cfg, params, _, _, _ = tiny_llava
    eng = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(mask_policy="epis"),
        gen=GenerationConfig(max_new_tokens=5, eos_token_id=-1, pad_token_id=0),
        max_len=48,
        ensemble=True,
    )
    eng.param_dtype = jnp.float32
    service = CaptionService(eng, _TinyProcessor(cfg), "llava-1.5", n_slots=2)

    import concurrent.futures as cf

    def _img(i):
        return Image.fromarray(
            (np.random.default_rng(i).random((30, 30, 3)) * 255).astype(np.uint8),
            "RGB",
        )

    def one(i):
        return service.caption(_img(i), "Describe the image.", timeout=300)

    with cf.ThreadPoolExecutor(max_workers=3) as ex:
        captions = list(ex.map(one, range(3)))
    assert len(captions) == 3
    for c in captions:
        assert c.startswith("t") and len(c.split()) == 5

    # --batched-submit (opt-in: serving.submit_many groups plain
    # same-budget requests into one prefill dispatch) produces the same
    # captions — token identity of the route itself is pinned at the
    # engine level in tests/test_serving.py
    batched = CaptionService(eng, _TinyProcessor(cfg), "llava-1.5",
                             n_slots=2, batched_submit=True)
    with cf.ThreadPoolExecutor(max_workers=3) as ex:
        captions_b = list(ex.map(
            lambda i: batched.caption(_img(i), "Describe the image.",
                                      timeout=300),
            range(3),
        ))
    assert captions_b == captions


def test_caption_service_stream_stats_budget_chunked(tiny_llava, rng):
    """Round-3 serving surface: streaming deltas reassemble to the full
    caption, /stats counters advance, per-request max_new_tokens
    truncates, and chunked-prefill submission produces the same caption."""
    _, cfg, params, _, _, _ = tiny_llava

    def mk(chunked):
        eng = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(mask_policy="epis"),
            gen=GenerationConfig(max_new_tokens=5, eos_token_id=-1,
                                 pad_token_id=0),
            max_len=48,
            ensemble=True,
        )
        eng.param_dtype = jnp.float32
        return CaptionService(
            eng, _TinyProcessor(cfg), "llava-1.5", n_slots=2,
            chunked_prefill=chunked,
        )

    img = Image.fromarray(
        (np.random.default_rng(0).random((30, 30, 3)) * 255).astype(np.uint8),
        "RGB",
    )
    svc = mk(None)
    full = svc.caption(img, "Describe the image.", timeout=300)
    assert len(full.split()) == 5

    # streaming: concatenated deltas == the full caption's tokens
    deltas = list(svc.caption_stream(img, "Describe the image.", timeout=300))
    assert deltas and " ".join(" ".join(deltas).split()) == full

    # per-request budget truncates
    short = svc.caption(img, "Describe the image.", timeout=300,
                        max_new_tokens=2)
    assert short == " ".join(full.split()[:2])

    st = svc.stats()
    assert st["requests_done"] == 3 and st["tokens_generated"] == 12

    # chunked-prefill service path: same caption
    svc2 = mk(8)
    assert svc2.caption(img, "Describe the image.", timeout=300) == full
