"""Blank-image LM-distribution producer (evalsuite/consistency_producer):
structure, word alignment, and end-to-end scoring through
evalsuite.consistency.lm_consistency — the analysis the reference ships
only a dormant consumer for."""
import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


class _StubTokenizer:
    """Word-level tokenizer: every whitespace word is ONE token (id =
    stable hash), so word->token alignment is exact."""

    eos_token_id = 2

    def __init__(self, vocab=64):
        self.vocab = vocab

    def _wid(self, w):
        return 4 + (sum(map(ord, w)) % (self.vocab - 4))

    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": [self._wid(w) for w in text.split()]}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{int(t)}" for t in ids)


class _StubProcessor:
    def __init__(self, cfg):
        self.cfg = cfg
        self.tokenizer = _StubTokenizer(cfg.text.vocab_size)

    def __call__(self, prompt, image=None):
        return {
            "input_ids": np.array(
                [[1, 5, self.cfg.image_token_index, 9]], np.int32
            )
        }


@pytest.fixture
def llava_engine(tiny_llava):
    _, cfg, params, _, _, _ = tiny_llava
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import GenerationConfig

    eng = LlavaEngine(
        cfg=cfg,
        params=params,
        gen=GenerationConfig(max_new_tokens=4, eos_token_id=-1,
                             pad_token_id=0),
        max_len=48,
        ensemble=False,
    )
    eng.param_dtype = jnp.float32
    return eng, _StubProcessor(cfg)


def test_distributions_structure(llava_engine):
    from dropoutdecoding_tpu.evalsuite.consistency_producer import (
        blank_image_distributions,
    )

    eng, proc = llava_engine
    caption = "a dog near chair"
    dists = blank_image_distributions(eng, proc, "prompt", caption, topk=8)
    assert set(dists) == {0, 1, 2, 3}  # one entry per caption word
    for d in dists.values():
        assert d  # non-empty
        assert all(0.0 <= p <= 1.0 for p in d.values())
        # words are decoded token strings
        assert all(isinstance(w, str) and w for w in d)


def test_lm_consistency_end_to_end(llava_engine):
    """Producer output feeds the consumer: a hallucinated word at a known
    position gets a finite rank."""
    from dropoutdecoding_tpu.evalsuite.consistency import lm_consistency
    from dropoutdecoding_tpu.evalsuite.consistency_producer import (
        blank_image_distributions,
    )

    eng, proc = llava_engine
    caption = "a dog near chair"
    dists = blank_image_distributions(eng, proc, "prompt", caption, topk=64)
    # pick the top word of position-2's distribution as the "hallucinated"
    # word so the rank is deterministically 1
    top_word = max(dists[2].items(), key=lambda kv: kv[1])[0]
    cap_dict = {
        "sentences": [
            {
                "image_id": 7,
                "mscoco_hallucinated_words": [(top_word, "node")],
                "hallucination_idxs": [2],
            }
        ]
    }
    res = lm_consistency(cap_dict, {7: dists})
    assert res["mean_rank"] == 1
    assert res["per_image"] == {7: 1.0}


def test_word_starts_alignment():
    from dropoutdecoding_tpu.evalsuite.consistency_producer import (
        caption_word_starts,
    )

    tok = _StubTokenizer()
    starts, ids = caption_word_starts(tok, "a dog near chair")
    assert [s[0] for s in starts] == ["a", "dog", "near", "chair"]
    assert [s[1] for s in starts] == [0, 1, 2, 3]
    assert len(ids) == 4
