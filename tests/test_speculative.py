"""Greedy speculative decoding: EXACT target-greedy output regardless of
draft quality (the greedy-acceptance guarantee), and full acceptance when
the draft IS the target."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dropoutdecoding_tpu.engine.generate import LlavaEngine
from dropoutdecoding_tpu.engine.speculative import SpeculativeGreedy
from dropoutdecoding_tpu.models import llama
from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def _engine(cfg, params, T=10, **kw):
    defaults = dict(
        cfg=cfg,
        params=params,
        gen=GenerationConfig(max_new_tokens=T, eos_token_id=-1, pad_token_id=0),
        max_len=64,
        ensemble=False,
    )
    defaults.update(kw)
    e = LlavaEngine(**defaults)
    e.param_dtype = jnp.float32
    return e


def test_spec_matches_greedy_with_arbitrary_draft(tiny_llava, rng):
    """A draft with DIFFERENT random weights still yields token-identical
    greedy output — the draft controls speed, never content."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    ref = eng.generate(input_ids, pixels).tokens[0]

    bad_draft = llama.init_params(cfg.text, jax.random.key(99), jnp.float32)
    spec = SpeculativeGreedy(engine=eng, draft_lm=bad_draft, gamma=3)
    tokens, cycles, accepted = spec.generate(input_ids, pixels)
    np.testing.assert_array_equal(tokens, ref)
    assert cycles >= 1


def test_spec_full_acceptance_with_target_draft(tiny_llava, rng):
    """draft == target weights -> every drafted token accepted: gamma+1
    tokens per cycle, and still exactly the greedy sequence."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    T = 9
    eng = _engine(cfg, params, T=T)
    ref = eng.generate(input_ids, pixels).tokens[0]

    spec = SpeculativeGreedy(engine=eng, draft_lm=params.lm, gamma=3)
    tokens, cycles, accepted = spec.generate(input_ids, pixels)
    np.testing.assert_array_equal(tokens, ref)
    # T=9: first token from prefill + 2 cycles x (3 accepted + 1)
    assert cycles == 2
    assert accepted == 2 * 3


def test_spec_rejects_ensemble(tiny_llava):
    _, cfg, params, _, _, _ = tiny_llava
    with pytest.raises(ValueError, match="GREEDY"):
        e = _engine(cfg, params, ensemble=True, ens=EnsembleConfig())
        SpeculativeGreedy(engine=e, draft_lm=params.lm)


def test_spec_int8_kv_matches_int8_greedy(tiny_llava):
    """The DEPLOYMENT config speculates: int8 KV target cache — the
    verify extend reads the quantized prefix (extend_attention_int8prefix)
    and the block append quantizes per row, so spec output == the int8-KV
    engine's own greedy tokens exactly (fp32 compute)."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    e = _engine(cfg, params)
    e.int8_kv = True
    e.__post_init__()
    ref = e.generate(input_ids, pixels).tokens[0]

    spec = SpeculativeGreedy(engine=e, draft_lm=params.lm, gamma=3)
    tokens, cycles, accepted = spec.generate(input_ids, pixels)
    np.testing.assert_array_equal(tokens, ref)
    assert accepted == cycles * 3  # target-draft: full acceptance


def test_spec_with_int4_draft(tiny_llava):
    """The production configuration: int4 self-draft of the target tower
    (utils.quantize) — still exactly the target's greedy tokens."""
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params_int4

    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    ref = eng.generate(input_ids, pixels).tokens[0]
    draft = quantize_llama_params_int4(params.lm, group_size=8)
    spec = SpeculativeGreedy(engine=eng, draft_lm=draft, gamma=4)
    tokens, _, _ = spec.generate(input_ids, pixels)
    np.testing.assert_array_equal(tokens, ref)


def test_spec_fused_matches_per_cycle(tiny_llava):
    """generate_fused (whole-generation single-dispatch program, round-4
    verdict item 5) is token-identical to the per-cycle generate for an
    arbitrary draft AND for draft == target."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params, T=9)
    bad_draft = llama.init_params(cfg.text, jax.random.key(99), jnp.float32)
    for draft in (bad_draft, params.lm):
        spec = SpeculativeGreedy(engine=eng, draft_lm=draft, gamma=3)
        ref, _, _ = spec.generate(input_ids, pixels)
        fused, cycles = spec.generate_fused(input_ids, pixels)
        np.testing.assert_array_equal(fused, ref)
        assert cycles >= 1


def test_spec_fused_eos_truncation(tiny_llava):
    """EOS inside an accepted prefix stops the fused program exactly where
    the per-cycle loop stops."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    # pick the eos id the model actually emits early: run greedy, grab
    # the 3rd generated token as the designated eos
    probe = _engine(cfg, params, T=8).generate(input_ids, pixels).tokens[0]
    eos = int(probe[2])
    eng = _engine(cfg, params, T=8)
    eng.gen = GenerationConfig(
        max_new_tokens=8, eos_token_id=eos, pad_token_id=0
    )
    eng.__post_init__()
    spec = SpeculativeGreedy(engine=eng, draft_lm=params.lm, gamma=3)
    ref, _, _ = spec.generate(input_ids, pixels)
    fused, _ = spec.generate_fused(input_ids, pixels)
    np.testing.assert_array_equal(fused, ref)
    assert fused[-1] == eos and len(fused) == 3


# ----------------------------------------------------------------------
# ngram (prompt-lookup) draft: zero weight streams, exact greedy output


def test_ngram_propose_np_cases():
    """Hand-computed matcher cases: continuation replay, recency
    preference, tail padding, and the repeat-current fallback."""
    f = SpeculativeGreedy.ngram_propose_np
    # bigram (1,2) seen at i=1 -> replay hist[3:6]
    np.testing.assert_array_equal(
        f([5, 1, 2, 9, 1, 2], 3, 0), [9, 1, 2]
    )
    # two matches (i=0 and i=3): the MOST RECENT wins
    np.testing.assert_array_equal(
        f([1, 2, 7, 1, 2, 8, 1, 2], 3, 0), [8, 1, 2]
    )
    # continuation shorter than gamma -> pad tail
    np.testing.assert_array_equal(f([1, 2, 1, 2], 3, 0), [1, 2, 0])
    # no match -> repeat the current token
    np.testing.assert_array_equal(f([3, 4, 5], 3, 0), [5, 5, 5])
    np.testing.assert_array_equal(f([3], 2, 0), [3, 3])
    np.testing.assert_array_equal(f([], 2, 9), [9, 9])


def test_ngram_device_matcher_mirrors_host(tiny_llava, rng):
    """The in-program matcher (_ngram_drafts over the padded buffer) and
    the host mirror agree on random histories."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params, T=12)
    spec = SpeculativeGreedy(engine=eng, draft_lm=None, gamma=4,
                             draft="ngram")
    BUF = 24
    for trial in range(50):
        n = int(rng.integers(1, 18))
        hist = rng.integers(1, 5, size=n).astype(np.int32)  # small
        # alphabet -> frequent bigram repeats
        buf = np.zeros((BUF,), np.int32)
        buf[:n] = hist
        dev = np.asarray(
            spec._ngram_drafts(
                jnp.asarray(buf), jnp.int32(n), jnp.asarray(hist[-1:])
            )
        )
        host = spec.ngram_propose_np(hist, 4, 0)
        np.testing.assert_array_equal(dev, host, err_msg=f"trial {trial}")


def test_spec_ngram_matches_greedy(tiny_llava):
    """ngram drafting never changes content: host loop AND the fused
    single-dispatch program both emit exactly the greedy sequence."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params, T=12)
    ref = eng.generate(input_ids, pixels).tokens[0]
    spec = SpeculativeGreedy(engine=eng, draft_lm=None, gamma=3,
                             draft="ngram")
    tokens, cycles, accepted = spec.generate(input_ids, pixels)
    np.testing.assert_array_equal(tokens, ref)
    fused, fcycles = spec.generate_fused(input_ids, pixels)
    np.testing.assert_array_equal(fused, ref)
    assert cycles >= 1 and fcycles >= 1


def test_spec_ngram_accepts_on_repetitive_output():
    """The mechanism that makes ngram drafting WIN: greedy decode on a
    synthetic tower falls into token loops, and the bigram matcher
    harvests them (accepted > 0, tokens/cycle > 1)."""
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        LlamaConfig,
        LlavaConfig,
    )

    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=256,
        ),
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=7,
        ),
        image_token_index=33,
    )
    params = llava_mod.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = _engine(cfg, params, T=64, max_len=256)
    ids = np.array([[1, 5, 33, 9, 11, 2]], np.int32)
    px = np.asarray(
        jax.random.normal(jax.random.key(0), (1, 3, 28, 28)), np.float32
    )
    ref = eng.generate(ids, px).tokens[0]
    spec = SpeculativeGreedy(engine=eng, draft_lm=None, gamma=4,
                             draft="ngram")
    tokens, cycles, accepted = spec.generate(ids, px)
    np.testing.assert_array_equal(tokens, ref)
    assert accepted > 0
    assert len(tokens) / cycles > 1.2  # materially fewer verify streams
    fused, fcycles = spec.generate_fused(ids, px)
    np.testing.assert_array_equal(fused, ref)
    assert fcycles == cycles


def test_spec_ngram_fused_eos_truncation(tiny_llava):
    """EOS inside an accepted ngram prefix stops the fused program
    exactly where the host loop stops."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    probe = _engine(cfg, params, T=8).generate(input_ids, pixels).tokens[0]
    eos = int(probe[2])
    eng = _engine(cfg, params, T=8)
    eng.gen = GenerationConfig(
        max_new_tokens=8, eos_token_id=eos, pad_token_id=0
    )
    eng.__post_init__()
    spec = SpeculativeGreedy(engine=eng, draft_lm=None, gamma=3,
                             draft="ngram")
    ref, _, _ = spec.generate(input_ids, pixels)
    fused, _ = spec.generate_fused(input_ids, pixels)
    np.testing.assert_array_equal(fused, ref)
    assert fused[-1] == eos and len(fused) == 3


def test_spec_ngram_int8_kv(tiny_llava):
    """ngram spec on the int8-KV deployment engine == that engine's own
    greedy tokens (the verify extend reads the quantized prefix)."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    e = _engine(cfg, params)
    e.int8_kv = True
    e.__post_init__()
    ref = e.generate(input_ids, pixels).tokens[0]
    spec = SpeculativeGreedy(engine=e, draft_lm=None, gamma=3,
                             draft="ngram")
    tokens, _, _ = spec.generate(input_ids, pixels)
    np.testing.assert_array_equal(tokens, ref)
    fused, _ = spec.generate_fused(input_ids, pixels)
    np.testing.assert_array_equal(fused, ref)


def test_spec_ngram_rejects_bad_args(tiny_llava):
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    with pytest.raises(ValueError, match="draft_lm"):
        SpeculativeGreedy(engine=eng, draft_lm=None, gamma=3, draft="lm")
    with pytest.raises(ValueError, match="ngram"):
        SpeculativeGreedy(engine=eng, draft_lm=None, gamma=3, draft="bogus")
