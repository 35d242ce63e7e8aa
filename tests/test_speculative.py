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
