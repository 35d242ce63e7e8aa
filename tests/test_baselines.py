"""Baseline samplers: beam search and VCD (reference vcd_sample.py /
chair_test.py:295-334 beam path)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dropoutdecoding_tpu.engine.baselines import beam_generate, vcd_generate
from dropoutdecoding_tpu.engine.generate import LlavaEngine
from dropoutdecoding_tpu.utils.config import GenerationConfig

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def _engine(cfg, params, **kw):
    # eos/pad = 2: the HF tiny model's config default, so beam termination
    # agrees between the implementations
    defaults = dict(
        cfg=cfg,
        params=params,
        gen=GenerationConfig(max_new_tokens=8, eos_token_id=2, pad_token_id=2),
        max_len=64,
        ensemble=False,
    )
    defaults.update(kw)
    e = LlavaEngine(**defaults)
    e.param_dtype = jnp.float32
    return e


def test_beam1_equals_greedy(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    greedy = eng.generate(input_ids, pixels)
    beam = beam_generate(eng, input_ids, pixels, num_beams=1)
    np.testing.assert_array_equal(greedy.tokens, beam.tokens)


def test_beam3_matches_hf_beam_search(tiny_llava):
    model, cfg, params, input_ids, expanded_ids, pixels = tiny_llava
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.from_numpy(expanded_ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.ones_like(torch.from_numpy(expanded_ids)),
            max_new_tokens=8,
            num_beams=3,
            do_sample=False,
            length_penalty=1.0,
            early_stopping=False,
        )
    ref_new = ref[0, expanded_ids.shape[1] :].numpy()
    eng = _engine(cfg, params)
    out = beam_generate(eng, input_ids, pixels, num_beams=3)
    n = min(len(ref_new), out.num_tokens[0])
    np.testing.assert_array_equal(out.tokens[0, :n], ref_new[:n])


def test_beam_length_penalty_and_early_stopping_match_hf(tiny_llava):
    """HF token parity at non-default beam knobs (round-2 verdict weak #4:
    the knobs used to be silently pinned to 1.0/False)."""
    import pytest

    model, cfg, params, input_ids, expanded_ids, pixels = tiny_llava
    eng = _engine(cfg, params)
    for lp, es in [(2.0, False), (0.5, True), (2.0, "never")]:
        with torch.no_grad():
            ref = model.generate(
                input_ids=torch.from_numpy(expanded_ids),
                pixel_values=torch.from_numpy(pixels),
                attention_mask=torch.ones_like(torch.from_numpy(expanded_ids)),
                max_new_tokens=8,
                num_beams=3,
                do_sample=False,
                length_penalty=lp,
                early_stopping=es,
            )
        ref_new = ref[0, expanded_ids.shape[1] :].numpy()
        out = beam_generate(
            eng, input_ids, pixels, num_beams=3,
            length_penalty=lp, early_stopping=es,
        )
        n = min(len(ref_new), out.num_tokens[0])
        np.testing.assert_array_equal(out.tokens[0, :n], ref_new[:n])

    with pytest.raises(ValueError, match="early_stopping"):
        beam_generate(eng, input_ids, pixels, num_beams=3, early_stopping="bogus")


def test_beam_eos_hypotheses_mid_search_match_hf(tiny_llava):
    """EOS candidates stored MID-search exercise the generated-length
    normalization and finalize's OR-with-replacement (round-5 fix: the
    prompt length used to be included in every normalization divisor,
    which neutralized the length penalty and diverged from HF whenever
    stored hypotheses and running beams had different lengths).  The eos
    id is a token the model actually emits mid-caption, so hypotheses
    ARE stored before the search ends."""
    model, cfg, params, input_ids, expanded_ids, pixels = tiny_llava
    g = _engine(cfg, params).generate(input_ids, pixels).tokens[0]
    eos = int(g[2])  # mid-caption greedy token => reachable eos
    for lp, es in [(1.0, False), (2.0, False), (0.5, True)]:
        with torch.no_grad():
            ref = model.generate(
                input_ids=torch.from_numpy(expanded_ids),
                pixel_values=torch.from_numpy(pixels),
                attention_mask=torch.ones_like(torch.from_numpy(expanded_ids)),
                max_new_tokens=8,
                num_beams=3,
                do_sample=False,
                length_penalty=lp,
                early_stopping=es,
                eos_token_id=eos,
            )
        ref_new = ref[0, expanded_ids.shape[1]:].numpy()
        eng = _engine(
            cfg, params,
            gen=GenerationConfig(
                max_new_tokens=8, eos_token_id=eos, pad_token_id=2
            ),
        )
        out = beam_generate(
            eng, input_ids, pixels, num_beams=3,
            length_penalty=lp, early_stopping=es,
        )
        n = min(len(ref_new), out.num_tokens[0])
        np.testing.assert_array_equal(out.tokens[0, :n], ref_new[:n])


def test_beam_accepts_prebuilt_state(tiny_llava):
    """State-based API used by the InstructBLIP / LLaVA-NeXT beam paths."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    direct = beam_generate(eng, input_ids, pixels, num_beams=2)
    via_state = beam_generate(
        eng, state=eng.prefill(input_ids, pixels), num_beams=2
    )
    np.testing.assert_array_equal(direct.tokens, via_state.tokens)


def test_vcd_runs_and_respects_cutoff(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    out = vcd_generate(eng, input_ids, pixels, seed=7)
    assert out.tokens.shape == (1, 8)
    assert out.num_tokens[0] >= 1
    assert (out.tokens >= 0).all() and (out.tokens < 64).all()


def test_vcd_deterministic_per_seed(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    a = vcd_generate(eng, input_ids, pixels, seed=7)
    b = vcd_generate(eng, input_ids, pixels, seed=7)
    c = vcd_generate(eng, input_ids, pixels, seed=8)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    assert a.tokens.shape == c.tokens.shape


def test_vcd_batched_matches_serial(tiny_llava):
    """A batched vcd_generate call equals running each row serially:
    every row draws noise + samples with the key stream a B=1 call uses
    (per-row vmap with a shared key), which is what lets the CHAIR CLI
    run --vcd --batch-size N without changing outputs."""
    import numpy as _np

    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    rng = _np.random.default_rng(3)
    px2 = _np.asarray(pixels) * 0.5 + 0.1 * rng.random(_np.asarray(pixels).shape).astype(_np.float32)
    ids_b = _np.concatenate([_np.asarray(input_ids)] * 2, axis=0)
    px_b = _np.concatenate([_np.asarray(pixels), px2], axis=0)

    batched = vcd_generate(eng, ids_b, px_b, seed=7)
    s0 = vcd_generate(eng, input_ids, pixels, seed=7)
    s1 = vcd_generate(eng, input_ids, px2, seed=7)
    np.testing.assert_array_equal(batched.tokens[0], s0.tokens[0])
    np.testing.assert_array_equal(batched.tokens[1], s1.tokens[0])


def test_beam_batched_matches_serial(tiny_llava):
    """A [B]-prompt beam_generate equals per-image serial searches
    (flattened B*nb batch + per-image selection/freezing) — the CHAIR
    CLI's --num-beams --batch-size path."""
    import numpy as _np

    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    rng = _np.random.default_rng(11)
    px = _np.asarray(pixels)
    px2 = px * 0.6 + 0.2 * rng.random(px.shape).astype(_np.float32)
    ids_b = _np.concatenate([_np.asarray(input_ids)] * 2, axis=0)
    px_b = _np.concatenate([px, px2], axis=0)

    for lp, es in [(1.0, False), (2.0, True), (0.5, "never")]:
        batched = beam_generate(
            eng,
            state=eng.prefill(ids_b, px_b),
            num_beams=3,
            length_penalty=lp,
            early_stopping=es,
        )
        s0 = beam_generate(
            eng, input_ids, px, num_beams=3, length_penalty=lp,
            early_stopping=es,
        )
        s1 = beam_generate(
            eng, input_ids, px2, num_beams=3, length_penalty=lp,
            early_stopping=es,
        )
        np.testing.assert_array_equal(batched.tokens[0], s0.tokens[0])
        np.testing.assert_array_equal(batched.tokens[1], s1.tokens[0])
        np.testing.assert_array_equal(batched.num_tokens, [s0.num_tokens[0], s1.num_tokens[0]])
