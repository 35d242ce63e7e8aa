"""End-to-end engine tests on a tiny random LLaVA.

- greedy engine == HF LlavaForConditionalGeneration.generate (greedy)
- ensemble engine with mask policy 'none' == greedy (all members see the
  full context, so vote trivially returns the unmasked argmax; this
  exercises the winner-KV scatter + vote machinery end to end)
- masked ensemble produces valid output and differs under 'all_image'
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dropoutdecoding_tpu.engine.generate import LlavaEngine
from dropoutdecoding_tpu.models import llava
from dropoutdecoding_tpu.utils.config import (
    EnsembleConfig,
    GenerationConfig,
    LlavaConfig,
)
from dropoutdecoding_tpu.utils.hf_io import state_dict_from_torch_module

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def _engine(cfg, params, **kw):
    defaults = dict(
        cfg=cfg,
        params=params,
        gen=GenerationConfig(max_new_tokens=8, eos_token_id=63, pad_token_id=63),
        max_len=64,
    )
    defaults.update(kw)
    e = LlavaEngine(**defaults)
    e.param_dtype = jnp.float32
    return e


def test_greedy_matches_hf_generate(tiny_llava):
    model, cfg, params, input_ids, expanded_ids, pixels = tiny_llava
    with torch.no_grad():
        ref = model.generate(
            input_ids=torch.from_numpy(expanded_ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.ones_like(torch.from_numpy(expanded_ids)),
            max_new_tokens=8,
            do_sample=False,
        )
    ref_new = ref[0, expanded_ids.shape[1] :].numpy()

    eng = _engine(cfg, params, ensemble=False)
    out = eng.generate(input_ids, pixels)
    n = min(len(ref_new), out.num_tokens[0])
    np.testing.assert_array_equal(out.tokens[0, :n], ref_new[:n])


def test_ensemble_none_policy_equals_greedy(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    greedy = _engine(cfg, params, ensemble=False).generate(input_ids, pixels)
    ens = _engine(
        cfg,
        params,
        ensemble=True,
        ens=EnsembleConfig(mask_policy="none", voting_probs=(0.3, 0.5, 0.7)),
    ).generate(input_ids, pixels)
    np.testing.assert_array_equal(greedy.tokens, ens.tokens)


def test_ensemble_epis_runs_and_emits_tokens(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    out = _engine(
        cfg,
        params,
        ensemble=True,
        ens=EnsembleConfig(mask_policy="epis"),
    ).generate(input_ids, pixels)
    assert out.tokens.shape == (1, 8)
    assert out.num_tokens[0] >= 1
    assert (out.tokens >= 0).all() and (out.tokens < 64).all()


def test_prefill_state_fields(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    eng = _engine(cfg, params)
    st = eng.prefill(input_ids, pixels)
    N = cfg.vision.num_patches
    assert st.epis.shape == (1, N)
    assert st.topk_ids.shape == (1, N, 5)
    assert int(st.cur_len[0]) == input_ids.shape[1] + N - 1
    assert int(st.image_pos[0]) == 3
    assert np.all(np.asarray(st.uncertainty["alea_uncert_per_token"]) >= 0)


def test_fused_step_none_policy_equals_greedy(tiny_llava):
    """Fused (single weight stream) mode with no masking must still equal
    greedy — exercises the width-(K+1) path and lagged-overlap plumbing."""
    _, cfg, params, input_ids, _, pixels = tiny_llava
    greedy = _engine(cfg, params, ensemble=False).generate(input_ids, pixels)
    fused = _engine(
        cfg,
        params,
        ensemble=True,
        ens=EnsembleConfig(mask_policy="none", fused_step=True),
    ).generate(input_ids, pixels)
    np.testing.assert_array_equal(greedy.tokens, fused.tokens)


def test_fused_step_epis_runs(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    out = _engine(
        cfg,
        params,
        ensemble=True,
        ens=EnsembleConfig(mask_policy="epis", fused_step=True),
    ).generate(input_ids, pixels)
    assert out.tokens.shape == (1, 8)
    assert out.num_tokens[0] >= 1


def test_use_avg_aggregation(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    out = _engine(
        cfg,
        params,
        ensemble=True,
        ens=EnsembleConfig(mask_policy="epis", use_avg=True),
    ).generate(input_ids, pixels)
    assert out.num_tokens[0] >= 1


def test_variable_length_batched_prefill_matches_per_row(tiny_llava):
    """Right-padded variable-length batch (text_lens): every per-row field
    of the batched PrefillState matches the row's own single-row prefill —
    the batched-POPE path's correctness contract."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    img = cfg.image_token_index

    rows = [
        [1, 5, img, 9, 4, 6],
        [1, 5, img, 9],
        [1, 7, 8, 5, img, 9, 3],
    ]
    rng = np.random.default_rng(0)
    sz = cfg.vision.image_size
    pixels = rng.normal(size=(3, 3, sz, sz)).astype(np.float32)
    S = max(len(r) for r in rows)
    ids = np.zeros((3, S), np.int32)
    lens = np.array([len(r) for r in rows], np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r

    batched = eng.prefill(ids, pixels, text_lens=lens)
    for i, r in enumerate(rows):
        single = eng.prefill(np.asarray([r], np.int32), pixels[i : i + 1])
        assert int(batched.cur_len[i]) == int(single.cur_len[0])
        assert int(batched.first_token[i]) == int(single.first_token[0])
        np.testing.assert_allclose(
            np.asarray(batched.last_logits[i]),
            np.asarray(single.last_logits[0]),
            atol=2e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(batched.epis[i]),
            np.asarray(single.epis[0]),
            atol=2e-4, rtol=1e-3,
        )


def test_variable_length_probe_ids_ignore_padding(tiny_llava):
    """Right-padded rows must NOT capture pad token 0 as a VQA probe id
    (0 is a valid vocab id; the 'vqa' keep-set would silently change)."""
    from dropoutdecoding_tpu.engine.generate import extract_probe_ids

    # marker 727 near the row's real end, then pad 0s
    ids = np.zeros((2, 12), np.int32)
    ids[0, :6] = [1, 55, 99, 727, 300, 301]
    ids[1, :5] = [1, 727, 40, 41, 42]
    lens = np.array([6, 5], np.int32)
    got = np.asarray(extract_probe_ids(jnp.asarray(ids), text_lens=lens))
    np.testing.assert_array_equal(got[0], [300, 301, -1, -1, -1, -1, -1, -1])
    np.testing.assert_array_equal(got[1], [40, 41, 42, -1, -1, -1, -1, -1])
    # without text_lens the pads WOULD be captured — documents the hazard
    raw = np.asarray(extract_probe_ids(jnp.asarray(ids)))
    assert (raw[0] == 0).any()


def test_probe_matches_prefill_with_image_dedupe(tiny_llava):
    """The lite probe path (POPE 1-token fast path) must reproduce the
    full prefill's first_token/last_logits exactly, both with replicated
    pixels and with unique-image dedupe via image_index (round-2 verdict
    weak #2)."""
    _, cfg, params, _, _, _ = tiny_llava
    eng = _engine(cfg, params)
    img = cfg.image_token_index

    rows = [
        [1, 5, img, 9, 4, 6],
        [1, 5, img, 9],
        [1, 7, 8, 5, img, 9, 3],
        [1, 2, img, 9, 4],
    ]
    rng = np.random.default_rng(3)
    sz = cfg.vision.image_size
    # 2 unique images for 4 rows (POPE: 6 consecutive questions per image)
    unique_px = rng.normal(size=(2, 3, sz, sz)).astype(np.float32)
    image_index = np.array([0, 0, 1, 1], np.int32)
    full_px = unique_px[image_index]
    S = max(len(r) for r in rows)
    ids = np.zeros((4, S), np.int32)
    lens = np.array([len(r) for r in rows], np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r

    ref = eng.prefill(ids, full_px, text_lens=lens)
    probe = eng.probe(ids, full_px, text_lens=lens)
    np.testing.assert_array_equal(
        np.asarray(probe.first_token), np.asarray(ref.first_token)
    )
    np.testing.assert_allclose(
        np.asarray(probe.last_logits), np.asarray(ref.last_logits),
        atol=1e-5, rtol=1e-5,
    )

    deduped = eng.probe(
        ids, unique_px, text_lens=lens, image_index=image_index
    )
    np.testing.assert_array_equal(
        np.asarray(deduped.first_token), np.asarray(ref.first_token)
    )
    np.testing.assert_allclose(
        np.asarray(deduped.last_logits), np.asarray(ref.last_logits),
        atol=1e-5, rtol=1e-5,
    )
