"""Sampling surface: HF warper parity + engine/VCD wiring.

The reference exposes sampling through HF generate kwargs
(do_sample / temperature / top_p / top_k — chair_test.py:331-334) and
the VCD sampler applies the warpers after the contrastive cutoff
(vcd_sample.py:155-161).  These tests pin:

- warp_logits == transformers Temperature/TopK/TopP warpers (same kept
  sets, same surviving values);
- do_sample with top_k=1 == greedy token-for-token (greedy, exact
  ensemble, fused ensemble) — the draw demonstrably flows through the
  warp;
- draws are deterministic per engine seed and vary across seeds;
- the VCD loop's draw passes through the warp (top_k=1 makes two
  different sampling seeds agree).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dropoutdecoding_tpu.engine.generate import LlavaEngine
from dropoutdecoding_tpu.ops.sampling import warp_logits
from dropoutdecoding_tpu.utils.config import (
    EnsembleConfig,
    GenerationConfig,
)

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


@pytest.mark.parametrize(
    "temp,k,p",
    [
        (1.0, None, 1.0),
        (0.7, None, 1.0),
        (1.0, 10, 1.0),
        (1.0, None, 0.9),
        (0.8, 7, 0.85),
        (2.5, 3, 0.5),
        (1.0, 1, 1.0),
        (1.0, None, 0.05),
    ],
)
def test_warp_matches_hf_warpers(temp, k, p):
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper,
        TopKLogitsWarper,
        TopPLogitsWarper,
    )

    rng = np.random.default_rng(0)
    logits = (rng.normal(size=(5, 64)) * 3).astype(np.float32)

    ref = torch.from_numpy(logits.copy())
    if temp != 1.0:
        ref = TemperatureLogitsWarper(temp)(None, ref)
    if k is not None:
        ref = TopKLogitsWarper(k)(None, ref)
    if p < 1.0:
        ref = TopPLogitsWarper(top_p=p)(None, ref)
    ref = ref.numpy()

    ours = np.asarray(warp_logits(jnp.asarray(logits), temp, k, p))

    kept_ref = np.isfinite(ref)
    kept_ours = np.isfinite(ours)
    np.testing.assert_array_equal(kept_ours, kept_ref)
    np.testing.assert_allclose(ours[kept_ours], ref[kept_ref], rtol=1e-6)
    # at least one token survives per row
    assert kept_ours.any(axis=-1).all()


@pytest.mark.parametrize(
    "mode",
    ["greedy", "exact", "fused"],
)
def test_do_sample_topk1_equals_greedy(tiny_llava, mode):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    kw = dict(ensemble=mode != "greedy")
    if mode != "greedy":
        kw["ens"] = EnsembleConfig(
            mask_policy="epis", fused_step=mode == "fused"
        )
    base = _engine(cfg, params, **kw).generate(input_ids, pixels)
    gen_s = GenerationConfig(
        max_new_tokens=8, eos_token_id=63, pad_token_id=63,
        do_sample=True, top_k=1, temperature=0.7,
    )
    sampled = _engine(cfg, params, gen=gen_s, **kw).generate(input_ids, pixels)
    np.testing.assert_array_equal(base.tokens, sampled.tokens)


def test_do_sample_deterministic_and_seed_sensitive(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    gen_s = GenerationConfig(
        max_new_tokens=8, eos_token_id=63, pad_token_id=63,
        do_sample=True, temperature=8.0,
    )
    outs = []
    for seed in (24, 24, 1, 2):
        e = _engine(cfg, params, ensemble=False, gen=gen_s, seed=seed)
        outs.append(e.generate(input_ids, pixels).tokens)
    np.testing.assert_array_equal(outs[0], outs[1])  # same seed: identical
    # across 3 distinct seeds at temperature 8, at least one run differs
    assert not (
        np.array_equal(outs[0], outs[2]) and np.array_equal(outs[0], outs[3])
    )


def test_vcd_draw_flows_through_warp(tiny_llava):
    from dropoutdecoding_tpu.decoding.vcd import diffusion_noise
    from dropoutdecoding_tpu.engine.baselines import vcd_generate

    import jax

    _, cfg, params, input_ids, _, pixels = tiny_llava
    gen_s = GenerationConfig(
        max_new_tokens=6, eos_token_id=63, pad_token_id=63,
        use_cd=True, top_k=1,
    )
    e = _engine(cfg, params, ensemble=False, gen=gen_s)
    noised = np.asarray(
        diffusion_noise(jax.random.key(0), jnp.asarray(pixels), 500)
    )
    states = (e.prefill(input_ids, pixels), e.prefill(input_ids, noised))
    # top_k=1 collapses the multinomial to the contrastive argmax: two
    # different SAMPLING seeds must agree (the noise is pinned via states)
    a = vcd_generate(e, states=states, seed=1)
    b = vcd_generate(e, states=states, seed=2)
    np.testing.assert_array_equal(a.tokens, b.tokens)


def test_cli_rejects_beam_sample(tmp_path):
    from dropoutdecoding_tpu.cli.chair_test import build_parser, make_engine

    args = build_parser().parse_args(
        [
            "--coco-data-dir", str(tmp_path),
            "--model-path", str(tmp_path),
            "--do-sample", "true",
            "--num-beams", "3",
        ]
    )
    with pytest.raises(SystemExit, match="beam-sample"):
        make_engine(args)
