"""Harness regression for cli/fused_gap.run_int4_production_study: the
paired-arm flow (dual towers, exact-K ensembles, greedy arms, reseed
floor, winner TV) runs end-to-end on a tiny dual model and reports sane
fields.  The 7B-shape numbers themselves are a TPU measurement."""
import pytest

import numpy as np

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def test_int4prod_study_tiny(monkeypatch):
    from dropoutdecoding_tpu.cli import fused_gap
    from dropoutdecoding_tpu.models.llava import LlavaParams
    from dropoutdecoding_tpu.utils import synthetic as syn
    from dropoutdecoding_tpu.utils.quantize import (
        quantize_llama_params,
        quantize_llama_params_int4,
    )

    def tiny_dual(key, n_layers=None):
        cfg, params = fused_gap._build(128, 2, 256, 0)
        p8 = params._replace(lm=quantize_llama_params(params.lm))
        p4 = params._replace(lm=quantize_llama_params_int4(params.lm))
        return cfg, p8, p4

    monkeypatch.setattr(syn, "synthetic_llava_7b_dual", tiny_dual)
    out = fused_gap.run_int4_production_study(
        n_prompts=1, T=4, voting_probs=(0.3, 0.5, 0.7)
    )
    for k in ("exact_int8_vs_int4", "int8_seed_noise_floor",
              "greedy_int8_vs_int4"):
        assert 0.0 <= out[k]["mean_match_rate"] <= 1.0, (k, out[k])
        assert out[k]["runs"] == 1
    assert 0.0 <= out["winner_tv_distance"] <= 1.0
