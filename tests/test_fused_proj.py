"""fuse_projections (fused qkv / gate_up weight leaves) correctness.

The fused leaves are a pure weight-layout change — concatenation along the
output axis — so prefill / prefill_extend / decode_step outputs must be
bitwise-identical (dense fp32) or numerically identical (quantized leaves
are concatenated, not requantized) to the split-leaf tower.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropoutdecoding_tpu.models import llama
from dropoutdecoding_tpu.utils.config import LlamaConfig
from dropoutdecoding_tpu.utils.quantize import (
    fuse_projections,
    quantize_llama_params,
    quantize_llama_params_int4,
)

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)

CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
)


def _params(kind):
    base = llama.init_params(CFG, jax.random.key(7), jnp.float32)
    if kind == "int8":
        return quantize_llama_params(base)
    if kind == "int4":
        return quantize_llama_params_int4(base, group_size=16)
    return base


@pytest.mark.parametrize("kind", ["dense", "int8", "int4"])
def test_fused_equals_split_prefill_and_decode(kind):
    rng = np.random.default_rng(1)
    params = _params(kind)
    fused = fuse_projections(params)
    assert "qkv_proj" in fused["layers"] and "q_proj" not in fused["layers"]
    assert "gate_up_proj" in fused["layers"]
    # idempotent
    assert fuse_projections(fused) is fused

    ids = jnp.asarray(rng.integers(0, 128, size=(1, 6)))
    x = llama.embed(params, ids)
    pos = jnp.arange(6)[None]
    h_s, kv_s = llama.prefill(params, CFG, x, pos)
    h_f, kv_f = llama.prefill(fused, CFG, x, pos)
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_f))
    np.testing.assert_array_equal(np.asarray(kv_s.k), np.asarray(kv_f.k))

    # decode step (B=1, M=2 members over a shared cache)
    Smax = 16
    cache = llama.empty_cache(CFG, 1, Smax, jnp.float32)
    cache = llama.KVCache(
        cache.k.at[:, :, :6].set(kv_s.k), cache.v.at[:, :, :6].set(kv_s.v)
    )
    tok = jnp.argmax(llama.lm_head(params, h_s[:, -1]), -1)
    xd = jnp.broadcast_to(llama.embed(params, tok)[:, None], (1, 2, 64))
    mask = jnp.broadcast_to(jnp.arange(Smax)[None, None, :] < 6, (1, 2, Smax))
    pos6 = jnp.full((1,), 6)
    h1_s, k1_s, v1_s = llama.decode_step(params, CFG, xd, pos6, cache, mask)
    h1_f, k1_f, v1_f = llama.decode_step(fused, CFG, xd, pos6, cache, mask)
    np.testing.assert_array_equal(np.asarray(h1_s), np.asarray(h1_f))
    np.testing.assert_array_equal(np.asarray(k1_s), np.asarray(k1_f))
    np.testing.assert_array_equal(np.asarray(v1_s), np.asarray(v1_f))


def test_fused_equals_split_extend():
    params = _params("dense")
    fused = fuse_projections(params)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 5)))
    x = llama.embed(params, ids)
    _, prefix = llama.prefill(params, CFG, x, jnp.arange(5)[None])
    tail = jnp.asarray(rng.normal(size=(1, 3, 64)), jnp.float32)
    pos = (5 + jnp.arange(3))[None]
    h_s, kv_s = llama.prefill_extend(params, CFG, tail, pos, prefix)
    h_f, kv_f = llama.prefill_extend(fused, CFG, tail, pos, prefix)
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_f))
    np.testing.assert_array_equal(np.asarray(kv_s.k), np.asarray(kv_f.k))


def test_engine_generate_identical_with_fused_leaves(tiny_llava):
    """Full ensemble generate (prefill + uncertainty + masked decode +
    winner scatter) is token-identical with fused weight leaves — the
    integration path the chair/serve CLIs take on single-device runs."""
    import dataclasses

    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import (
        EnsembleConfig,
        GenerationConfig,
    )

    _, cfg, params, input_ids, _, pixels = tiny_llava

    def mk(p):
        e = LlavaEngine(
            cfg=cfg,
            params=p,
            ens=EnsembleConfig(),
            gen=GenerationConfig(
                max_new_tokens=8, eos_token_id=63, pad_token_id=63
            ),
            max_len=64,
            ensemble=True,
        )
        e.param_dtype = jnp.float32
        return e

    split = mk(params).generate(input_ids, pixels)
    fused = mk(
        dataclasses.replace(params, lm=fuse_projections(params.lm))
        if dataclasses.is_dataclass(params)
        else params._replace(lm=fuse_projections(params.lm))
    ).generate(input_ids, pixels)
    np.testing.assert_array_equal(split.tokens, fused.tokens)


def test_engine_generate_identical_with_fused_int4_int8kv(tiny_llava):
    """The bench/deployment int4 configuration end-to-end: packed-int4
    fused qkv/gate_up leaves + int8 KV cache through full ensemble
    generate, token-identical to the split-leaf int4 tower."""
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import (
        EnsembleConfig,
        GenerationConfig,
    )

    _, cfg, params, input_ids, _, pixels = tiny_llava
    lm4 = quantize_llama_params_int4(params.lm, group_size=16)

    def mk(lm):
        e = LlavaEngine(
            cfg=cfg,
            params=params._replace(lm=lm),
            ens=EnsembleConfig(),
            gen=GenerationConfig(
                max_new_tokens=8, eos_token_id=63, pad_token_id=63
            ),
            max_len=64,
            ensemble=True,
            int8_kv=True,
        )
        e.param_dtype = jnp.float32
        return e

    split = mk(lm4).generate(input_ids, pixels)
    fused = mk(fuse_projections(lm4)).generate(input_ids, pixels)
    np.testing.assert_array_equal(split.tokens, fused.tokens)


def test_tp_shard_rejects_fused():
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.parallel.mesh import make_mesh, shard_llava_params
    from dropoutdecoding_tpu.utils.config import ClipVisionConfig, LlavaConfig

    cfg = LlavaConfig(
        text=CFG,
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        image_token_index=126,
        pad_token_id=127,
    )
    params = llava_mod.init_params(cfg, jax.random.key(0), jnp.float32)
    params = params._replace(lm=fuse_projections(params.lm))
    mesh = make_mesh(n_data=jax.device_count(), n_model=1)
    with pytest.raises(ValueError, match="fused"):
        shard_llava_params(params, mesh)
