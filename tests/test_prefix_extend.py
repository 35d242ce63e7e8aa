"""Prefix caching: prefill_extend over a shared prefix KV must equal the
one-pass prefill of [prefix + tail] (causal attention factorizes), for
GQA towers, broadcast (Bp=1) prefixes, and quantized weights."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dropoutdecoding_tpu.models import llama
from dropoutdecoding_tpu.utils.config import LlamaConfig

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


@pytest.fixture(scope="module")
def tower():
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=8,
        num_key_value_heads=2,
        head_dim=8,
    )
    params = llama.init_params(cfg, jax.random.key(0), jnp.float32)
    return cfg, params


def test_extend_matches_full_prefill(tower, rng):
    cfg, params = tower
    P, T = 11, 5
    ids = jnp.asarray(rng.integers(0, 128, size=(1, P + T)))
    x = llama.embed(params, ids)
    pos = jnp.arange(P + T)[None]
    h_full, kv_full = llama.prefill(params, cfg, x, pos)

    h_pre, kv_pre = llama.prefill(params, cfg, x[:, :P], pos[:, :P])
    h_ext, kv_tail = llama.prefill_extend(
        params, cfg, x[:, P:], pos[:, P:], kv_pre
    )
    np.testing.assert_allclose(
        np.asarray(h_ext), np.asarray(h_full[:, P:]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(kv_tail.k), np.asarray(kv_full.k[:, :, P:]),
        rtol=1e-5, atol=1e-6,
    )


def test_extend_broadcast_prefix_rows(tower, rng):
    """Bp=1 prefix shared across Q tail rows == per-row full prefill."""
    cfg, params = tower
    P, T, Q = 9, 4, 3
    prefix_ids = rng.integers(0, 128, size=(1, P))
    tails = rng.integers(0, 128, size=(Q, T))

    xp = llama.embed(params, jnp.asarray(prefix_ids))
    _, kv_pre = llama.prefill(params, cfg, xp, jnp.arange(P)[None])

    xt = llama.embed(params, jnp.asarray(tails))
    pos_t = jnp.broadcast_to(P + jnp.arange(T)[None], (Q, T))
    h_ext, _ = llama.prefill_extend(params, cfg, xt, pos_t, kv_pre)

    for qi in range(Q):
        full = np.concatenate([prefix_ids[0], tails[qi]])[None]
        xf = llama.embed(params, jnp.asarray(full))
        h_full, _ = llama.prefill(
            params, cfg, xf, jnp.arange(P + T)[None]
        )
        np.testing.assert_allclose(
            np.asarray(h_ext[qi]), np.asarray(h_full[0, P:]),
            rtol=1e-5, atol=1e-5, err_msg=f"row {qi}",
        )


def test_extend_int8_and_int4_towers(tower, rng):
    """Quantized-weight dispatch flows through prefill_extend."""
    from dropoutdecoding_tpu.utils.quantize import (
        quantize_llama_params,
        quantize_llama_params_int4,
    )

    cfg, params = tower
    P, T = 8, 3
    ids = jnp.asarray(rng.integers(0, 128, size=(2, P + T)))
    for qp in (quantize_llama_params(params),
               quantize_llama_params_int4(params)):
        x = llama.embed(qp, ids)
        pos = jnp.broadcast_to(jnp.arange(P + T)[None], (2, P + T))
        h_full, _ = llama.prefill(qp, cfg, x, pos)
        _, kv_pre = llama.prefill(qp, cfg, x[:, :P], pos[:, :P])
        h_ext, _ = llama.prefill_extend(qp, cfg, x[:, P:], pos[:, P:], kv_pre)
        np.testing.assert_allclose(
            np.asarray(h_ext), np.asarray(h_full[:, P:]),
            rtol=1e-4, atol=1e-4,
        )


def test_engine_probe_prefix_extend_matches_probe(tiny_llava, rng):
    """probe_prefix + probe_extend == probe() on the full concatenated
    prompts: same answers and logits for 3 question tails sharing one
    image prefix, including right-padded variable-length tails."""
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

    _, cfg, params, _, _, _ = tiny_llava
    eng = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(),
        gen=GenerationConfig(max_new_tokens=1, eos_token_id=-1, pad_token_id=0),
        max_len=64,
        ensemble=False,
    )
    eng.param_dtype = jnp.float32

    img = cfg.image_token_index
    prefix = np.array([[1, 5, img, 9]], np.int32)
    tails = np.array(
        [[11, 13, 17, 0], [19, 23, 0, 0], [29, 31, 37, 41]], np.int32
    )
    text_lens = np.array([3, 2, 4], np.int32)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    kv = eng.probe_prefix(prefix, pixels)
    got = eng.probe_extend(kv, tails, text_lens)

    # reference: full probe per question (prefix + real tail tokens)
    for qi in range(3):
        full = np.concatenate([prefix[0], tails[qi, : text_lens[qi]]])[None]
        ref = eng.probe(full, pixels)
        assert int(got.first_token[qi]) == int(ref.first_token[0]), qi
        np.testing.assert_allclose(
            np.asarray(got.last_logits[qi]),
            np.asarray(ref.last_logits[0]),
            rtol=1e-4, atol=1e-4, err_msg=f"row {qi}",
        )


def test_llavanext_probe_prefix_extend_matches_probe(rng):
    """LLaVA-NeXT prefix cache: probe_prefix (anyres tiles + shared text,
    static-padded with a key mask) + probe_extend == full probe() per
    question — answers and logits, incl. variable-length tails."""
    import jax

    from dropoutdecoding_tpu.engine.llavanext_engine import LlavaNextEngine
    from dropoutdecoding_tpu.models import llavanext as next_mod
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlamaConfig,
        LlavaNextConfig,
    )

    cfg = LlavaNextConfig(
        text=LlamaConfig(
            vocab_size=64, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=12,
        ),
        vision=ClipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=7,
        ),
        image_grid_pinpoints=((28, 56), (56, 28), (56, 56)),
        image_token_index=32,
    )
    params = next_mod.init_params(cfg, jax.random.key(0), jnp.float32)
    eng = LlavaNextEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(),
        gen=GenerationConfig(max_new_tokens=1, eos_token_id=-1, pad_token_id=0),
        max_len=128,
        ensemble=False,
    )
    eng.param_dtype = jnp.float32

    size = (40, 50)
    geo = next_mod.image_geometry(size, cfg)
    tiles = rng.normal(size=(geo["n_tiles"], 3, 28, 28)).astype(np.float32)
    img = cfg.image_token_index
    prefix = np.array([[1, 5, img, 9]], np.int32)
    tails = np.array(
        [[11, 13, 17, 0], [19, 23, 0, 0], [29, 31, 37, 41]], np.int32
    )
    text_lens = np.array([3, 2, 4], np.int32)

    handle = eng.probe_prefix(prefix, tiles, size)
    got = eng.probe_extend(handle, tails, text_lens)

    for qi in range(3):
        full = np.concatenate([prefix[0], tails[qi, : text_lens[qi]]])[None]
        ref = eng.probe(full, tiles, size)
        assert int(got.first_token[qi]) == int(ref.first_token[0]), qi
        np.testing.assert_allclose(
            np.asarray(got.last_logits[qi]),
            np.asarray(ref.last_logits[0]),
            rtol=1e-4, atol=1e-4, err_msg=f"row {qi}",
        )


def test_extend_int8_prefix_tracks_dense(tower, rng):
    """prefill_extend over the int8-quantized prefix layout (the
    deployment config's prefix caches / speculative verify) tracks the
    dense-prefix extend within int8-KV quantization noise."""
    from dropoutdecoding_tpu.utils.quantize import quantize_kv

    cfg, params = tower
    P, T = 12, 5
    ids = jnp.asarray(rng.integers(0, 128, size=(1, P + T)))
    x = llama.embed(params, ids)
    pos = jnp.arange(P + T)[None]
    _, kv_pre = llama.prefill(params, cfg, x[:, :P], pos[:, :P])

    h_dense, _ = llama.prefill_extend(params, cfg, x[:, P:], pos[:, P:], kv_pre)

    def q(leaf):
        d = quantize_kv(leaf)
        return {
            "q": d["q"].reshape(d["q"].shape[:-2] + (-1,)),
            "s": jnp.swapaxes(d["s"][..., 0], 2, 3),
        }

    kv_q = llama.KVCache(q(kv_pre.k), q(kv_pre.v))
    h_q, _ = llama.prefill_extend(params, cfg, x[:, P:], pos[:, P:], kv_q)
    scale = np.abs(np.asarray(h_dense)).max() + 1e-9
    assert np.abs(np.asarray(h_q) - np.asarray(h_dense)).max() / scale < 0.05


def test_engine_int8_prefix_cache_probe(tiny_llava, rng):
    """int8_kv engine prefix cache: probe_prefix stores the quantized
    prefix; probe_extend answers match the dense-prefix answers on
    decisive rows (first-token margins beyond int8-KV noise)."""
    import dataclasses

    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import (
        EnsembleConfig,
        GenerationConfig,
    )

    _, cfg, params, input_ids, _, pixels = tiny_llava

    def eng(int8):
        e = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(
                max_new_tokens=1, eos_token_id=63, pad_token_id=63
            ),
            max_len=64,
            ensemble=True,
            int8_kv=int8,
            int8_prefix_cache=int8,
        )
        e.param_dtype = jnp.float32
        return e

    dense, quant = eng(False), eng(True)
    prefix_ids = input_ids  # whole prompt as the shared prefix
    tails = np.asarray(rng.integers(3, 60, size=(3, 4)), np.int32)

    kv_d = dense.probe_prefix(prefix_ids, pixels)
    kv_q = quant.probe_prefix(prefix_ids, pixels)
    assert isinstance(kv_q.k, dict) and kv_q.k["q"].dtype == jnp.int8

    rd = dense.probe_extend(kv_d, tails)
    rq = quant.probe_extend(kv_q, tails)
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
