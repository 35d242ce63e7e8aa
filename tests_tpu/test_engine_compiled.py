"""Compiled engine-path equivalences on a real TPU.

Extends the hardware-verified surface beyond raw kernels
(test_kernels_compiled.py) to the engine programs the CLIs actually
dispatch: the probe fast path (with image dedupe), w8a8 prefill, and the
fused decode step.  Small-but-TPU-real shapes: head_dim 128 (so the
Pallas dispatch conditions hold), reduced depth/width so each case fits
the remote-tunnel window.

    python -m pytest tests_tpu/ -x -q
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tpu_available() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _tpu_available(), reason="no TPU")


@pytest.fixture(scope="module")
def small_engine():
    """GQA llama tower at head_dim 128 (fused-kernel eligible) + tiny ViT."""
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlamaConfig,
        LlavaConfig,
    )

    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=512,
            hidden_size=512,
            intermediate_size=1024,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=128,
        ),
        vision=ClipVisionConfig(
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=56,
            patch_size=14,
        ),
        image_token_index=510,
        pad_token_id=511,
    )
    params = llava_mod.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    eng = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(fused_step=True),
        gen=GenerationConfig(max_new_tokens=8, eos_token_id=-1, pad_token_id=0),
        max_len=64,
        ensemble=True,
        seed=24,
    )
    return cfg, params, eng


def _inputs(cfg, B, rng):
    img = cfg.image_token_index
    rows = []
    for _ in range(B):
        L = int(rng.integers(6, 10))
        row = [1] + list(rng.integers(3, 500, L - 1))
        row[2] = img
        rows.append(row)
    S = max(len(r) for r in rows)
    ids = np.zeros((B, S), np.int32)
    lens = np.array([len(r) for r in rows], np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
    sz = cfg.vision.image_size
    px = rng.normal(size=(B, 3, sz, sz)).astype(np.float32)
    return ids, px, lens


def test_probe_matches_prefill_compiled(small_engine):
    """probe == prefill first-token on hardware, incl. unique-image
    dedupe — the batched-POPE fast path the CLI dispatches."""
    cfg, params, eng = small_engine
    rng = np.random.default_rng(0)
    ids, _, lens = _inputs(cfg, 4, rng)
    sz = cfg.vision.image_size
    unique_px = rng.normal(size=(2, 3, sz, sz)).astype(np.float32)
    image_index = np.array([0, 0, 1, 1], np.int32)
    px = unique_px[image_index]

    ref = eng.prefill(ids, px, text_lens=lens)
    probe = eng.probe(ids, px, text_lens=lens)
    # identical pixel batch => identical program inputs => exact equality
    np.testing.assert_array_equal(
        np.asarray(probe.first_token), np.asarray(ref.first_token)
    )
    deduped = eng.probe(ids, unique_px, text_lens=lens, image_index=image_index)
    # the deduped ViT runs at batch 2 instead of 4: bf16 accumulation
    # order differs, so logits carry batch-shape noise (CPU fp32 equality
    # is exact — tests/test_engine.py).  Require close logits and argmax
    # equality wherever the reference's top-2 margin exceeds that noise.
    la = np.asarray(ref.last_logits)
    lb = np.asarray(deduped.last_logits)
    scale = np.abs(la).max() + 1e-9
    noise = np.abs(la - lb).max() / scale
    assert noise < 2e-2, noise  # bf16-level, not a logic error
    top2 = np.sort(la, axis=-1)[:, -2:]
    margin = (top2[:, 1] - top2[:, 0]) / scale
    decisive = margin > 2 * noise
    assert decisive.any()
    np.testing.assert_array_equal(
        np.asarray(deduped.first_token)[decisive],
        np.asarray(ref.first_token)[decisive],
    )


def test_w8a8_prefill_tracks_bf16_compiled(small_engine):
    """w8a8 (int8-MXU) prefill stays close to the bf16-activation prefill
    on hardware: same argmax on most rows, logits within int8-act noise."""
    from dataclasses import replace as _replace

    cfg, params, eng = small_engine
    rng = np.random.default_rng(1)
    ids, px, lens = _inputs(cfg, 4, rng)

    e8 = _replace(eng)
    e8.w8a8_prefill = True
    e8.__post_init__()

    a = eng.prefill(ids, px, text_lens=lens)
    b = e8.prefill(ids, px, text_lens=lens)
    la, lb = np.asarray(a.last_logits), np.asarray(b.last_logits)
    scale = np.abs(la).max() + 1e-9
    assert np.abs(la - lb).max() / scale < 0.12  # int8-activation drift
    # greedy argmax agrees on at least 3 of 4 rows at this scale
    agree = (np.asarray(a.first_token) == np.asarray(b.first_token)).sum()
    assert agree >= 3, (a.first_token, b.first_token)


def test_fused_generate_runs_compiled(small_engine):
    """The fused single-stream decode program (the ≤1.5x-latency path,
    GQA head_dim 128 → Pallas ensemble-decode attention eligible)
    compiles and generates on hardware; greedy == its own argmax chain."""
    cfg, params, eng = small_engine
    rng = np.random.default_rng(2)
    ids, px, lens = _inputs(cfg, 2, rng)
    out = eng.generate(ids, px)
    assert out.tokens.shape == (2, 8)
    assert (out.tokens >= 0).all()


def test_prefix_extend_matches_probe_compiled(small_engine):
    """probe_prefix + probe_extend == probe on hardware (the
    --prefix-cache POPE path): same answers where the top-2 margin
    exceeds bf16 program-split noise."""
    cfg, params, eng = small_engine
    rng = np.random.default_rng(3)
    img = cfg.image_token_index
    prefix = np.array([[1, 5, img, 9, 12, 15]], np.int32)
    Q, Tt = 4, 8
    tails = rng.integers(3, 500, (Q, Tt)).astype(np.int32)
    lens = rng.integers(5, Tt + 1, Q).astype(np.int32)
    sz = cfg.vision.image_size
    px = rng.normal(size=(1, 3, sz, sz)).astype(np.float32)

    kv = eng.probe_prefix(prefix, px)
    got = eng.probe_extend(kv, tails, lens)

    full_rows = [
        np.concatenate([prefix[0], tails[q, : lens[q]]]) for q in range(Q)
    ]
    S = max(len(r) for r in full_rows)
    ids = np.zeros((Q, S), np.int32)
    flens = np.array([len(r) for r in full_rows], np.int32)
    for i, r in enumerate(full_rows):
        ids[i, : len(r)] = r
    ref = eng.probe(ids, np.repeat(px, Q, 0), text_lens=flens)

    la = np.asarray(ref.last_logits)
    lb = np.asarray(got.last_logits)
    scale = np.abs(la).max() + 1e-9
    noise = np.abs(la - lb).max() / scale
    assert noise < 2e-2, noise
    top2 = np.sort(la, axis=-1)[:, -2:]
    margin = (top2[:, 1] - top2[:, 0]) / scale
    decisive = margin > 2 * noise
    assert decisive.any()
    np.testing.assert_array_equal(
        np.asarray(got.first_token)[decisive],
        np.asarray(ref.first_token)[decisive],
    )


def test_sampled_decode_topk1_equals_greedy_compiled(small_engine):
    """do_sample with top_k=1 == greedy on hardware — the warp +
    categorical draw run inside the compiled while_loop."""
    from dataclasses import replace as _replace

    from dropoutdecoding_tpu.utils.config import GenerationConfig

    cfg, params, eng = small_engine
    rng = np.random.default_rng(4)
    ids, px, _ = _inputs(cfg, 2, rng)
    base = eng.generate(ids, px)
    es = _replace(eng)
    es.gen = GenerationConfig(
        max_new_tokens=8, eos_token_id=-1, pad_token_id=0,
        do_sample=True, top_k=1, temperature=0.7,
    )
    es.__post_init__()
    sampled = es.generate(ids, px)
    np.testing.assert_array_equal(base.tokens, sampled.tokens)


def test_llavanext_prefix_extend_compiled():
    """LLaVA-NeXT prefix cache on hardware: the static-padded anyres
    prefix + key-masked extend produce probe-consistent answers."""
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
            vocab_size=512,
            hidden_size=512,
            intermediate_size=1024,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=128,
        ),
        vision=ClipVisionConfig(
            hidden_size=128,
            intermediate_size=256,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=56,
            patch_size=14,
        ),
        image_grid_pinpoints=((56, 112), (112, 56), (112, 112)),
        image_token_index=510,
    )
    params = next_mod.init_params(cfg, jax.random.key(1), jnp.bfloat16)
    eng = LlavaNextEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(),
        gen=GenerationConfig(max_new_tokens=1, eos_token_id=-1, pad_token_id=0),
        max_len=256,
        ensemble=False,
        seed=506,
    )

    rng = np.random.default_rng(5)
    size = (80, 100)
    geo = next_mod.image_geometry(size, cfg)
    tiles = rng.normal(size=(geo["n_tiles"], 3, 56, 56)).astype(np.float32)
    img = cfg.image_token_index
    prefix = np.array([[1, 5, img, 9]], np.int32)
    Q, Tt = 3, 6
    tails = rng.integers(3, 500, (Q, Tt)).astype(np.int32)
    lens = rng.integers(4, Tt + 1, Q).astype(np.int32)

    handle = eng.probe_prefix(prefix, tiles, size)
    got = eng.probe_extend(handle, tails, lens)

    full_rows = [
        np.concatenate([prefix[0], tails[q, : lens[q]]]) for q in range(Q)
    ]
    S = max(len(r) for r in full_rows)
    ids = np.zeros((Q, S), np.int32)
    flens = np.array([len(r) for r in full_rows], np.int32)
    for i, r in enumerate(full_rows):
        ids[i, : len(r)] = r
    ref = eng.probe(
        ids, [tiles] * Q, [size] * Q, text_lens=flens
    )

    la = np.asarray(ref.last_logits)
    lb = np.asarray(got.last_logits)
    scale = np.abs(la).max() + 1e-9
    noise = np.abs(la - lb).max() / scale
    assert noise < 2e-2, noise
    top2 = np.sort(la, axis=-1)[:, -2:]
    margin = (top2[:, 1] - top2[:, 0]) / scale
    decisive = margin > 2 * noise
    assert decisive.any()
    np.testing.assert_array_equal(
        np.asarray(got.first_token)[decisive],
        np.asarray(ref.first_token)[decisive],
    )


def test_fused_leaves_decode_step_compiled(small_engine):
    """Fused qkv/gate_up weight leaves (the single-device CLI default,
    --fuse-proj) through the COMPILED int8 decode path: decode_step
    hidden states match the split-leaf program to bf16 tiling noise, and
    the full fused-step generate runs with fused leaves."""
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models import llama as llama_mod
    from dropoutdecoding_tpu.utils.config import (
        EnsembleConfig,
        GenerationConfig,
    )
    from dropoutdecoding_tpu.utils.quantize import (
        fuse_projections,
        quantize_llama_params,
    )

    cfg, params, _ = small_engine
    qlm = quantize_llama_params(params.lm)
    flm = fuse_projections(dict(qlm))
    rng = np.random.default_rng(5)

    B, M, Smax = 2, 3, 64
    D = cfg.text.hidden_size
    x = jnp.asarray(rng.normal(size=(B, M, D)) * 0.3, jnp.bfloat16)
    cache = llama_mod.empty_cache(cfg.text, B, Smax, jnp.bfloat16, quantized=True)
    mask = jnp.broadcast_to(jnp.arange(Smax)[None, None, :] < 9, (B, M, Smax))
    pos = jnp.full((B,), 9)

    h_s, k_s, v_s = jax.jit(llama_mod.decode_step, static_argnums=(1,))(
        qlm, cfg.text, x, pos, cache, mask
    )
    h_f, k_f, v_f = jax.jit(llama_mod.decode_step, static_argnums=(1,))(
        flm, cfg.text, x, pos, cache, mask
    )
    ha, hb = np.asarray(h_s, np.float32), np.asarray(h_f, np.float32)
    scale = np.abs(ha).max() + 1e-9
    assert np.abs(ha - hb).max() / scale < 2e-2  # bf16 tiling noise only
    np.testing.assert_allclose(
        np.asarray(k_s, np.float32), np.asarray(k_f, np.float32),
        rtol=2e-2, atol=2e-2 * scale,
    )

    # full generate with fused int8 leaves + int8 KV (the deployment path)
    fe = LlavaEngine(
        cfg=cfg,
        params=params._replace(lm=flm),
        ens=EnsembleConfig(fused_step=True),
        gen=GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0),
        max_len=64,
        ensemble=True,
        seed=24,
        int8_kv=True,
    )
    ids, px, lens = _inputs(cfg, 2, rng)
    out = fe.generate(ids, px)
    assert out.tokens.shape == (2, 6)
    assert (out.tokens >= 0).all()


def test_chunked_prefill_matches_one_shot_compiled(small_engine):
    """Chunked prefill (serving stall bound) == one-shot prefill on
    hardware: same first token where the top-2 margin exceeds bf16
    program-split noise, close logits, same full generation path."""
    cfg, params, eng = small_engine
    rng = np.random.default_rng(7)
    ids, px, _ = _inputs(cfg, 1, rng)

    ref = eng.prefill(ids, px)
    got = eng.prefill_chunked(ids, px, chunk=8)
    la = np.asarray(ref.last_logits)
    lb = np.asarray(got.last_logits)
    scale = np.abs(la).max() + 1e-9
    noise = np.abs(la - lb).max() / scale
    assert noise < 2e-2, noise
    top2 = np.sort(la, axis=-1)[:, -2:]
    if (top2[:, 1] - top2[:, 0]) / scale > 2 * noise:
        np.testing.assert_array_equal(
            np.asarray(got.first_token), np.asarray(ref.first_token)
        )


def test_int8_prefix_extend_compiled(small_engine):
    """Quantized-prefix extend (extend_attention_int8prefix through
    prefill_extend's dict branch) on hardware: int8-prefix probe answers
    track the dense-prefix answers on decisive rows."""
    from dataclasses import replace as _replace

    cfg, params, eng = small_engine
    rng = np.random.default_rng(11)
    ids, px, _ = _inputs(cfg, 1, rng)
    tails = np.asarray(rng.integers(3, 500, size=(2, 6)), np.int32)

    e8 = _replace(eng)
    e8.int8_kv = True
    e8.int8_prefix_cache = True
    e8.__post_init__()

    kv_d = eng.probe_prefix(ids, px)
    kv_q = e8.probe_prefix(ids, px)
    assert isinstance(kv_q.k, dict)
    rd = eng.probe_extend(kv_d, tails)
    rq = e8.probe_extend(kv_q, tails)
    la, lb = np.asarray(rd.last_logits), np.asarray(rq.last_logits)
    scale = np.abs(la).max() + 1e-9
    noise = np.abs(la - lb).max() / scale
    assert noise < 0.06, noise
    top2 = np.sort(la, axis=-1)[:, -2:]
    decisive = (top2[:, 1] - top2[:, 0]) / scale > 2 * noise
    if decisive.any():
        np.testing.assert_array_equal(
            np.asarray(rq.first_token)[decisive],
            np.asarray(rd.first_token)[decisive],
        )
