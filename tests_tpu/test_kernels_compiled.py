"""Compiled-mode kernel equivalence on a real TPU.

The main suite (tests/) pins itself to the 8-device virtual CPU mesh and
exercises the Pallas kernels in interpret mode; this suite runs the same
equivalences compiled on actual hardware.  It is NOT collected by
`pytest tests/` — run it manually on a TPU host:

    python -m pytest tests_tpu/ -x -q

Each test skips itself if no TPU backend is reachable.
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


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk_int8(rng, B, M, H, KH, D, S):
    q = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 128, (B, S, KH, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, S, KH, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.03, (B, KH, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.03, (B, KH, S)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, M, S)) < 0.7).at[:, :, 0].set(True)
    return q, kq, ks, vq, vs, kn, vn, mask


@pytest.mark.parametrize(
    "B,M,H,KH,S",
    [(2, 4, 8, 8, 96), (2, 4, 8, 2, 96), (16, 9, 32, 32, 640), (2, 9, 32, 8, 3328)],
)
def test_fused_int8_decode_attention_compiled(rng, B, M, H, KH, S):
    from dropoutdecoding_tpu.ops.attention import ensemble_decode_attention_int8kv
    from dropoutdecoding_tpu.ops.pallas_decode_attention import (
        ensemble_decode_attention_int8kv_fused,
    )

    args = _mk_int8(rng, B, M, H, KH, 128, S)
    ref = np.asarray(ensemble_decode_attention_int8kv(*args), np.float32)
    got = np.asarray(ensemble_decode_attention_int8kv_fused(*args), np.float32)
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(ref - got)) / scale < 2e-2


@pytest.mark.parametrize("B,M,H,KH,S", [(2, 4, 32, 8, 333), (8, 9, 32, 8, 1024)])
def test_fused_bf16_decode_attention_compiled(rng, B, M, H, KH, S):
    from dropoutdecoding_tpu.ops.attention import ensemble_decode_attention
    from dropoutdecoding_tpu.ops.pallas_decode_attention import (
        ensemble_decode_attention_fused,
    )

    D = 128
    q = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, S, KH, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, S, KH, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, M, S)) < 0.7).at[:, :, 0].set(True)

    ref = np.asarray(ensemble_decode_attention(q, kc, vc, kn, vn, mask), np.float32)
    got = np.asarray(
        ensemble_decode_attention_fused(q, kc, vc, kn, vn, mask), np.float32
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(ref - got)) / scale < 2e-2


def test_flash_prefill_attention_compiled(rng):
    from dropoutdecoding_tpu.ops.attention import prefill_attention
    from dropoutdecoding_tpu.ops.pallas_attention import flash_prefill_attention

    B, S, H, D = 1, 640, 8, 128
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
    mask = jnp.ones((B, S), jnp.int32)
    ref = np.asarray(prefill_attention(q, k, v, causal=True, key_mask=mask), np.float32)
    got = np.asarray(flash_prefill_attention(q, k, v, mask, causal=True), np.float32)
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(ref - got)) / scale < 2e-2


def test_engine_gqa_int8_generate_runs(rng):
    """End-to-end ensemble generate through the GQA kernel dispatch."""
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.models.llava import LlavaParams
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlamaConfig,
        LlavaConfig,
    )
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params

    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=256,
            hidden_size=1024,
            intermediate_size=2048,
            num_hidden_layers=3,
            num_attention_heads=8,
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
        image_token_index=254,
        pad_token_id=255,
    )
    params = llava_mod.init_params(cfg, jax.random.key(0), jnp.bfloat16)
    qp = LlavaParams(
        vision=params.vision,
        projector=params.projector,
        lm=quantize_llama_params(params.lm),
    )
    e = LlavaEngine(
        cfg=cfg,
        params=qp,
        ens=EnsembleConfig(),
        gen=GenerationConfig(max_new_tokens=8, eos_token_id=-1, pad_token_id=0),
        max_len=64,
        ensemble=True,
        seed=24,
        int8_kv=True,
    )
    ids = np.array([[1, 7, 9, 254, 11, 13]], np.int32)
    px = np.zeros((1, 3, 56, 56), np.float32)
    r = e.generate(ids, px)
    assert r.tokens.shape == (1, 8)


@pytest.mark.parametrize(
    "B,M,H,KH,S",
    [(16, 9, 32, 32, 640), (2, 9, 32, 8, 3328)],  # MHA stretch / GQA serving
)
def test_layered_int8_decode_attention_compiled(rng, B, M, H, KH, S):
    """Layered kernel (full cache in HBM, scalar-prefetch layer index)
    vs the XLA op on the indexed slice, compiled at production shapes."""
    from dropoutdecoding_tpu.ops.attention import ensemble_decode_attention_int8kv
    from dropoutdecoding_tpu.ops.pallas_decode_attention import (
        ensemble_decode_attention_int8kv_layered,
    )

    L, D = 3, 128
    q, kq1, ks1, vq1, vs1, kn, vn, mask = _mk_int8(rng, B, M, H, KH, D, S)
    kq = jnp.stack([jnp.roll(kq1, i, axis=1) for i in range(L)])
    vq = jnp.stack([jnp.roll(vq1, i, axis=1) for i in range(L)])
    ks = jnp.stack([jnp.roll(ks1, i, axis=2) for i in range(L)])
    vs = jnp.stack([jnp.roll(vs1, i, axis=2) for i in range(L)])
    for li in (0, L - 1):
        ref = np.asarray(
            ensemble_decode_attention_int8kv(
                q, kq[li], ks[li], vq[li], vs[li], kn, vn, mask
            ),
            np.float32,
        )
        got = np.asarray(
            ensemble_decode_attention_int8kv_layered(
                jnp.int32(li),
                q,
                kq.reshape(*kq.shape[:3], -1),  # cache's head-flat layout
                ks,
                vq.reshape(*vq.shape[:3], -1),
                vs,
                kn,
                vn,
                mask,
            ),
            np.float32,
        )
        scale = np.max(np.abs(ref)) + 1e-9
        assert np.max(np.abs(ref - got)) / scale < 2e-2, li


def test_layered_bf16_decode_attention_compiled(rng):
    from dropoutdecoding_tpu.ops.attention import ensemble_decode_attention
    from dropoutdecoding_tpu.ops.pallas_decode_attention import (
        ensemble_decode_attention_layered,
    )

    L, B, M, H, KH, D, S = 2, 2, 4, 32, 8, 128, 1024
    q = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(L, B, S, KH, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(L, B, S, KH, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, M, S)) < 0.7).at[:, :, 0].set(True)
    for li in range(L):
        ref = np.asarray(
            ensemble_decode_attention(q, kc[li], vc[li], kn, vn, mask),
            np.float32,
        )
        got = np.asarray(
            ensemble_decode_attention_layered(
                jnp.int32(li), q, kc, vc, kn, vn, mask
            ),
            np.float32,
        )
        scale = np.max(np.abs(ref)) + 1e-9
        assert np.max(np.abs(ref - got)) / scale < 2e-2, li
