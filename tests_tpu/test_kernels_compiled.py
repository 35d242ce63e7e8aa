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
    "R,D,E,G",
    [(4, 512, 384, 128), (3, 4096, 1000, 128), (12, 256, 128, 64)],
)
def test_int4_matmul_compiled(rng, R, D, E, G):
    """Pallas int4 matmul (ops/pallas_int4_matmul.py) vs the bf16 dense
    product against its own dequantization — compiled on hardware,
    including a non-128-divisible E edge (block padding)."""
    from dropoutdecoding_tpu.ops.pallas_int4_matmul import int4_matmul
    from dropoutdecoding_tpu.utils.quantize import (
        dequantize_matrix_int4,
        quantize_matrix_int4,
    )

    x = jnp.asarray(rng.normal(size=(R, D)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(D, E)).astype(np.float32) * 0.05)
    wq = quantize_matrix_int4(w, group_size=G)
    ref = np.asarray(
        (x @ dequantize_matrix_int4(wq, jnp.bfloat16)).astype(jnp.float32)
    )
    got = np.asarray(int4_matmul(x, wq["q4"], wq["s4"], out_dtype=jnp.float32))
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(ref - got)) / scale < 1e-2


def test_int4_decode_tower_compiled(rng):
    """Full decode_step through an int4-quantized 2-layer tower on TPU:
    the {"q4","s4"} dispatch (models/llama._mm_int4 -> Pallas) agrees with
    the same tower dequantized to bf16 dense."""
    from dropoutdecoding_tpu.models import llama
    from dropoutdecoding_tpu.utils.config import LlamaConfig
    from dropoutdecoding_tpu.utils.quantize import (
        dequantize_matrix_int4,
        quantize_llama_params_int4,
    )

    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=128,
    )
    params = llama.init_params(cfg, jax.random.key(2), jnp.bfloat16)
    q4 = quantize_llama_params_int4(params, lm_head="int4")

    def dense_of(p):
        return jax.tree.map(
            lambda l: l,
            {
                k: (
                    {
                        n: (
                            dequantize_matrix_int4(w, jnp.bfloat16)
                            if isinstance(w, dict)
                            else w
                        )
                        for n, w in v.items()
                    }
                    if k == "layers"
                    else (
                        dequantize_matrix_int4(v, jnp.bfloat16)
                        if isinstance(v, dict)
                        else v
                    )
                )
                for k, v in p.items()
            },
        )

    dense = dense_of(q4)
    S = 128
    cache = llama.KVCache.empty(cfg, 1, S, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(1, 1, cfg.hidden_size)), jnp.bfloat16)
    pos = jnp.zeros((1,), jnp.int32)
    mask = jnp.ones((1, 1, S), bool)
    h4, _, _ = jax.jit(llama.decode_step, static_argnums=1)(
        q4, cfg, x, pos, cache, mask
    )
    hd, _, _ = jax.jit(llama.decode_step, static_argnums=1)(
        dense, cfg, x, pos, cache, mask
    )
    l4 = np.asarray(llama.lm_head(q4, h4[:, 0]), np.float32)
    ld = np.asarray(llama.lm_head(dense, hd[:, 0]), np.float32)
    scale = np.max(np.abs(ld)) + 1e-9
    assert np.max(np.abs(l4 - ld)) / scale < 2e-2


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


def test_int4_matmul_layered_compiled(rng):
    """int4_matmul_layered(li, x, q4L, s4L) == int4_matmul(x, q4L[li],
    s4L[li]) bit-for-bit on hardware for every layer index — the
    scalar-prefetch block indexing reads exactly layer li's blocks (and
    nothing of the other layers' bytes leaks into the dots)."""
    from dropoutdecoding_tpu.ops.pallas_int4_matmul import (
        int4_matmul,
        int4_matmul_layered,
    )

    L, R, D, E = 3, 4, 512, 640  # E not 256-divisible: block-padding edge
    q4L = jnp.asarray(
        rng.integers(-128, 128, (L, D // 2, E)).astype(np.int8)
    )
    s4L = jnp.asarray(
        rng.uniform(0.001, 0.01, (L, D // 128, E)).astype(np.float32)
    )
    x = jnp.asarray(rng.normal(size=(R, D)), jnp.bfloat16)
    for li in range(L):
        ref = np.asarray(int4_matmul(x, q4L[li], s4L[li]))
        got = np.asarray(int4_matmul_layered(jnp.int32(li), x, q4L, s4L))
        np.testing.assert_array_equal(ref, got)


def test_int4_decode_layered_matches_xla_structure_compiled(rng):
    """decode_step over an int4 tower on the single TPU chip (which takes
    the layered Pallas projection path) stays within kernel tolerance of
    the same tower dequantized to bf16 dense — the e2e guard that the
    sentinel resolution maps each projection to ITS stack."""
    from dropoutdecoding_tpu.models import llama
    from dropoutdecoding_tpu.utils.config import LlamaConfig
    from dropoutdecoding_tpu.utils.quantize import (
        dequantize_matrix_int4,
        quantize_llama_params_int4,
    )

    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=128,
    )
    params = llama.init_params(cfg, jax.random.key(3), jnp.bfloat16)
    q4 = quantize_llama_params_int4(params, lm_head="int4")
    dense_layers = {
        n: (dequantize_matrix_int4(w, jnp.bfloat16) if isinstance(w, dict) else w)
        for n, w in q4["layers"].items()
    }
    dense = dict(q4, layers=dense_layers, lm_head=dequantize_matrix_int4(
        q4["lm_head"], jnp.bfloat16))
    S = 64
    cache = llama.KVCache.empty(cfg, 2, S, jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 2, cfg.hidden_size)), jnp.bfloat16)
    pos = jnp.zeros((2,), jnp.int32)
    mask = jnp.ones((2, 2, S), bool)
    h4, _, _ = jax.jit(llama.decode_step, static_argnums=1)(
        q4, cfg, x, pos, cache, mask
    )
    hd, _, _ = jax.jit(llama.decode_step, static_argnums=1)(
        dense, cfg, x, pos, cache, mask
    )
    scale = np.max(np.abs(np.asarray(hd, np.float32))) + 1e-9
    assert np.max(np.abs(np.asarray(h4, np.float32)
                         - np.asarray(hd, np.float32))) / scale < 5e-2
