"""Weight-only int8 quantization (utils/quantize.py)."""
import pytest

import numpy as np

import jax
import jax.numpy as jnp

from dropoutdecoding_tpu.models import llama
from dropoutdecoding_tpu.utils.config import LlamaConfig
from dropoutdecoding_tpu.utils.quantize import (
    dequantize_matrix,
    quantize_llama_params,
    quantize_matrix,
)

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def test_quantize_roundtrip_error_bounded(rng):
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32) * 0.05)
    wq = quantize_matrix(w)
    assert wq["q"].dtype == jnp.int8
    back = dequantize_matrix(wq)
    # per-channel symmetric int8: error <= s/2 = amax/254 per element
    amax = np.abs(np.asarray(w)).max(axis=0, keepdims=True)
    assert np.all(np.abs(np.asarray(back) - np.asarray(w)) <= amax / 254 + 1e-8)


def test_quantized_tower_close_to_dense(rng):
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=8,
    )
    params = llama.init_params(cfg, jax.random.key(0), jnp.float32)
    qparams = quantize_llama_params(params)

    ids = jnp.asarray(rng.integers(0, 128, size=(1, 9)))
    x = llama.embed(params, ids)
    pos = jnp.arange(9)[None]
    hidden, _ = llama.prefill(params, cfg, x, pos)
    qhidden, _ = llama.prefill(qparams, cfg, x, pos)

    logits = np.asarray(llama.lm_head(params, hidden[:, -1]))
    qlogits = np.asarray(llama.lm_head(qparams, qhidden[:, -1]))
    # int8 weight-only: small relative error, same top prediction here
    rel = np.abs(logits - qlogits) / (np.abs(logits).max() + 1e-6)
    assert rel.max() < 0.05, rel.max()


def test_int8_kv_attention_close_to_dense(rng):
    """ensemble_decode_attention over an int8 cache tracks the bf16/fp32
    path closely (experimental op; engine integration round 2)."""
    from dropoutdecoding_tpu.ops.attention import (
        ensemble_decode_attention,
        ensemble_decode_attention_int8kv,
    )
    from dropoutdecoding_tpu.utils.quantize import quantize_kv

    B, M, H, KH, D, S = 1, 3, 8, 4, 16, 40
    q = jnp.asarray(rng.normal(size=(B, M, H, D)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(B, S, KH, D)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(B, S, KH, D)).astype(np.float32))
    kn = jnp.asarray(rng.normal(size=(B, M, KH, D)).astype(np.float32))
    vn = jnp.asarray(rng.normal(size=(B, M, KH, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, M, S)) > 0.2)

    ref = ensemble_decode_attention(q, kc, vc, kn, vn, mask)
    kq = quantize_kv(kc)
    vq = quantize_kv(vc)
    # scales go to the op in the cache's stored [B, KH, S] layout
    ks = kq["s"][..., 0].transpose(0, 2, 1)
    vs = vq["s"][..., 0].transpose(0, 2, 1)
    got = ensemble_decode_attention_int8kv(
        q, kq["q"], ks, vq["q"], vs, kn, vn, mask
    )
    err = np.abs(np.asarray(ref) - np.asarray(got))
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.01, err.mean()


def test_quantized_decode_runs(rng):
    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=8,
    )
    params = quantize_llama_params(llama.init_params(cfg, jax.random.key(1), jnp.float32))
    ids = jnp.asarray(rng.integers(0, 64, size=(1, 5)))
    x = llama.embed(params, ids)
    hidden, kv = llama.prefill(params, cfg, x, jnp.arange(5)[None])
    cache = llama.KVCache.empty(cfg, 1, 16, jnp.float32)
    cache = llama.KVCache(cache.k.at[:, :, :5].set(kv.k), cache.v.at[:, :, :5].set(kv.v))
    tok = jnp.argmax(llama.lm_head(params, hidden[:, -1]), -1)
    mask = jnp.broadcast_to(jnp.arange(16)[None, None, :] < 5, (1, 1, 16))
    h, k1, v1 = llama.decode_step(
        params, cfg, llama.embed(params, tok)[:, None], jnp.full((1,), 5), cache, mask
    )
    assert h.shape == (1, 1, 32)


def test_int8_kv_engine_end_to_end(rng):
    """LlavaEngine(int8_kv=True): quantized-cache generate runs end to end
    and its first ensemble step tracks the dense-cache step (the engine
    quantizes the prefill KV on seed and the winner KV on scatter —
    models/llama.cache_seed / cache_set_rows)."""
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.models.llama import cache_is_quantized
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlavaConfig,
    )

    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=128,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=8,
            num_key_value_heads=4,
            head_dim=8,
        ),
        vision=ClipVisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=28,
            patch_size=14,
        ),
        image_token_index=126,
        pad_token_id=127,
    )
    params = llava_mod.init_params(cfg, jax.random.key(2), jnp.float32)

    def eng(**kw):
        e = LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(max_new_tokens=6, eos_token_id=2, pad_token_id=2),
            max_len=32,
            ensemble=True,
            **kw,
        )
        e.param_dtype = jnp.float32
        return e

    ids = np.array([[1, 7, cfg.image_token_index, 11, 13]], np.int32)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    dense = eng()
    quant = eng(int8_kv=True)
    sd = dense.prefill(ids, px)
    sq = quant.prefill(ids, px)
    assert not cache_is_quantized(sd.cache)
    assert cache_is_quantized(sq.cache)
    assert sq.cache.k["q"].dtype == jnp.int8
    # prefill math identical (cache layout only affects decode reads)
    np.testing.assert_allclose(
        np.asarray(sq.last_logits), np.asarray(sd.last_logits), rtol=1e-6
    )

    # one ensemble step: int8 cache read tracks dense closely at this scale
    from dropoutdecoding_tpu.engine.generate import TextMaskState

    def one_step(engine, state):
        B, T = 1, 6
        tm = TextMaskState(
            jnp.zeros((B, T), jnp.float32),
            jnp.zeros((B, T), jnp.float32),
            jnp.zeros((B, T), jnp.float32),
        )
        carry = (
            state.cache,
            state.cur_len,
            state.first_token,
            jnp.ones((B,), jnp.int32),
            jnp.full((B, T), 2, jnp.int32),
            jnp.zeros((B,), bool),
            tm,
            state.first_token.astype(jnp.int32),
            jnp.zeros((B, 1), jnp.float32),  # lagged-KL stub
        )
        return engine._one_step(engine.params, state, carry)

    od = one_step(dense, sd)
    oq = one_step(quant, sq)
    assert int(od[2][0]) == int(oq[2][0])  # same winner token

    # full generate runs under jit with the quantized cache
    out = quant.generate(ids, px)
    assert out.tokens.shape == (1, 6)


def test_int4_pack_roundtrip_exact(rng):
    """Packing is lossless: unpack(pack(q)) == q for every nibble value,
    and dequantization error is bounded by s/2 per element."""
    from dropoutdecoding_tpu.utils.quantize import (
        dequantize_matrix_int4,
        quantize_matrix_int4,
        unpack_int4,
    )

    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32) * 0.05)
    wq = quantize_matrix_int4(w, group_size=16)
    assert wq["q4"].dtype == jnp.int8
    assert wq["q4"].shape == (32, 48)
    assert wq["s4"].shape == (4, 48)
    lo, hi = unpack_int4(wq["q4"])
    assert int(jnp.max(lo)) <= 7 and int(jnp.min(lo)) >= -8
    assert int(jnp.max(hi)) <= 7 and int(jnp.min(hi)) >= -8

    back = np.asarray(dequantize_matrix_int4(wq))
    w_np = np.asarray(w).reshape(4, 16, 48)
    amax = np.abs(w_np).max(axis=1, keepdims=True)
    err = np.abs(back.reshape(4, 16, 48) - w_np)
    # clip-searched RTN: unclipped elements err <= s/2 <= amax/14;
    # clipped outliers err <= (1 - min_clip) * amax + s/2
    from dropoutdecoding_tpu.utils.quantize import INT4_CLIP_GRID

    cmin = min(INT4_CLIP_GRID)
    assert np.all(err <= (1 - cmin) * amax + amax / 14 + 1e-8)
    # and the clip search never does worse than plain RTN (clip=1.0),
    # per (group, out-channel) MSE
    plain = np.asarray(
        dequantize_matrix_int4(quantize_matrix_int4(w, 16, clip_grid=(1.0,)))
    )
    mse = ((back.reshape(4, 16, 48) - w_np) ** 2).sum(axis=1)
    mse_plain = ((plain.reshape(4, 16, 48) - w_np) ** 2).sum(axis=1)
    assert np.all(mse <= mse_plain + 1e-10)
    assert mse.sum() < mse_plain.sum()  # strictly better somewhere


def test_int4_mm_matches_dequantized_dense(rng):
    """_mm on a {"q4","s4"} weight == the dense matmul against its own
    dequantization (the split-contraction unpack math is exact)."""
    from dropoutdecoding_tpu.models.llama import _mm
    from dropoutdecoding_tpu.utils.quantize import (
        dequantize_matrix_int4,
        quantize_matrix_int4,
    )

    x = jnp.asarray(rng.normal(size=(3, 5, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 80)).astype(np.float32) * 0.05)
    wq = quantize_matrix_int4(w, group_size=16)
    ref = np.asarray(_mm(x, dequantize_matrix_int4(wq)))
    got = np.asarray(_mm(x, wq))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_int4_tower_close_to_dense(rng):
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=8,
    )
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params_int4

    params = llama.init_params(cfg, jax.random.key(0), jnp.float32)
    qparams = quantize_llama_params_int4(params, group_size=16)

    ids = jnp.asarray(rng.integers(0, 128, size=(1, 9)))
    x = llama.embed(params, ids)
    pos = jnp.arange(9)[None]
    hidden, _ = llama.prefill(params, cfg, x, pos)
    qhidden, _ = llama.prefill(qparams, cfg, x, pos)

    logits = np.asarray(llama.lm_head(params, hidden[:, -1]))
    qlogits = np.asarray(llama.lm_head(qparams, qhidden[:, -1]))
    # group-wise int4 on RANDOM weights (incompressible — the worst case;
    # trained weights quantize far better): bounded drift, logits still
    # essentially the same function
    rel = np.abs(logits - qlogits) / (np.abs(logits).max() + 1e-6)
    assert rel.max() < 0.3, rel.max()
    assert rel.mean() < 0.05, rel.mean()
    corr = np.corrcoef(logits.ravel(), qlogits.ravel())[0, 1]
    assert corr > 0.98, corr


def test_int4_decode_runs(rng):
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params_int4

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=8,
    )
    params = quantize_llama_params_int4(
        llama.init_params(cfg, jax.random.key(1), jnp.float32), group_size=16
    )
    ids = jnp.asarray(rng.integers(0, 64, size=(1, 5)))
    x = llama.embed(params, ids)
    hidden, kv = llama.prefill(params, cfg, x, jnp.arange(5)[None])
    cache = llama.KVCache.empty(cfg, 1, 16, jnp.float32)
    cache = llama.KVCache(cache.k.at[:, :, :5].set(kv.k), cache.v.at[:, :, :5].set(kv.v))
    tok = jnp.argmax(llama.lm_head(params, hidden[:, -1]), -1)
    mask = jnp.broadcast_to(jnp.arange(16)[None, None, :] < 5, (1, 1, 16))
    h, k1, v1 = llama.decode_step(
        params, cfg, llama.embed(params, tok)[:, None], jnp.full((1,), 5), cache, mask
    )
    assert h.shape == (1, 1, 32)


def test_w8a8_matmul_close_to_dense():
    """_mm_w8a8 (int8 MXU path) vs the dequantized-weight bf16 path: the
    extra error from activation rows being quantized to int8 is bounded
    (per-row symmetric scales; both weight paths share the same int8
    weights so this isolates the a8 half)."""
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.models.llama import _mm, _mm_w8a8
    from dropoutdecoding_tpu.utils.quantize import quantize_matrix

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 96, 256)) * 0.5, jnp.bfloat16)
    w = rng.normal(size=(256, 192)).astype(np.float32) * 0.02
    wq = quantize_matrix(jnp.asarray(w))

    ref = np.asarray(_mm(x, wq), np.float32)  # int8 weights, bf16 acts
    got = np.asarray(_mm_w8a8(x, wq), np.float32)  # int8 weights + acts
    denom = np.abs(ref).max() + 1e-9
    assert np.max(np.abs(ref - got)) / denom < 0.03
    # dense weights fall through to the bf16 path unchanged
    dense = jnp.asarray(w, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(_mm_w8a8(x, dense), np.float32),
        np.asarray(_mm(x, dense), np.float32),
    )


def test_w8a8_decode_step_close_to_bf16_feed():
    """decode_step(w8a8=True) — the int8-MXU decode-projection feed for
    the compute-bound large-batch configs — stays close to the bf16-feed
    path on the same int8 weights, and is plumbed through the engine flag
    (LlavaEngine.w8a8_decode)."""
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=16,
    )
    rng = np.random.default_rng(11)
    params = quantize_llama_params(
        llama.init_params(cfg, jax.random.key(4), jnp.float32)
    )
    B, M, Smax = 2, 3, 16
    x = jnp.asarray(rng.normal(size=(B, M, 64)) * 0.3, jnp.float32)
    cache = llama.empty_cache(cfg, B, Smax, jnp.float32)
    mask = jnp.broadcast_to(
        jnp.arange(Smax)[None, None, :] < 5, (B, M, Smax)
    )
    pos = jnp.full((B,), 5)
    h_ref, k_ref, v_ref = llama.decode_step(params, cfg, x, pos, cache, mask)
    h_q, k_q, v_q = llama.decode_step(
        params, cfg, x, pos, cache, mask, w8a8=True
    )
    assert h_q.shape == h_ref.shape and k_q.shape == k_ref.shape
    denom = float(np.abs(np.asarray(h_ref, np.float32)).max()) + 1e-9
    rel = float(np.abs(np.asarray(h_q - h_ref, np.float32)).max()) / denom
    assert rel < 0.2, rel  # per-step drift bounded (2-layer accumulation)
    assert not np.allclose(
        np.asarray(h_q, np.float32), np.asarray(h_ref, np.float32)
    )  # the int8 feed actually ran


def test_int4_group_autofit(rng):
    """quantize_llama_params_int4 fits the group per matrix: a tiny tower
    whose in-dims don't divide 2*128 quantizes at a finer group instead
    of raising (the --quantize int4 CLI path on non-production shapes)."""
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params_int4

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=48,
        intermediate_size=80,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        head_dim=8,
    )
    params = llama.init_params(cfg, jax.random.key(0), jnp.float32)
    q = quantize_llama_params_int4(params)
    # hidden 48 = 2*24 -> largest power-of-2 group g with 48 % (2g) == 0 is 8
    assert q["layers"]["q_proj"]["q4"].shape[-2] == 24
    assert q["layers"]["q_proj"]["s4"].shape[-2] == 48 // 8
    # intermediate 80 -> g=8 (80 % 16 == 0)
    assert q["layers"]["down_proj"]["s4"].shape[-2] == 80 // 8
    ids = jnp.asarray(rng.integers(0, 64, size=(1, 5)))
    x = llama.embed(q, ids)
    hidden, _ = llama.prefill(q, cfg, x, jnp.arange(5)[None])
    assert hidden.shape == (1, 5, 48)


def test_extend_attention_int8prefix_matches_dequantized():
    """extend_attention over an int8 prefix == extend_attention over the
    dequantized prefix (scale folding is exact in fp32), incl. Bp=1
    broadcast and a prefix validity mask."""
    from dropoutdecoding_tpu.ops.attention import (
        extend_attention,
        extend_attention_int8prefix,
    )
    from dropoutdecoding_tpu.utils.quantize import quantize_kv

    rng = np.random.default_rng(5)
    B, T, H, KH, D, P = 2, 3, 4, 2, 8, 10
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, T, KH, D)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(B, T, KH, D)), jnp.float32)
    for Bp in (1, B):
        kp = jnp.asarray(rng.normal(size=(Bp, P, KH, D)), jnp.float32)
        vp = jnp.asarray(rng.normal(size=(Bp, P, KH, D)), jnp.float32)
        mask = jnp.asarray(rng.random((Bp, P)) > 0.2)
        kq, vq = quantize_kv(kp), quantize_kv(vp)
        # scales stored [Bp, KH, P] (cache layout)
        ks = jnp.swapaxes(kq["s"][..., 0], 1, 2)
        vs = jnp.swapaxes(vq["s"][..., 0], 1, 2)
        deq_k = kq["q"].astype(jnp.float32) * kq["s"]
        deq_v = vq["q"].astype(jnp.float32) * vq["s"]
        ref = extend_attention(q, kn, vn, deq_k, deq_v, mask)
        got = extend_attention_int8prefix(
            q, kn, vn, kq["q"], ks, vq["q"], vs, mask
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_int4_layered_scan_matches_sliced(rng, monkeypatch):
    """The layered-int4 restructure (models/llama._split_int4_stacks:
    packed stacks pulled OUT of the scan, resolved per layer via
    _LayeredInt4 sentinels) is bit-identical to the scan-sliced dispatch
    across every entry point that carries it — decode_step, prefill,
    prefill_extend, decode_step_attn.  On the 8-device CPU test mesh the
    restructure only traces under FORCE_LAYERED_INT4 (it is gated to
    single-device execution like the layered attention kernels), and
    both forks resolve to the same portable half-split einsum, so
    equality is exact, not approximate."""
    from dropoutdecoding_tpu.utils.quantize import quantize_llama_params_int4

    cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
    )
    params = llama.init_params(cfg, jax.random.key(1), jnp.bfloat16)
    q4 = quantize_llama_params_int4(params, lm_head="int4")

    S = 16
    x = jnp.asarray(rng.normal(size=(2, 3, cfg.hidden_size)), jnp.bfloat16)
    pos = jnp.zeros((2,), jnp.int32)
    cache = llama.KVCache.empty(cfg, 2, S, jnp.bfloat16)
    mask = jnp.ones((2, 3, S), bool)
    pe = jnp.asarray(rng.normal(size=(2, 5, cfg.hidden_size)), jnp.bfloat16)
    pp = jnp.tile(jnp.arange(5)[None], (2, 1))

    outs = {}
    for force in (False, True):
        monkeypatch.setattr(llama, "FORCE_LAYERED_INT4", force)
        h, _, _ = llama.decode_step(q4, cfg, x, pos, cache, mask)
        hp, kv = llama.prefill(q4, cfg, pe, pp)
        he, _ = llama.prefill_extend(q4, cfg, pe, pp + 5, kv)
        ha, _, _, attn = llama.decode_step_attn(
            q4, cfg, x[:, 0], pos, cache, jnp.ones((2, S), bool)
        )
        outs[force] = [np.asarray(a) for a in (h, hp, he, ha, attn)]
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(a, b)
