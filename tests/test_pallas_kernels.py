"""Pallas kernels vs their jnp references (interpret mode — runs on the
CPU test mesh; compiled-mode equivalence is exercised on TPU by bench.py
and was verified bit-exact for the attention kernel)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    yield


def test_fused_uncertainty_matches_reference(rng):
    from dropoutdecoding_tpu.ops.pallas_uncertainty import vision_uncertainty_fused
    from dropoutdecoding_tpu.ops.uncertainty import vision_uncertainty

    logits = jnp.asarray((rng.normal(size=(2, 12, 2500)) * 3).astype(np.float32))
    ref = vision_uncertainty(logits)
    got = vision_uncertainty_fused(logits, interpret=True)
    for k in ref:
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-5, err_msg=k)


def test_flash_attention_matches_dense(rng):
    from dropoutdecoding_tpu.ops.attention import prefill_attention
    from dropoutdecoding_tpu.ops.pallas_attention import flash_prefill_attention

    B, S, H, KH, D = 1, 200, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, KH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, KH, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, S)) > 0.1)
    ref = prefill_attention(q, k, v, causal=True, key_mask=mask)
    got = flash_prefill_attention(q, k, v, mask, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_chunked_attention_matches_dense(rng):
    from dropoutdecoding_tpu.ops.attention import (
        chunked_prefill_attention,
        prefill_attention,
    )

    B, S, H, KH, D = 1, 300, 4, 2, 32
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, KH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, KH, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, S)) > 0.1)
    ref = prefill_attention(q, k, v, causal=True, key_mask=mask)
    got = chunked_prefill_attention(q, k, v, mask, causal=True, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
    got2 = chunked_prefill_attention(q, k, v, None, causal=True, chunk=64)
    ref2 = prefill_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=2e-5, atol=2e-5)


def test_flash_attention_no_mask(rng):
    from dropoutdecoding_tpu.ops.attention import prefill_attention
    from dropoutdecoding_tpu.ops.pallas_attention import flash_prefill_attention

    B, S, H, D = 1, 130, 2, 32
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    ref = prefill_attention(q, k, v, causal=True)
    got = flash_prefill_attention(q, k, v, None, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("KH", [2, 8])  # G = 8//KH or 32//KH > 1 and == 1
def test_fused_int8_decode_attention_matches_xla(rng, KH):
    from dropoutdecoding_tpu.ops.attention import ensemble_decode_attention_int8kv
    from dropoutdecoding_tpu.ops.pallas_decode_attention import (
        ensemble_decode_attention_int8kv_fused,
    )

    B, M, H, D, S = 2, 3, 8, 128, 70  # S deliberately not a 32-multiple
    q = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 128, (B, S, KH, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (B, S, KH, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.03, (B, KH, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.03, (B, KH, S)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, M, S)) < 0.7)
    mask = mask.at[:, :, 0].set(True)

    ref = np.asarray(
        ensemble_decode_attention_int8kv(q, kq, ks, vq, vs, kn, vn, mask),
        np.float32,
    )
    got = np.asarray(
        ensemble_decode_attention_int8kv_fused(q, kq, ks, vq, vs, kn, vn, mask),
        np.float32,
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(ref - got)) / scale < 2e-2  # bf16 accumulation-order


@pytest.mark.parametrize("KH", [2, 8])
def test_fused_bf16_decode_attention_matches_xla(rng, KH):
    from dropoutdecoding_tpu.ops.attention import ensemble_decode_attention
    from dropoutdecoding_tpu.ops.pallas_decode_attention import (
        ensemble_decode_attention_fused,
    )

    B, M, H, D, S = 2, 3, 8, 128, 70
    q = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(size=(B, S, KH, D)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(B, S, KH, D)), jnp.bfloat16)
    kn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, M, S)) < 0.7)
    mask = mask.at[:, :, 0].set(True)

    ref = np.asarray(ensemble_decode_attention(q, kc, vc, kn, vn, mask), np.float32)
    got = np.asarray(
        ensemble_decode_attention_fused(q, kc, vc, kn, vn, mask), np.float32
    )
    scale = np.max(np.abs(ref)) + 1e-9
    assert np.max(np.abs(ref - got)) / scale < 2e-2


@pytest.mark.parametrize("R,D,E,G", [(4, 512, 384, 128), (3, 256, 130, 64)])
def test_int4_matmul_kernel_matches_dequant(rng, R, D, E, G):
    """ops/pallas_int4_matmul in interpret mode vs the bf16 dense product
    against its own dequantization — the kernel's unpack/scale/two-half
    contraction math, including a non-128-divisible E edge."""
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


def test_int4_unpack_modes_bit_identical(rng):
    """The three nibble-PLANE decode variants (i32 shift/mask, i16
    shift/mask, bf16 floor arithmetic) are BIT-identical on every byte
    value.  NOTE: the shipped production default is the fourth variant,
    mxu3, which is close-but-not-bit-identical (different f32 summation
    order — see test_int4_unpack_mxu3_close); bit-parity across modes
    holds only within this plane family.  Exercises all 256 byte
    patterns."""
    from dropoutdecoding_tpu.ops.pallas_int4_matmul import int4_matmul

    D, E = 256, 128
    all_bytes = np.arange(-128, 128, dtype=np.int8)
    q4 = jnp.asarray(
        np.tile(all_bytes, (D // 2) * E // 256).reshape(D // 2, E)
    )
    s4 = jnp.asarray(rng.random((2, E)).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.normal(size=(2, D)), jnp.bfloat16)
    outs = {
        m: np.asarray(
            int4_matmul(x, q4, s4, out_dtype=jnp.float32, unpack=m)
        )
        for m in ("i32", "i16", "bf16")
    }
    np.testing.assert_array_equal(outs["i32"], outs["i16"])
    np.testing.assert_array_equal(outs["i32"], outs["bf16"])


def test_int4_unpack_mxu3_close(rng):
    """The MXU-offloaded decode (three dots on byte/masked planes plus a
    per-group row-sum correction — see _kernel) is NOT bit-identical
    (different f32 summation order) but must agree to well under the
    int4 quantization error on every byte value."""
    from dropoutdecoding_tpu.ops.pallas_int4_matmul import int4_matmul

    D, E = 256, 128
    all_bytes = np.arange(-128, 128, dtype=np.int8)
    q4 = jnp.asarray(
        np.tile(all_bytes, (D // 2) * E // 256).reshape(D // 2, E)
    )
    s4 = jnp.asarray(rng.random((2, E)).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.normal(size=(2, D)), jnp.bfloat16)
    ref = np.asarray(int4_matmul(x, q4, s4, out_dtype=jnp.float32, unpack="i32"))
    got = np.asarray(
        int4_matmul(x, q4, s4, out_dtype=jnp.float32, unpack="mxu3")
    )
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("KH", [2, 8])  # G = 8//KH > 1 and == 1 (MHA)
def test_layered_int8_decode_attention_matches_xla(rng, KH):
    """The layered kernels (full [L,...] cache in HBM, scalar-prefetch
    layer indexing, head loop) vs the XLA op on each layer's slice."""
    from dropoutdecoding_tpu.ops.attention import ensemble_decode_attention_int8kv
    from dropoutdecoding_tpu.ops.pallas_decode_attention import (
        ensemble_decode_attention_int8kv_layered,
    )

    L, B, M, H, D, S = 3, 2, 3, 8, 128, 96  # S%32==0, D%128==0 (gate)
    q = jnp.asarray(rng.normal(size=(B, M, H, D)), jnp.bfloat16)
    kq = jnp.asarray(rng.integers(-127, 128, (L, B, S, KH, D)), jnp.int8)
    vq = jnp.asarray(rng.integers(-127, 128, (L, B, S, KH, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.03, (L, B, KH, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.03, (L, B, KH, S)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    vn = jnp.asarray(rng.normal(size=(B, M, KH, D)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, M, S)) < 0.7).at[:, :, 0].set(True)

    for li in range(L):
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
                # the cache stores "q" head-flattened (models/llama.KVCache)
                kq.reshape(*kq.shape[:3], -1),
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


@pytest.mark.parametrize("KH", [2, 8])
def test_layered_bf16_decode_attention_matches_xla(rng, KH):
    from dropoutdecoding_tpu.ops.attention import ensemble_decode_attention
    from dropoutdecoding_tpu.ops.pallas_decode_attention import (
        ensemble_decode_attention_layered,
    )

    L, B, M, H, D, S = 2, 2, 3, 8, 128, 64
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


def test_fused_uncertainty_valid_mask_matches_reference(rng):
    from dropoutdecoding_tpu.ops.pallas_uncertainty import vision_uncertainty_fused
    from dropoutdecoding_tpu.ops.uncertainty import vision_uncertainty

    logits = jnp.asarray((rng.normal(size=(2, 12, 2500)) * 3).astype(np.float32))
    valid = np.zeros((2, 12), bool)
    valid[0, :7] = True
    valid[1, :10] = True
    ref = vision_uncertainty(logits, valid=jnp.asarray(valid))
    got = vision_uncertainty_fused(logits, valid=jnp.asarray(valid), interpret=True)
    for k in ref:
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        if k.endswith("_per_token"):
            r, g = r[valid], g[valid]  # junk rows are junk in both
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-5, err_msg=k)
