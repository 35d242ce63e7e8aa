"""Compiled int4-kernel equivalences on a real TPU.

Split out of test_kernels_compiled.py (round 4): the layered-int4 tests
pushed that file's cold-compile wall time past the 590 s tunnel window,
and TESTS_TPU.md's contract is that every single pytest invocation fits
one window.  Same skip guard, same fixture.

    python -m pytest tests_tpu/test_kernels_int4_compiled.py -x -q
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


def test_int4_unpack_modes_compiled_bit_identical(rng):
    """The HARDWARE-compilable decode variants over all 256 byte
    patterns: i32 (shift/mask reference) and mxu3 (the production
    default — MXU-offloaded, close but not bit-identical: different f32
    summation order).  i16 and bf16 are interpret-mode-only on the
    current toolchain — Mosaic fails to legalize `arith.shrsi` at i16
    and crashes on the bf16 floor path (measured 2026-08-21,
    cli/int4_probe.py + this suite); they stay pinned bit-identical in
    the CPU interpret suite (tests/test_pallas_kernels.py)."""
    from dropoutdecoding_tpu.ops.pallas_int4_matmul import int4_matmul

    D, E = 512, 256
    all_bytes = np.arange(-128, 128, dtype=np.int8)
    q4 = jnp.asarray(
        np.tile(all_bytes, (D // 2) * E // 256).reshape(D // 2, E)
    )
    s4 = jnp.asarray(rng.random((4, E)).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.normal(size=(2, D)), jnp.bfloat16)
    outs = {
        m: np.asarray(
            int4_matmul(x, q4, s4, out_dtype=jnp.float32, unpack=m)
        )
        for m in ("i32", "mxu3")
    }
    np.testing.assert_allclose(outs["mxu3"], outs["i32"], rtol=5e-3,
                               atol=5e-3)


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
