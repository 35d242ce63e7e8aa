"""Fused Pallas ensemble-decode attention over the int8 KV cache — the
GQA decode path (Mistral-7B / LLaVA-NeXT).

The XLA int8 path (``ops.attention.ensemble_decode_attention_int8kv``)
expands grouped KV heads with ``repeat_kv`` before the dots; under GQA
(H/KH = 4 for Mistral) that materializes a 4x bf16 copy of the int8 cache
in HBM every layer of every decode step.  This kernel computes the whole
member-batched attention — score-vs-shared-cache, per-key k-scale fold,
member mask, the always-attended self token, softmax, v-scale fold, PV —
in one pass: the int8 cache is streamed from HBM exactly once per
(batch row, layer), heads read the group's panel in place, and scores
live only in VMEM.

Measured on 1x v5e (scan-chained, dispatch overhead subtracted), vs the
XLA int8 op:

  B=8,  M=9, H=32, KH=8, S=3328 (LLaVA-NeXT serving):  117 us vs 1325 us
                                                       -> 11.3x faster
  B=16, M=9, H=32, KH=32, S=640 (LLaVA-1.5 stretch):   271 us vs 208 us
                                                       -> 0.77x (slower)

At KH == H there is nothing to expand and XLA's lane-packed batched GEMV
(convolution emitter) beats per-head MXU dots at M~9 rows, so
models/llama.decode_step dispatches here only when H // KH > 1.
Semantics identical to the XLA op (tested in interpret mode in
tests/test_pallas_kernels.py and compiled on TPU against the same op).

Grid: (B, KH).  The k/v/q/mask blocks are indexed by b only, so Mosaic
fetches them once per batch row and reuses them across the KH inner grid
steps; per cell the kernel slices head g's [S, D] int8 panel out of the
resident [S, KH*D] block (minor-dim slices at 128-element alignment).

The reference has no analogue: it re-runs dense HF attention K+1 times
per token on deepcopied caches (reference llava.py:292-376).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(
    q_ref,  # [1, M, H*D]   activation dtype (bf16)
    k_ref,  # [1, Sp, KH*D] int8
    ks_ref,  # [1, KH, Sp]  f32 per-(token, head) key scales (transposed so
    #   the per-head slice is a row — width-1 minor-dim loads don't lower)
    v_ref,  # [1, Sp, KH*D] int8
    vs_ref,  # [1, KH, Sp]  f32 value scales
    kn_ref,  # [1, M, KH*D] new-token keys (unquantized)
    vn_ref,  # [1, M, KH*D] new-token values
    mask_ref,  # [1, M, Sp]  int32, 1 = attend
    o_ref,  # [1, 1, M, G*D]
    *,
    G: int,
    D: int,
    scale: float,
):
    g = pl.program_id(1)
    M = q_ref.shape[1]

    qg = q_ref[0, :, pl.ds(g * G * D, G * D)]  # [M, G*D]
    qg = qg.reshape(M * G, D)
    kg = k_ref[0, :, pl.ds(g * D, D)].astype(jnp.bfloat16)  # [Sp, D]
    ksg = ks_ref[0, pl.ds(g, 1), :]  # [1, Sp]

    scores = (
        jax.lax.dot_general(
            qg, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [MG, Sp]
    # fold key scales (per key position), THEN mask — padded rows carry
    # arbitrary scales but their mask is 0
    scores = scores * ksg
    mk = mask_ref[0]  # [M, Sp]
    if G > 1:
        mk = jnp.repeat(mk, G, axis=0)
    scores = jnp.where(mk > 0, scores, _NEG)

    kn = kn_ref[0, :, pl.ds(g * D, D)]  # [M, D]
    vn = vn_ref[0, :, pl.ds(g * D, D)].astype(jnp.float32)
    if G > 1:
        kn = jnp.repeat(kn, G, axis=0)
        vn = jnp.repeat(vn, G, axis=0)
    self_sc = (
        jnp.sum(qg.astype(jnp.float32) * kn.astype(jnp.float32), -1, keepdims=True)
        * scale
    )  # [MG, 1] — the member's own token, always attended

    mx = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), self_sc)
    p = jnp.exp(scores - mx)
    p_self = jnp.exp(self_sc - mx)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_self

    vg = v_ref[0, :, pl.ds(g * D, D)].astype(jnp.bfloat16)  # [Sp, D]
    vsg = vs_ref[0, pl.ds(g, 1), :]  # [1, Sp]
    pv = (p * vsg).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        pv, vg, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [MG, D]
    out = (out + p_self * vn) / denom
    o_ref[0, 0] = out.reshape(M, G * D).astype(o_ref.dtype)


def _kernel_bf16(
    q_ref,  # [1, M, H*D]
    k_ref,  # [1, Sp, KH*D] bf16
    v_ref,  # [1, Sp, KH*D] bf16
    kn_ref,  # [1, M, KH*D]
    vn_ref,  # [1, M, KH*D]
    mask_ref,  # [1, M, Sp] int32
    o_ref,  # [1, 1, M, G*D]
    *,
    G: int,
    D: int,
    scale: float,
):
    g = pl.program_id(1)
    M = q_ref.shape[1]

    qg = q_ref[0, :, pl.ds(g * G * D, G * D)].reshape(M * G, D)
    kg = k_ref[0, :, pl.ds(g * D, D)]  # [Sp, D]

    scores = (
        jax.lax.dot_general(
            qg, kg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [MG, Sp]
    mk = mask_ref[0]
    if G > 1:
        mk = jnp.repeat(mk, G, axis=0)
    scores = jnp.where(mk > 0, scores, _NEG)

    kn = kn_ref[0, :, pl.ds(g * D, D)]
    vn = vn_ref[0, :, pl.ds(g * D, D)].astype(jnp.float32)
    if G > 1:
        kn = jnp.repeat(kn, G, axis=0)
        vn = jnp.repeat(vn, G, axis=0)
    self_sc = (
        jnp.sum(qg.astype(jnp.float32) * kn.astype(jnp.float32), -1, keepdims=True)
        * scale
    )

    mx = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), self_sc)
    p = jnp.exp(scores - mx)
    p_self = jnp.exp(self_sc - mx)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_self

    vg = v_ref[0, :, pl.ds(g * D, D)]
    out = jax.lax.dot_general(
        p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = (out + p_self * vn) / denom
    o_ref[0, 0] = out.reshape(M, G * D).astype(o_ref.dtype)


@jax.jit
def ensemble_decode_attention_fused(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    key_mask: jax.Array,
) -> jax.Array:
    """bf16-only drop-in for ``ops.attention.ensemble_decode_attention``
    — same one-pass structure as the int8 variant, minus the scale folds.
    The kernel computes in bfloat16 (fp32 accumulation on the MXU); fp32
    inputs are rejected rather than silently down-cast, so fp32 parity
    runs must keep the XLA op (the decode_step dispatch guard does this).  Worth it for the same reason: XLA's repeat_kv expands the
    cache n_rep-times in HBM under GQA (measured 2679 us vs a 133 us read
    floor at B=8, M=9, KH=8, S=3328; 288 us vs 17 us even at B=1, M=4 —
    the default LLaVA-NeXT decode step).

    Args: q: [B, M, H, D]; k_cache/v_cache: [B, S, KH, D];
      k_new/v_new: [B, M, KH, D]; key_mask: [B, M, S].
    """
    if k_cache.dtype != jnp.bfloat16 or q.dtype != jnp.bfloat16:
        raise TypeError(
            "ensemble_decode_attention_fused is bf16-only (got q="
            f"{q.dtype}, cache={k_cache.dtype}); use "
            "ops.attention.ensemble_decode_attention for fp32 parity runs"
        )
    B, M, H, D = q.shape
    S, KH = k_cache.shape[1], k_cache.shape[2]
    G = H // KH

    Sp = ((S + 31) // 32) * 32
    pad = Sp - S
    mask = key_mask.astype(jnp.int32)
    if pad:
        k_cache = jnp.pad(k_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad)))

    dt = jnp.bfloat16
    q2 = q.reshape(B, M, H * D).astype(dt)
    k2 = k_cache.reshape(B, Sp, KH * D).astype(dt)
    v2 = v_cache.reshape(B, Sp, KH * D).astype(dt)
    kn2 = k_new.reshape(B, M, KH * D).astype(dt)
    vn2 = v_new.reshape(B, M, KH * D).astype(dt)

    bcast = lambda b, g: (b, 0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel_bf16, G=G, D=D, scale=1.0 / (D**0.5)),
        grid=(B, KH),
        in_specs=[
            pl.BlockSpec((1, M, H * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, KH * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, KH * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, KH * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, KH * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, Sp), bcast, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, M, G * D), lambda b, g: (b, g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, KH, M, G * D), q.dtype),
    )(q2, k2, v2, kn2, vn2, mask)

    out = out.reshape(B, KH, M, G, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, M, H, D).astype(q.dtype)


@jax.jit
def ensemble_decode_attention_int8kv_fused(
    q: jax.Array,
    kq: jax.Array,
    ks: jax.Array,
    vq: jax.Array,
    vs: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    key_mask: jax.Array,
) -> jax.Array:
    """Drop-in for ``ops.attention.ensemble_decode_attention_int8kv``.

    Args:
      q: [B, M, H, D]; kq/vq: [B, S, KH, D] int8; ks/vs: [B, KH, S] f32
      (the cache's stored scale layout — exactly what the kernel's
      per-head row slices want, no transpose on the hot path);
      k_new/v_new: [B, M, KH, D]; key_mask: [B, M, S].
    Returns:
      [B, M, H, D]
    """
    B, M, H, D = q.shape
    S, KH = kq.shape[1], kq.shape[2]
    G = H // KH

    Sp = ((S + 31) // 32) * 32  # int8 sublane tile
    pad = Sp - S
    mask = key_mask.astype(jnp.int32)
    if pad:
        kq = jnp.pad(kq, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, pad), (0, 0), (0, 0)))
        ks = jnp.pad(ks, ((0, 0), (0, 0), (0, pad)))
        vs = jnp.pad(vs, ((0, 0), (0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad)))

    q2 = q.reshape(B, M, H * D).astype(jnp.bfloat16)
    k2 = kq.reshape(B, Sp, KH * D)
    v2 = vq.reshape(B, Sp, KH * D)
    ks2 = ks
    vs2 = vs
    kn2 = k_new.reshape(B, M, KH * D).astype(jnp.bfloat16)
    vn2 = v_new.reshape(B, M, KH * D).astype(jnp.bfloat16)

    bcast = lambda b, g: (b, 0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, G=G, D=D, scale=1.0 / (D**0.5)),
        grid=(B, KH),
        in_specs=[
            pl.BlockSpec((1, M, H * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, KH * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KH, Sp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, KH * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KH, Sp), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, KH * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, KH * D), bcast, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, Sp), bcast, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, M, G * D), lambda b, g: (b, g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, KH, M, G * D), q.dtype),
    )(q2, k2, ks2, v2, vs2, kn2, vn2, mask)

    # [B, KH, M, G, D] -> [B, M, KH*G=H, D]; head h uses kv group h // G,
    # matching ops.attention.repeat_kv's interleaving
    out = out.reshape(B, KH, M, G, D).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, M, H, D).astype(q.dtype)


# ---------------------------------------------------------------------------
# Layered variants: the whole decode-depth cache stays in HBM and the
# kernel block-indexes layer l via scalar prefetch, so the per-layer
# [B, S, KH, D] slice is never materialized.  Under lax.scan the sliced
# paths above pay a read+write copy of BOTH cache slices every layer
# (profiled: 2 x 57 us/layer at the batch-16 LLaVA stretch shape — more
# device time than the attention math itself).  The grid is (B,) with all
# KH heads processed in an unrolled loop per cell: the (B, KH) grid's 512
# tiny cells measured 440 us/layer at that shape from per-cell overhead
# alone; one cell per row with the same math measures 218 us/layer.
# models/llama.decode_step dispatches the INT8-cache layered kernel on
# single-device TPU for both MHA and GQA (the XLA in-program chain
# measures 395-446 us/layer at the MHA stretch shape — the "XLA wins at
# KH == H" note above holds only for the sliced kernel's geometry).
# The bf16 layered variant below is test-only: the 5-D dense cache would
# retile at the kernel boundary (2 x 4.9 ms/step), so the production
# bf16 path keeps the sliced fused kernel / XLA op.
# ---------------------------------------------------------------------------


def _kernel_layered_int8(
    l_ref,  # scalar prefetch: [1] int32 layer index
    q_ref,  # [1, M, H*D] bf16
    k_ref,  # [1, 1, Sp, KH*D] int8 (block of the full [L, B, Sp, KH*D])
    ks_ref,  # [1, 1, KH, Sp] f32 (block of the full [L, B, KH, Sp])
    v_ref,
    vs_ref,
    kn_ref,  # [1, M, KH*D] bf16
    vn_ref,
    mask_ref,  # [1, M, Sp] int32
    o_ref,  # [1, M, H*D]
    *,
    G: int,
    D: int,
    KH: int,
    scale: float,
):
    M = q_ref.shape[1]
    mk0 = mask_ref[0]  # [M, Sp] — loaded once, shared by all heads
    for g in range(KH):
        qg = q_ref[0, :, pl.ds(g * G * D, G * D)].reshape(M * G, D)
        kg = k_ref[0, 0, :, pl.ds(g * D, D)].astype(jnp.bfloat16)  # [Sp, D]
        ksg = ks_ref[0, 0, pl.ds(g, 1), :]  # [1, Sp]

        scores = (
            jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        scores = scores * ksg
        mk = jnp.repeat(mk0, G, axis=0) if G > 1 else mk0
        scores = jnp.where(mk > 0, scores, _NEG)

        kn = kn_ref[0, :, pl.ds(g * D, D)]
        vn = vn_ref[0, :, pl.ds(g * D, D)].astype(jnp.float32)
        if G > 1:
            kn = jnp.repeat(kn, G, axis=0)
            vn = jnp.repeat(vn, G, axis=0)
        self_sc = (
            jnp.sum(
                qg.astype(jnp.float32) * kn.astype(jnp.float32), -1,
                keepdims=True,
            )
            * scale
        )

        mx = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), self_sc)
        p = jnp.exp(scores - mx)
        p_self = jnp.exp(self_sc - mx)
        denom = jnp.sum(p, axis=-1, keepdims=True) + p_self

        vg = v_ref[0, 0, :, pl.ds(g * D, D)].astype(jnp.bfloat16)
        vsg = vs_ref[0, 0, pl.ds(g, 1), :]
        pv = (p * vsg).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            pv, vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = (out + p_self * vn) / denom  # [MG, D]
        # head h = g*G + j of member m lands at columns (g*G + j)*D —
        # repeat_kv's interleave (head h reads kv group h // G)
        o_ref[0, :, pl.ds(g * G * D, G * D)] = out.reshape(M, G * D).astype(
            o_ref.dtype
        )


def _kernel_layered_bf16(
    l_ref,
    q_ref,  # [1, M, H*D] bf16
    k_ref,  # [1, 1, Sp, KH*D] bf16
    v_ref,
    kn_ref,  # [1, M, KH*D]
    vn_ref,
    mask_ref,  # [1, M, Sp] int32
    o_ref,  # [1, M, H*D]
    *,
    G: int,
    D: int,
    KH: int,
    scale: float,
):
    M = q_ref.shape[1]
    mk0 = mask_ref[0]
    for g in range(KH):
        qg = q_ref[0, :, pl.ds(g * G * D, G * D)].reshape(M * G, D)
        kg = k_ref[0, 0, :, pl.ds(g * D, D)]  # [Sp, D]

        scores = (
            jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        mk = jnp.repeat(mk0, G, axis=0) if G > 1 else mk0
        scores = jnp.where(mk > 0, scores, _NEG)

        kn = kn_ref[0, :, pl.ds(g * D, D)]
        vn = vn_ref[0, :, pl.ds(g * D, D)].astype(jnp.float32)
        if G > 1:
            kn = jnp.repeat(kn, G, axis=0)
            vn = jnp.repeat(vn, G, axis=0)
        self_sc = (
            jnp.sum(
                qg.astype(jnp.float32) * kn.astype(jnp.float32), -1,
                keepdims=True,
            )
            * scale
        )

        mx = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), self_sc)
        p = jnp.exp(scores - mx)
        p_self = jnp.exp(self_sc - mx)
        denom = jnp.sum(p, axis=-1, keepdims=True) + p_self

        vg = v_ref[0, 0, :, pl.ds(g * D, D)]
        out = jax.lax.dot_general(
            p.astype(vg.dtype), vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = (out + p_self * vn) / denom
        o_ref[0, :, pl.ds(g * G * D, G * D)] = out.reshape(M, G * D).astype(
            o_ref.dtype
        )


def layered_supported(Smax: int, head_dim: int) -> bool:
    """Static-shape gate for the layered kernels: lane-width head panels
    and an int8-sublane-tile sequence axis (the full cache is NOT padded
    — padding it would copy the buffer the kernel exists to avoid)."""
    return head_dim % 128 == 0 and Smax % 32 == 0


def ensemble_decode_attention_int8kv_layered(
    l_idx: jax.Array,
    q: jax.Array,
    kq_all: jax.Array,
    ks_all: jax.Array,
    vq_all: jax.Array,
    vs_all: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    key_mask: jax.Array,
) -> jax.Array:
    """ensemble_decode_attention_int8kv for layer ``l_idx`` of the FULL
    cache — zero slice materialization (see module section comment).

    Args:
      l_idx: scalar int32 layer index.
      q: [B, M, H, D]; kq_all/vq_all: [L, B, S, KH*D] int8 — the cache's
      stored head-flattened layout (models/llama.KVCache); under TPU
      tiling a 5-D->4-D reshape here would physically retile the whole
      cache every step (profiled at 2 x 4.9 ms/step at the 7B batch-16
      stretch shape), so the flat layout goes straight through;
      ks_all/vs_all: [L, B, KH, S] f32 (the cache's stored layout);
      k_new/v_new: [B, M, KH, D]; key_mask: [B, M, S].
    Returns: [B, M, H, D].
    """
    B, M, H, D = q.shape
    L, _, S, _ = kq_all.shape
    KH = k_new.shape[2]
    G = H // KH
    if not layered_supported(S, D):
        raise ValueError(f"layered kernel needs S%32==0, D%128==0 (S={S}, D={D})")

    q2 = q.reshape(B, M, H * D).astype(jnp.bfloat16)
    k2 = kq_all
    v2 = vq_all
    kn2 = k_new.reshape(B, M, KH * D).astype(jnp.bfloat16)
    vn2 = v_new.reshape(B, M, KH * D).astype(jnp.bfloat16)
    mask = key_mask.astype(jnp.int32)

    bc = lambda b, l: (b, 0, 0)
    lb = lambda b, l: (l[0], b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, M, H * D), bc),
            pl.BlockSpec((1, 1, S, KH * D), lb),
            pl.BlockSpec((1, 1, KH, S), lb),
            pl.BlockSpec((1, 1, S, KH * D), lb),
            pl.BlockSpec((1, 1, KH, S), lb),
            pl.BlockSpec((1, M, KH * D), bc),
            pl.BlockSpec((1, M, KH * D), bc),
            pl.BlockSpec((1, M, S), bc),
        ],
        out_specs=pl.BlockSpec((1, M, H * D), bc),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_layered_int8, G=G, D=D, KH=KH, scale=1.0 / (D**0.5)
        ),
        grid_spec=grid_spec,
        # the unrolled head loop's per-head [M*G, S] f32 score/prob
        # intermediates are stack-allocated; at the LLaVA-NeXT serving
        # shape (S=3328, G=4) they exceed the 16 MB default scoped-vmem
        # limit -- raise it (VMEM is 128 MB on v5e)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, H * D), q.dtype),
    )(
        jnp.asarray(l_idx, jnp.int32).reshape(1),
        q2, k2, ks_all, v2, vs_all, kn2, vn2, mask,
    )
    return out.reshape(B, M, H, D).astype(q.dtype)


def ensemble_decode_attention_layered(
    l_idx: jax.Array,
    q: jax.Array,
    k_all: jax.Array,
    v_all: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    key_mask: jax.Array,
) -> jax.Array:
    """bf16 layered variant: ensemble_decode_attention for layer ``l_idx``
    of the full [L, B, S, KH, D] bf16 cache (bf16-only, like
    ensemble_decode_attention_fused)."""
    if k_all.dtype != jnp.bfloat16 or q.dtype != jnp.bfloat16:
        raise TypeError(
            "ensemble_decode_attention_layered is bf16-only (got q="
            f"{q.dtype}, cache={k_all.dtype})"
        )
    B, M, H, D = q.shape
    L, _, S, KH, _ = k_all.shape
    G = H // KH
    if not layered_supported(S, D):
        raise ValueError(f"layered kernel needs S%32==0, D%128==0 (S={S}, D={D})")

    q2 = q.reshape(B, M, H * D)
    k2 = k_all.reshape(L, B, S, KH * D)
    v2 = v_all.reshape(L, B, S, KH * D)
    kn2 = k_new.reshape(B, M, KH * D).astype(jnp.bfloat16)
    vn2 = v_new.reshape(B, M, KH * D).astype(jnp.bfloat16)
    mask = key_mask.astype(jnp.int32)

    bc = lambda b, l: (b, 0, 0)
    lb = lambda b, l: (l[0], b, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, M, H * D), bc),
            pl.BlockSpec((1, 1, S, KH * D), lb),
            pl.BlockSpec((1, 1, S, KH * D), lb),
            pl.BlockSpec((1, M, KH * D), bc),
            pl.BlockSpec((1, M, KH * D), bc),
            pl.BlockSpec((1, M, S), bc),
        ],
        out_specs=pl.BlockSpec((1, M, H * D), bc),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_layered_bf16, G=G, D=D, KH=KH, scale=1.0 / (D**0.5)
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, H * D), q.dtype),
    )(
        jnp.asarray(l_idx, jnp.int32).reshape(1),
        q2, k2, v2, kn2, vn2, mask,
    )
    return out.reshape(B, M, H, D).astype(q.dtype)


def _row_update_kernel(cl_ref, new_ref, cache_ref, o_ref, *, ROWS: int):
    # block = a ROWS-row window of the S axis containing the target slot;
    # copy the window through and overwrite the target row (vectorized
    # select -- dynamic sublane stores don't lower)
    b = pl.program_id(1)
    row = cl_ref[b] % ROWS
    window = cache_ref[0, 0]  # [ROWS, F]
    rows = jax.lax.broadcasted_iota(jnp.int32, window.shape, 0)
    o_ref[0, 0] = jnp.where(rows == row, new_ref[0, 0], window)


def cache_append_rows_int8(
    cache_q: jax.Array, new_q: jax.Array, cur_len: jax.Array
) -> jax.Array:
    """In-place per-row cache append for the int8 "q" leaf: writes
    ``new_q[l, b]`` at ``cache_q[l, b, cur_len[b]]`` via an aliased Pallas
    call whose block is a 32-row window around the target slot, so only
    L*B*32*KH*D bytes move (~134 MB at the 7B stretch shape, vs 5.4 GB of
    whole-cache relayout).  The jnp ``.at[:, rows, cur_len].set`` scatter
    is semantically identical but XLA's scatter emitter assigns the
    output a {3,0,2,1} layout the attention kernel's operand constraint
    then undoes with a whole-cache relayout copy EVERY STEP (profiled at
    2 x 4.3 ms/step on the batch-16 7B stretch config, plus matching
    dispatch entry/exit copies); the aliased kernel keeps the buffer in
    the default layout end-to-end.

    Args: cache_q [L, B, S, KH*D] int8; new_q [L, B, KH*D] int8;
      cur_len [B] int32.
    Returns: the updated [L, B, S, KH*D] buffer (aliases cache_q).
    """
    L, B, S, F = cache_q.shape
    ROWS = 32  # int8 sublane tile; S % 32 == 0 on every layered-path cache
    new4 = new_q.reshape(L, B, 1, F)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B),
        in_specs=[
            pl.BlockSpec((1, 1, 1, F), lambda l, b, cl: (l, b, 0, 0)),
            pl.BlockSpec(
                (1, 1, ROWS, F), lambda l, b, cl: (l, b, cl[b] // ROWS, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ROWS, F), lambda l, b, cl: (l, b, cl[b] // ROWS, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_row_update_kernel, ROWS=ROWS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache_q.shape, cache_q.dtype),
        input_output_aliases={2: 0},  # cache operand (after scalar) -> out
    )(cur_len.astype(jnp.int32), new4, cache_q)
