"""Pallas blockwise (flash) attention for prefill — the production
long-sequence path on TPU (wired into models/llama.prefill for S >= 1024).

At LLaVA-NeXT lengths (~3k visual+text tokens) a dense prefill would
materialize per-head [S, S] score tensors in HBM (32 heads x 3k x 3k fp32
~ 1.2 GB).  This kernel tiles queries and keeps K/V resident in VMEM
(S <= ~4k fits comfortably: 2 x S x 128 bf16 = 1.5 MB), so scores exist
only as a [BQ, S] VMEM tile.  Queries are blocked; softmax is computed per
tile in fp32.  Supports causal masking + key-padding masks (the LLaVA-NeXT
padded-merge path).

Measured on 1x v5e at S=2880-3072, H=32, D=128, bf16 (scan-chained
timing, single host fetch — per-call fetches over the axon tunnel add a
~31 ms constant that buried the kernel's real cost in round 1):

  ours (BQ=512):                 0.98 ms/call
  chunked XLA (ops/attention):   4.29 ms/call
  jax.experimental flash (ref):  4.18 ms/call
  dense-flops roofline:         ~0.36 ms

For the decode step the cache matvec is already a small batched GEMV that
XLA emits optimally; no custom kernel needed there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 512  # best of {128, 256, 512} on v5e at S~3k
_NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, causal: bool, scale: float):
    qi = pl.program_id(1)
    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [S, D]
    v = v_ref[0]
    kmask = mask_ref[0]  # [1, S] (int32: 1 = attend)

    scores = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [BQ, S]
    S = scores.shape[-1]
    BQ = scores.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (BQ, S), 1)
    ok = kmask > 0  # [1, S] broadcasts over rows
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (BQ, S), 0) + qi * BQ
        ok = ok & (col <= row)
    scores = jnp.where(ok, scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal",))
def flash_prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    causal: bool = True,
) -> jax.Array:
    """Drop-in for ops.attention.prefill_attention on TPU.

    Args:
      q: [B, S, H, D]; k, v: [B, S, KH, D]; key_mask: [B, S] (1 = attend).
    Returns:
      [B, S, H, D]
    """
    from .attention import repeat_kv

    B, S, H, D = q.shape
    KH = k.shape[2]
    k = repeat_kv(k, H // KH)
    v = repeat_kv(v, H // KH)

    Sp = ((S + _BQ - 1) // _BQ) * _BQ
    pad = Sp - S
    if key_mask is None:
        key_mask = jnp.ones((B, S), jnp.int32)
    key_mask = key_mask.astype(jnp.int32)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))

    # [B, S, H, D] -> [B*H, S, D]
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, Sp, D)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    maskb = jnp.repeat(key_mask[:, None, :], H, axis=1).reshape(B * H, 1, Sp)

    grid = (B * H, Sp // _BQ)
    out = pl.pallas_call(
        functools.partial(_kernel, causal=causal, scale=1.0 / (D**0.5)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BQ, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Sp, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Sp), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _BQ, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Sp, D), q.dtype),
    )(qb, kb, vb, maskb)

    out = out.reshape(B, H, Sp, D).transpose(0, 2, 1, 3)
    return out[:, :S]
