"""Weight-only int8 quantization for the Llama tower.

Decode at batch<=K+1 is HBM-bound: per-token latency ~ bytes(weights)/BW.
Per-output-channel symmetric int8 halves the streamed bytes vs bf16 for
the seven big projection matrices per layer (+ lm_head), which is a ~2x
decode-throughput lever at equal arithmetic (XLA fuses the int8->bf16
dequant into the MXU feed).

Representation: a quantized matrix is the dict {"q": int8 [.., D, E],
"s": bf16 [.., 1, E]} (scale per output channel, broadcast over the
stacked-layer leading axis).  models/llama._mm dispatches on this shape,
so quantized and dense params flow through the same tower code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_QUANT_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def quantize_matrix(w: jax.Array, axis: int = -1) -> dict:
    """Symmetric per-output-channel int8: q = round(w / s), s = amax/127."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)  # per output col
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    # scales stay fp32: negligible bytes ([1, E]) and avoids a bf16
    # rescale error on top of the int8 rounding
    return {"q": q, "s": s}


def dequantize_matrix(wq: dict, dtype=jnp.float32) -> jax.Array:
    return (wq["q"].astype(jnp.float32) * wq["s"].astype(jnp.float32)).astype(dtype)


def quantize_kv(x: jax.Array):
    """Per-(token, head) symmetric int8 for K/V cache entries.

    Args:
      x: [..., D] keys or values (any leading dims).
    Returns:
      {"q": int8 [..., D], "s": f32 [..., 1]} — at LLaVA cache shapes the
      scale overhead is 1/(2D) of the original bf16 bytes, and the cache
      stream during decode halves (the decode bottleneck at large batch).
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def _concat_leaves(leaves):
    """Concatenate projection leaves along the OUTPUT axis, preserving the
    leaf kind: dense arrays, int8 {"q","s"}, or packed int4 {"q4","s4"}
    (int4 packs along the CONTRACTION axis, so output-axis concat is
    layout-safe)."""
    first = leaves[0]
    if isinstance(first, dict):
        if "q4" in first:
            return {
                "q4": jnp.concatenate([l["q4"] for l in leaves], axis=-1),
                "s4": jnp.concatenate([l["s4"] for l in leaves], axis=-1),
            }
        return {
            "q": jnp.concatenate([l["q"] for l in leaves], axis=-1),
            "s": jnp.concatenate([l["s"] for l in leaves], axis=-1),
        }
    return jnp.concatenate(leaves, axis=-1)


def fuse_projections(params: dict) -> dict:
    """Fuse q/k/v -> "qkv_proj" and gate/up -> "gate_up_proj" along the
    output axis (single-device decode/prefill layout).

    Why: on TPU the three q/k/v matmuls of a decode step run as three
    separate XLA fusions that each pay the full pipeline ramp for a small
    output — profiled at the batch-16 LLaVA stretch shape they cost
    3 x 48 us/layer while gate/up (2.7x the bytes each) cost 76 us: the
    q/k/v trio runs at ~2x its combined HBM+MXU floor purely from
    per-fusion overhead.  One [D, (H+2*KH)*Dh] matmul pays the ramp once;
    models/llama reads the fused leaf when present and slices the output
    (lane-dim slices at head-aligned offsets are free).  Works on dense,
    int8, and packed-int4 leaves.

    TP note: parallel/mesh.py's shard specs are keyed on the SPLIT leaf
    names; fuse only single-device params (shard_llama_specs raises on
    fused leaves rather than silently replicating them).
    """
    layers = dict(params["layers"])
    if "qkv_proj" in layers:
        return params  # already fused
    layers["qkv_proj"] = _concat_leaves(
        [layers.pop("q_proj"), layers.pop("k_proj"), layers.pop("v_proj")]
    )
    layers["gate_up_proj"] = _concat_leaves(
        [layers.pop("gate_proj"), layers.pop("up_proj")]
    )
    out = dict(params)
    out["layers"] = layers
    return out


def quantize_llama_params(params: dict, quantize_lm_head: bool = True) -> dict:
    """Quantize the per-layer projections (+ optionally lm_head) of a
    models/llama parameter pytree.  Norms and embeddings stay bf16."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANT_NAMES:
        layers[name] = quantize_matrix(layers[name])
    out["layers"] = layers
    if quantize_lm_head:
        out["lm_head"] = quantize_matrix(params["lm_head"])
    return out


INT4_GROUP = 128  # contraction-dim group size (RTN-g128, the standard
#   weight-only 4-bit operating point); every production in-dim (4096,
#   11008 = 43*256) is divisible by 2*group so the two packed halves
#   never straddle a group


INT4_CLIP_GRID = (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7)


def quantize_matrix_int4(
    w: jax.Array,
    group_size: int = INT4_GROUP,
    clip_grid: tuple = INT4_CLIP_GRID,
) -> dict:
    """Symmetric group-wise int4, two values packed per int8 byte.

    Decode is HBM-bound on the weight stream; int4 halves the int8 stream
    again (0.516 bytes/weight incl. fp32 group scales at g=128).  Scheme:
    round-to-nearest with per-(group, output-channel) scale chosen by an
    MSE-optimal clip search over ``clip_grid`` × (amax/7) — plain-RTN
    amax scaling wastes the 4-bit grid on the group's single largest
    value; clipping it shrinks the error of every OTHER element, and the
    per-(group, channel) argmin never does worse than plain RTN
    (clip_grid=(1.0,) recovers it exactly).  Offline-only cost: the
    search runs once per matrix at load, the runtime format is unchanged.

    Packing: byte ``d`` of ``q4`` [.., D/2, E] holds contraction rows
    ``d`` (low nibble) and ``d + D/2`` (high nibble), so the matmul
    splits into two half-contractions with NO interleave/concat in the
    unpack path (models/llama._mm_int4) — both nibbles sign-extend with
    two arithmetic shifts and every op stays elementwise, which XLA fuses
    into the MXU operand feed.  Scales: ``s4`` [.., D/group, E] fp32;
    groups [0, N/2) scale the low half, [N/2, N) the high half.
    """
    w32 = w.astype(jnp.float32)
    D, E = w32.shape[-2], w32.shape[-1]
    if D % (2 * group_size):
        raise ValueError(f"in-dim {D} not divisible by 2*group ({2 * group_size})")
    lead = w32.shape[:-2]
    n = D // group_size
    wg = w32.reshape(lead + (n, group_size, E))
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)  # [.., n, 1, E]
    best_s = jnp.where(amax > 0, amax / 7.0, 1.0)
    if len(clip_grid) > 1 or clip_grid[0] != 1.0:
        best_err = None
        for c in clip_grid:
            sc = jnp.where(amax > 0, c * amax / 7.0, 1.0)
            qc = jnp.clip(jnp.round(wg / sc), -7, 7)
            err = jnp.sum((qc * sc - wg) ** 2, axis=-2, keepdims=True)
            if best_err is None:
                best_s, best_err = sc, err
            else:
                pick = err < best_err
                best_s = jnp.where(pick, sc, best_s)
                best_err = jnp.minimum(err, best_err)
    s = best_s
    q = jnp.clip(jnp.round(wg / s), -7, 7).astype(jnp.int8)
    q = q.reshape(lead + (D, E))
    lo = q[..., : D // 2, :]
    hi = q[..., D // 2 :, :]
    packed = (jnp.left_shift(hi, 4) | (lo & 0x0F)).astype(jnp.int8)
    return {"q4": packed, "s4": s.reshape(lead + (n, E))}


def unpack_int4(packed: jax.Array):
    """Sign-extended (low, high) nibble planes of an int4-packed matrix."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return lo, hi


def dequantize_matrix_int4(wq: dict, dtype=jnp.float32) -> jax.Array:
    q, s = wq["q4"], wq["s4"]
    D2, E = q.shape[-2], q.shape[-1]
    lead = q.shape[:-2]
    n = s.shape[-2]
    g2 = (2 * D2) // n  # group_size
    lo, hi = unpack_int4(q)
    full = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    fg = full.reshape(lead + (n, g2, E)) * s[..., :, None, :]
    return fg.reshape(lead + (2 * D2, E)).astype(dtype)


def _fit_group(D: int, group_size: int) -> int:
    """Largest group <= group_size with D % (2*group) == 0 (the packed
    halves must not straddle a group).  Production in-dims (4096, 11008)
    take g=128 unchanged; small test towers degrade to finer groups
    instead of erroring."""
    g = group_size
    while g > 1 and D % (2 * g):
        g //= 2
    if D % (2 * g):
        raise ValueError(f"in-dim {D} has no valid int4 group <= {group_size}")
    return g


def quantize_llama_params_int4(
    params: dict,
    lm_head: str | None = "int8",
    group_size: int = INT4_GROUP,
) -> dict:
    """int4 variant of quantize_llama_params: per-layer projections to
    packed group-wise int4; norms and embeddings stay bf16.  Per-matrix
    the group auto-fits downward (_fit_group) so non-production in-dims
    quantize at finer granularity instead of raising.

    ``lm_head``: "int8" (default — the head feeds logits directly and its
    extra bytes are ~2% of the 7B stream; measured to cut mean relative
    logit drift ~7% vs an int4 head), "int4", or None (keep dense)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANT_NAMES:
        w = layers[name]
        layers[name] = quantize_matrix_int4(w, _fit_group(w.shape[-2], group_size))
    out["layers"] = layers
    if lm_head is not None:
        w = params["lm_head"]
        out["lm_head"] = (
            quantize_matrix(w)
            if lm_head == "int8"
            else quantize_matrix_int4(w, _fit_group(w.shape[-2], group_size))
        )
    return out


def quantize_activations(x: jax.Array):
    """Per-row (last-axis) symmetric int8 for activations — the "a8" half
    of the w8a8 prefill mode.  Unlike weights (quantized once, offline),
    activations are quantized on the fly per token row; the scale rides
    along and folds into the int32 matmul output together with the
    weight's per-output-channel scale.

    Returns (q int8 [..., D], s f32 [..., 1]).  Same per-row symmetric
    scheme as the KV-cache quantizer — delegate so the two paths can
    never diverge."""
    d = quantize_kv(x)
    return d["q"], d["s"]
