"""Llama-family decoder (Llama-7B / Vicuna-7B / Mistral-7B) as pure
functions over a parameter pytree.

Design notes (TPU-first, not a torch translation):
- Layers are *stacked* along a leading axis and iterated with ``lax.scan``:
  one compiled layer body regardless of depth (32x less HLO than unrolled).
- Two entry points:
    * ``prefill``: full-sequence causal attention; returns hidden states and
      the per-layer K/V to seed the canonical cache.
    * ``decode_step``: one token for M ensemble members *sharing* the
      canonical cache (see ops/attention.ensemble_decode_attention); returns
      each member's logits and its own new-token K/V so the engine can
      scatter only the winner's into the cache — the functional equivalent
      of the reference carrying forward the vote winner's deepcopied cache
      (reference llava.py:343,361,370-376).
- Weights live in bf16 (param_dtype), activations bf16, softmax/norm
  accumulation fp32, logits fp32 (HF casts logits to float as well).
- Mistral's 4096-token sliding window never binds at LLaVA sequence lengths
  (<= ~3.5k but window == max_position) and is intentionally not modeled.

HF weight mapping in ``params_from_hf``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import ensemble_decode_attention, prefill_attention
from ..ops.basic import apply_rope, rms_norm, rotary_embedding
from ..utils.config import LlamaConfig


class KVCache(NamedTuple):
    """Canonical cache: [L, B, Smax, KH, D] each.

    Leaves are either dense arrays or, for the int8 cache, dicts
    ``{"q": int8 [L,B,S,KH*D], "s": f32 [L,B,KH,S]}`` (per-(token, head)
    symmetric scales, utils/quantize.quantize_kv).  Both int8-leaf layouts
    are chosen for the DECODE READER, because under TPU tiling "reshape"
    and "relayout" are physical whole-array copies, not bitcasts:

    - "q" stores the head axis FLATTENED into the minor dim — exactly the
      [S, KH*D] panel the layered Pallas attention kernel streams.  Stored
      5-D, the per-step reshape retiles the full cache (profiled at
      2 x 4.9 ms/step on the batch-16 7B stretch config).
    - "s" is head-major/position-minor ([B,KH,S] per layer, S on lanes) —
      the per-head row the kernel's scale fold reads.  Stored
      position-major, XLA inserts a relayout copy of both scale buffers
      every step (profiled at 632 us/step).

    All cache plumbing goes through the ``cache_*`` helpers below so both
    layouts flow through the same engine code; ``decode_step`` dispatches
    on the leaf type and reshapes per-layer slices back to [B,S,KH,D]
    where the XLA ops need them (free outside TPU tiling).
    """

    k: jax.Array
    v: jax.Array

    @classmethod
    def empty(cls, cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (
            cfg.num_hidden_layers,
            batch,
            max_len,
            cfg.num_key_value_heads,
            cfg.head_dim,
        )
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def empty_cache(
    cfg: LlamaConfig,
    batch: int,
    max_len: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> KVCache:
    """Allocate the canonical cache; int8 layout when ``quantized``.

    The int8 cache halves the decode-time HBM stream (the per-step
    bottleneck once weights are int8 too) at a numerics cost bounded by
    tests/test_quantize.py; scales init to 1 so untouched slots dequantize
    to 0."""
    if not quantized:
        return KVCache.empty(cfg, batch, max_len, dtype)
    shape = (
        cfg.num_hidden_layers,
        batch,
        max_len,
        cfg.num_key_value_heads,
        cfg.head_dim,
    )
    qshape = shape[:3] + (shape[3] * shape[4],)  # [L, B, S, KH*D]
    sshape = (shape[0], shape[1], shape[3], shape[2])  # [L, B, KH, S]

    def leaf():
        return {"q": jnp.zeros(qshape, jnp.int8), "s": jnp.ones(sshape, jnp.float32)}

    return KVCache(leaf(), leaf())


def cache_is_quantized(cache: KVCache) -> bool:
    return isinstance(cache.k, dict)


def _leaf_map(f, *leaves, f_s=None):
    """Apply f across matching dense-or-{"q","s"} cache leaves.

    ``f_s``: override for the "s" leaf where the scale layout
    ([L,B,KH,S] vs the int8 matrix's [L,B,S,KH,D]) needs different
    index arithmetic; defaults to f."""
    if isinstance(leaves[0], dict):
        fs = {"q": f, "s": f_s or f}
        return {n: fs[n](*(leaf[n] for leaf in leaves)) for n in leaves[0]}
    return f(*leaves)


def _quantize_new(cache: KVCache, k_new: jax.Array, v_new: jax.Array):
    """Bring unquantized new K/V ([..., KH, D]-shaped) into the cache's
    leaf layout: {"q": [..., KH*D] int8, "s": [..., KH, 1] f32}."""
    if not cache_is_quantized(cache):
        return k_new, v_new
    from ..utils.quantize import quantize_kv

    def flat(d):
        q = d["q"]
        return {"q": q.reshape(q.shape[:-2] + (-1,)), "s": d["s"]}

    return flat(quantize_kv(k_new)), flat(quantize_kv(v_new))


def kv_int8_reader_layout(x: jax.Array) -> dict:
    """Quantize a dense K or V span ([..., S, KH, D]) into the int8
    READER layout this module's KVCache stores ({"q": [..., S, KH*D]
    head-flattened int8, "s": [..., KH, S] head-major f32} — see the
    KVCache docstring for why).  Single home of the layout contract for
    out-of-cache holders (the engine's int8 prefix-cache handles)."""
    from ..utils.quantize import quantize_kv

    d = quantize_kv(x)
    return {
        "q": d["q"].reshape(d["q"].shape[:-2] + (-1,)),
        "s": jnp.swapaxes(d["s"][..., 0], 2, 3),
    }


def cache_seed(cache: KVCache, kv: KVCache) -> KVCache:
    """Write the prefill K/V ([L, B, S0, KH, D], dense) at slot 0."""
    kn, vn = _quantize_new(cache, kv.k, kv.v)

    def upd(c, new):
        return jax.lax.dynamic_update_slice_in_dim(
            c, new.astype(c.dtype), 0, axis=2
        )

    def upd_s(c, new):  # c [L,B,KH,S]; new scales [L,B,S0,KH,1]
        new_t = jnp.swapaxes(new[..., 0], 2, 3)  # -> [L,B,KH,S0]
        return jax.lax.dynamic_update_slice_in_dim(c, new_t, 0, axis=3)

    return KVCache(
        _leaf_map(upd, cache.k, kn, f_s=upd_s),
        _leaf_map(upd, cache.v, vn, f_s=upd_s),
    )


def cache_write_span(cache: KVCache, start, kv: KVCache) -> KVCache:
    """Write a dense K/V block ([L, B, T, KH, D]) at slot ``start``
    (traced scalar) — the speculative verify's block append; handles
    both dense and int8 cache layouts (quantization is per row, so a
    block write produces bit-identical leaves to T sequential
    cache_set_rows appends)."""
    kn, vn = _quantize_new(cache, kv.k, kv.v)
    start = jnp.asarray(start, jnp.int32)

    def upd(c, new):
        return jax.lax.dynamic_update_slice_in_dim(
            c, new.astype(c.dtype), start, axis=2
        )

    def upd_s(c, new):  # c [L,B,KH,S]; new scales [L,B,T,KH,1]
        new_t = jnp.swapaxes(new[..., 0], 2, 3)  # -> [L,B,KH,T]
        return jax.lax.dynamic_update_slice_in_dim(c, new_t, start, axis=3)

    return KVCache(
        _leaf_map(upd, cache.k, kn, f_s=upd_s),
        _leaf_map(upd, cache.v, vn, f_s=upd_s),
    )


def cache_set_rows(
    cache: KVCache, cur_len: jax.Array, k_new: jax.Array, v_new: jax.Array
) -> KVCache:
    """Scatter the winner's new-token K/V ([L, B, KH, D], dense) into slot
    ``cur_len[b]`` of each row — the engine's per-step cache append.

    On single-device TPU the int8 "q" leaves append through an ALIASED
    Pallas row-writer instead of an XLA scatter: the scatter emitter
    assigns its output a layout the layered attention kernel's operand
    constraint undoes with a whole-cache relayout copy every step
    (profiled at 2 x 4.3 ms/step on the batch-16 7B stretch config).
    Multi-device runs (GSPMD-partitioned caches — a bare pallas_call has
    no partitioning rule) and non-TPU backends keep the scatter."""
    B = k_new.shape[1]
    rows = jnp.arange(B)
    kn, vn = _quantize_new(cache, k_new, v_new)
    single_device = jax.device_count() == 1

    def upd(c, new):
        return c.at[:, rows, cur_len].set(new.astype(c.dtype))

    def upd_q(c, new):  # c [L, B, S, KH*D] int8 (flat layout)
        if not single_device:
            return upd(c, new)
        from ..ops.pallas_decode_attention import cache_append_rows_int8

        def _xla(c, new, cl):
            return c.at[:, rows, cl].set(new)

        return jax.lax.platform_dependent(
            c,
            new.astype(c.dtype),
            cur_len,
            tpu=cache_append_rows_int8,
            default=_xla,
        )

    def upd_s(c, new):  # c [L,B,KH,S]; new scales [L,B,KH,1]
        # elementwise select instead of a scatter: XLA's scatter emitter
        # assigns the output a layout the attention reader disagrees with,
        # inserting a whole-array relayout copy of BOTH scale buffers
        # every decode step (profiled at 2 x 300 us on the batch-16
        # stretch config); the select preserves the operand layout
        S = c.shape[3]
        hit = jnp.arange(S)[None, :] == cur_len[:, None]  # [B, S]
        return jnp.where(hit[None, :, None, :], new, c)

    def leaf(c, n):
        if isinstance(c, dict):
            return {"q": upd_q(c["q"], n["q"]), "s": upd_s(c["s"], n["s"])}
        return upd(c, n)

    return KVCache(
        leaf(cache.k, kn),
        leaf(cache.v, vn),
    )


def cache_copy_slots(dst: KVCache, src: KVCache, slots) -> KVCache:
    """Copy all rows of ``src`` into rows ``slots`` ([B] int32) of ``dst``
    — the batched serving placement (one scatter per leaf instead of one
    program per request)."""
    assert cache_is_quantized(dst) == cache_is_quantized(src)

    def upd(d, s):
        return d.at[:, slots].set(s.astype(d.dtype))

    return KVCache(_leaf_map(upd, dst.k, src.k), _leaf_map(upd, dst.v, src.v))


def cache_copy_slot(dst: KVCache, src: KVCache, slot, row=0) -> KVCache:
    """Copy row ``row`` of ``src`` into row ``slot`` of ``dst``
    (serving-layer slot placement; ``row`` indexes a batched prefill).
    Both caches must share a leaf layout."""
    assert cache_is_quantized(dst) == cache_is_quantized(src)

    def upd(d, s):
        return d.at[:, slot].set(s[:, row].astype(d.dtype))

    return KVCache(_leaf_map(upd, dst.k, src.k), _leaf_map(upd, dst.v, src.v))


def init_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random init (for tests and benchmarks with synthetic weights)."""
    ks = jax.random.split(key, 12)
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, KH, Dh, L = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.num_hidden_layers,
    )

    def nrm(k, shape, scale=0.02):
        return (scale * jax.random.normal(k, shape, jnp.float32)).astype(dtype)

    layers = {
        "input_ln": jnp.ones((L, D), dtype),
        "post_attn_ln": jnp.ones((L, D), dtype),
        "q_proj": nrm(ks[0], (L, D, H * Dh)),
        "k_proj": nrm(ks[1], (L, D, KH * Dh)),
        "v_proj": nrm(ks[2], (L, D, KH * Dh)),
        "o_proj": nrm(ks[3], (L, H * Dh, D)),
        "gate_proj": nrm(ks[4], (L, D, I)),
        "up_proj": nrm(ks[5], (L, D, I)),
        "down_proj": nrm(ks[6], (L, I, D)),
    }
    return {
        "embed_tokens": nrm(ks[7], (V, D)),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "lm_head": nrm(ks[8], (D, V)),
    }


def params_from_hf(cfg: LlamaConfig, sd: dict, dtype=jnp.bfloat16, prefix="") -> dict:
    """Convert an HF LlamaForCausalLM state dict (name -> numpy array).

    ``sd`` values may be torch tensors or numpy arrays; torch [out, in]
    linear layouts are transposed to [in, out] for x @ W.
    """

    def g(name):
        t = sd[prefix + name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def lin(name):
        return np.transpose(g(name))  # [out,in] -> [in,out]

    L = cfg.num_hidden_layers
    layers = {
        "input_ln": np.stack(
            [g(f"model.layers.{i}.input_layernorm.weight") for i in range(L)]
        ),
        "post_attn_ln": np.stack(
            [g(f"model.layers.{i}.post_attention_layernorm.weight") for i in range(L)]
        ),
        "q_proj": np.stack(
            [lin(f"model.layers.{i}.self_attn.q_proj.weight") for i in range(L)]
        ),
        "k_proj": np.stack(
            [lin(f"model.layers.{i}.self_attn.k_proj.weight") for i in range(L)]
        ),
        "v_proj": np.stack(
            [lin(f"model.layers.{i}.self_attn.v_proj.weight") for i in range(L)]
        ),
        "o_proj": np.stack(
            [lin(f"model.layers.{i}.self_attn.o_proj.weight") for i in range(L)]
        ),
        "gate_proj": np.stack(
            [lin(f"model.layers.{i}.mlp.gate_proj.weight") for i in range(L)]
        ),
        "up_proj": np.stack(
            [lin(f"model.layers.{i}.mlp.up_proj.weight") for i in range(L)]
        ),
        "down_proj": np.stack(
            [lin(f"model.layers.{i}.mlp.down_proj.weight") for i in range(L)]
        ),
    }
    embed = g("model.embed_tokens.weight")
    if prefix + "lm_head.weight" in sd:
        lm_head = lin("lm_head.weight")
    else:  # tied embeddings
        lm_head = np.transpose(embed)
    params = {
        "embed_tokens": embed,
        "layers": layers,
        "norm": g("model.norm.weight"),
        "lm_head": lm_head,
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def _mm(x: jax.Array, w) -> jax.Array:
    """Matmul dispatching on dense vs quantized weights (utils/quantize.py):
    {"q","s"} = per-channel int8, {"q4","s4"} = group-wise packed int4.
    The dequant chains (convert / nibble shifts + group-scale multiply) fuse
    into the MXU operand feed under XLA, so quantized weights stream half
    (int8) / a quarter (int4) of the bf16 HBM bytes."""
    if isinstance(w, dict):
        if "q4" in w:
            return _mm_int4(x, w)
        y = jnp.einsum("...d,de->...e", x, w["q"].astype(x.dtype))
        return y * w["s"].astype(y.dtype)[0]
    return jnp.einsum("...d,de->...e", x, w)


def _mm_int4(x: jax.Array, w: dict, preferred=None) -> jax.Array:
    """x @ W for packed group-wise int4 W (utils/quantize.quantize_matrix_int4).

    On TPU this dispatches to the Pallas kernel
    (ops/pallas_int4_matmul.py), which streams the packed bytes once and
    unpacks in VMEM — every XLA-level formulation measured at 7B decode
    either materializes the dequantized matrix or scalarizes the S4
    unpack (2.2x / 2.4x / 5.2x SLOWER than int8 weights; kernel header).
    Other backends use the portable XLA form: byte d of q4 holds
    contraction rows d (low nibble) and d + D/2 (high), so the product
    splits into two half-contractions over contiguous activation slices
    with per-(group, out-channel) scales on the operand."""
    q, s = w["q4"], w["s4"]
    D2, E = q.shape[-2], q.shape[-1]
    n = s.shape[-2]  # total groups across both halves
    g = (2 * D2) // n

    def _pallas(x):
        from ..ops.pallas_int4_matmul import int4_matmul

        return int4_matmul(x, q, s, out_dtype=preferred or x.dtype)

    def _xla(x):
        from ..utils.quantize import unpack_int4

        lo, hi = unpack_int4(q)

        def half(xh, qh, sh):
            nh = sh.shape[-2]
            wg = qh.astype(x.dtype).reshape((nh, g, E)) * sh[:, None, :].astype(
                x.dtype
            )
            xg = xh.reshape(xh.shape[:-1] + (nh, g))
            return jnp.einsum(
                "...ng,nge->...e", xg, wg, preferred_element_type=preferred
            )

        y = half(x[..., :D2], lo, s[: n // 2]) + half(x[..., D2:], hi, s[n // 2 :])
        return y if preferred is None else y.astype(preferred)

    return jax.lax.platform_dependent(x, tpu=_pallas, default=_xla)


class _LayeredInt4:
    """Sentinel standing in for a packed-int4 weight leaf inside a scanned
    layer dict.  The real [L, ...] stack stays OUT of the scan (closed
    over) and ``_layered_mm`` resolves the sentinel to a layer-indexed
    matmul on the full stack: scan-slicing an int4 leaf would materialize
    a per-layer copy of the packed bytes at every ``pallas_call`` boundary
    (XLA cannot fuse a dynamic-slice into a custom call) — profiled at
    4.6 ms/step of pure copy at 7B int4 decode, i.e. the whole weight
    stream moved twice."""

    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name


# Test hook: the CPU suite runs an 8-device virtual mesh, which would
# otherwise never trace the layered-int4 restructure (it is gated to
# single-device execution, like the layered attention kernels).  Tests
# monkeypatch this to pin layered == scan-sliced numerics off-TPU.
FORCE_LAYERED_INT4 = False


def _layered_int4_enabled() -> bool:
    return jax.device_count() == 1 or FORCE_LAYERED_INT4


def _split_int4_stacks(layers: dict):
    """(rest, stacks): packed-int4 weight stacks pulled out of the layer
    pytree for layered dispatch; ``rest`` keeps everything else (dense /
    int8 leaves scan-slice fine — their consumers are XLA ops the slice
    fuses into)."""
    stacks = {
        k: v for k, v in layers.items() if isinstance(v, dict) and "q4" in v
    }
    rest = {k: v for k, v in layers.items() if k not in stacks}
    return rest, stacks


def _mm_int4_layered(li, x, stack, preferred=None):
    """x @ W[li] over a full [L, D/2, E] packed-int4 stack.  TPU: the
    scalar-prefetch Pallas kernel (ops/pallas_int4_matmul.int4_matmul_
    layered) reads layer li's blocks straight out of HBM.  Other
    backends: dynamic-index (fuses in XLA) + the portable half-split
    form — identical numerics to the scan-sliced dispatch."""
    q, s = stack["q4"], stack["s4"]

    def _pallas(li, x):
        from ..ops.pallas_int4_matmul import int4_matmul_layered

        return int4_matmul_layered(
            li, x, q, s, out_dtype=preferred or x.dtype
        )

    def _xla(li, x):
        wl = {
            "q4": jax.lax.dynamic_index_in_dim(q, li, 0, keepdims=False),
            "s4": jax.lax.dynamic_index_in_dim(s, li, 0, keepdims=False),
        }
        return _mm_int4(x, wl, preferred=preferred)

    return jax.lax.platform_dependent(li, x, tpu=_pallas, default=_xla)


def _layered_mm(base_mm, stacks: dict, li):
    """Wrap a matmul dispatcher so ``_LayeredInt4`` sentinels resolve to
    layer-indexed matmuls on the closed-over stacks."""

    def mm(x, w):
        if isinstance(w, _LayeredInt4):
            return _mm_int4_layered(li, x, stacks[w.name])
        return base_mm(x, w)

    return mm


def _with_sentinels(lp: dict, stacks: dict) -> dict:
    lp = dict(lp)
    for k in stacks:
        lp[k] = _LayeredInt4(k)
    return lp


def embed(params: dict, input_ids: jax.Array) -> jax.Array:
    return params["embed_tokens"][input_ids]


def lm_head(params: dict, hidden: jax.Array) -> jax.Array:
    """fp32 logits (HF casts logits to float).  The matmul runs in the
    weights' dtype with fp32 MXU accumulation — no fp32 copy of the
    [D, V] matrix is materialized.  Supports int8-quantized weights."""
    w = params["lm_head"]
    if isinstance(w, dict):
        if "q4" in w:
            return _mm_int4(
                hidden.astype(jnp.bfloat16), w, preferred=jnp.float32
            )
        y = jnp.einsum(
            "...d,dv->...v",
            hidden.astype(jnp.bfloat16),
            w["q"].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return y * w["s"].astype(jnp.float32)[0]
    return jnp.einsum(
        "...d,dv->...v",
        hidden.astype(w.dtype),
        w,
        preferred_element_type=jnp.float32,
    )


def _mm_w8a8(x: jax.Array, w) -> jax.Array:
    """int8-activation x int8-weight matmul on the native int8 MXU path
    (s8 x s8 -> s32), for the opt-in w8a8 PREFILL mode.  Measured 1.63x
    the bf16 MXU rate on v5e at [608, 4096] x [4096, 11008] (268 vs 164
    TF/s-equivalent).  Prefill is compute-bound so this is a real latency
    lever (the POPE fast path is pure prefill); decode is HBM-bound and
    gains nothing, so it keeps the bf16 feed.  Activation rows are
    quantized on the fly (utils/quantize.quantize_activations); both
    scales fold into the int32 output.  Token-level drift is measured in
    cli/fused_gap.py --study w8a8 (STATUS.md).  Dense (unquantized)
    weights fall back to the bf16 path."""
    if not isinstance(w, dict) or "q4" in w:
        # dense weights, or int4 (no native s4 x s8 MXU path): bf16 feed
        return _mm(x, w)
    # NOTE a Pallas w8a8 kernel (in-kernel row quantize + s8 x s8 weight
    # tiles) was built and measured END-TO-END SLOWER than this XLA
    # formulation at the batch-16 stretch decode shape (655 vs 826 agg
    # t/s): the kernel-boundary [B, M, D] -> [R, D] reshapes relayout the
    # batch-minor hidden states every projection, eating the int8-MXU
    # gain.  docs/DESIGN.md records the study; keep the XLA path.
    from ..utils.quantize import quantize_activations

    qx, sx = quantize_activations(x)
    y = jnp.einsum(
        "...d,de->...e", qx, w["q"], preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * sx * w["s"].astype(jnp.float32)[0]).astype(
        x.dtype
    )


def _mlp(lp: dict, x: jax.Array, mm=_mm) -> jax.Array:
    if "gate_up_proj" in lp:
        # fused gate+up leaf (utils/quantize.fuse_projections): one matmul,
        # one XLA fusion ramp instead of two
        y = mm(x, lp["gate_up_proj"])
        gate, up = jnp.split(y, 2, axis=-1)
    else:
        gate = mm(x, lp["gate_proj"])
        up = mm(x, lp["up_proj"])
    return mm(jax.nn.silu(gate) * up, lp["down_proj"])


def _qkv(lp: dict, h: jax.Array, mm, H: int, KH: int, Dh: int):
    """q/k/v projections — one fused [D, (H+2KH)*Dh] matmul when the
    params carry the fused "qkv_proj" leaf (utils/quantize.fuse_projections;
    profiled 3 x 48 us/layer -> ~80 us at the batch-16 stretch shape: the
    three small-output fusions each pay the full pipeline ramp), else the
    split leaves.  Output slices are lane-dim at head-aligned offsets."""
    lead = h.shape[:-1]
    if "qkv_proj" in lp:
        y = mm(h, lp["qkv_proj"])
        q = y[..., : H * Dh]
        k = y[..., H * Dh : (H + KH) * Dh]
        v = y[..., (H + KH) * Dh :]
    else:
        q = mm(h, lp["q_proj"])
        k = mm(h, lp["k_proj"])
        v = mm(h, lp["v_proj"])
    return (
        q.reshape(*lead, H, Dh),
        k.reshape(*lead, KH, Dh),
        v.reshape(*lead, KH, Dh),
    )


def prefill(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    key_mask: jax.Array | None = None,
    w8a8: bool = False,
):
    """Full-sequence causal forward.

    Args:
      inputs_embeds: [B, S, D] merged (visual + text) embeddings.
      positions: [B, S] rope positions.
      key_mask: optional [B, S] padding mask (1 = real token).
    Returns:
      (hidden [B, S, D] final-norm output, KVCache with [L, B, S, KH, Dh]).

    Single-chip TPU batches run row-serial via ``lax.map``: at B >= 2 XLA
    switches the layer projections to a batch-in-sublanes convolution
    emitter whose operand relayouts (per-layer weight copies at ~1/10th of
    HBM speed) and unfused norm intermediates cost ~20% of the scan
    (profiled at B=8/S=608/full depth: 501 ms batched vs 427 ms mapped,
    62.6 -> 53.4 ms/row).  Mapping over rows re-runs the B=1 program —
    the fusion structure the rest of the engine is tuned for — at the
    price of one [B,L,S,KH,D]->[L,B,S,KH,D] KV transpose.  Mesh (GSPMD)
    and CPU runs keep the batched program: a scan over a sharded batch
    axis would force gathers, and XLA:CPU does not exhibit the relayout
    pathology.
    """
    B = inputs_embeds.shape[0]
    if B > 1 and jax.default_backend() == "tpu" and jax.device_count() == 1:
        if key_mask is None:

            def one(args):
                xb, pb = args
                h, kv = _prefill_batched(params, cfg, xb[None], pb[None], None, w8a8)
                return h[0], kv.k[:, 0], kv.v[:, 0]

            h, ks, vs = jax.lax.map(one, (inputs_embeds, positions))
        else:

            def one(args):
                xb, pb, kb = args
                h, kv = _prefill_batched(
                    params, cfg, xb[None], pb[None], kb[None], w8a8
                )
                return h[0], kv.k[:, 0], kv.v[:, 0]

            h, ks, vs = jax.lax.map(one, (inputs_embeds, positions, key_mask))
        return h, KVCache(jnp.moveaxis(ks, 0, 1), jnp.moveaxis(vs, 0, 1))
    return _prefill_batched(params, cfg, inputs_embeds, positions, key_mask, w8a8)


def _prefill_batched(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    key_mask: jax.Array | None = None,
    w8a8: bool = False,
):
    B, S, D = inputs_embeds.shape
    H, KH, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = rotary_embedding(positions, Dh, cfg.rope_theta)  # [B, S, Dh]
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]  # broadcast over heads

    # Long sequences (LLaVA-NeXT multi-tile) avoid materializing
    # [B, H, S, S] scores in HBM (SURVEY.md §7 hard part #5).  On TPU the
    # Pallas flash kernel is the fast path (0.98 ms/layer at S=3k on v5e
    # vs 4.3 ms for query-chunked XLA — ops/pallas_attention.py header);
    # other backends (the CPU test mesh) use the backend-agnostic
    # query-chunked attention.  Short prefills stay dense, which XLA
    # fuses well.  Backend choice happens at trace time.
    use_long = S >= 1024
    use_flash = use_long and jax.default_backend() == "tpu"

    def _attend(q, k, v):
        if use_flash:
            from ..ops.pallas_attention import flash_prefill_attention

            return flash_prefill_attention(q, k, v, key_mask, causal=True)
        if use_long:
            from ..ops.attention import chunked_prefill_attention

            return chunked_prefill_attention(q, k, v, key_mask, causal=True)
        return prefill_attention(q, k, v, causal=True, key_mask=key_mask)

    mm = _mm_w8a8 if w8a8 else _mm  # w8a8: int8-MXU projections (prefill only)
    layers_rest, int4_stacks = (
        _split_int4_stacks(params["layers"])
        if _layered_int4_enabled()
        else (params["layers"], {})
    )

    def layer(x, lp, mml):
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, h, mml, H, KH, Dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = _attend(q, k, v)
        attn = attn.reshape(B, S, H * Dh)
        x = x + mml(attn, lp["o_proj"])
        h2 = rms_norm(x, lp["post_attn_ln"], cfg.rms_norm_eps)
        x = x + _mlp(lp, h2, mml)
        return x, (k, v)

    def scanned(carry, xs):
        lp, li = xs
        if int4_stacks:
            return layer(
                carry,
                _with_sentinels(lp, int4_stacks),
                _layered_mm(mm, int4_stacks, li),
            )
        return layer(carry, lp, mm)

    L = layers_rest["input_ln"].shape[0]
    x, (ks, vs) = jax.lax.scan(
        scanned, inputs_embeds, (layers_rest, jnp.arange(L, dtype=jnp.int32))
    )
    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return hidden, KVCache(ks, vs)


def prefill_extend(
    params: dict,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    prefix: KVCache,
    w8a8: bool = False,
    prefix_mask=None,
):
    """Continued causal prefill over a shared prefix KV (prefix caching).

    Forward T new tokens that attend to a fully-visible prefix plus
    causally to themselves — numerically identical to prefilling
    [prefix + tail] in one pass (causal attention factorizes), but the
    prefix tower runs ONCE per image instead of once per question
    (ops/attention.extend_attention; reference pope_test.py:239-242
    re-prefills the whole merged prompt per question).

    Args:
      inputs_embeds: [B, T, D] tail embeddings.
      positions: [B, T] ABSOLUTE rope positions (prefix_len + arange(T)).
      prefix: KVCache with [L, Bp, P, KH, Dh] dense leaves OR the int8
        decode layout ({"q": [L, Bp, P, KH*D], "s": [L, Bp, KH, P]}) —
        the deployment config's prefix caches / chunked buffers /
        speculative verify read the quantized prefix directly
        (ops.attention.extend_attention_int8prefix).  Bp in {1, B};
        Bp=1 broadcasts one image's prefix across all question rows with
        no copy.
      prefix_mask: optional [Bp, P] bool validity — False = padding slot
        inside a static-padded prefix (LLaVA-NeXT anyres prefixes).
    Returns:
      (hidden [B, T, D] final-norm output, tail KVCache [L, B, T, KH, Dh]).
    """
    from ..ops.attention import extend_attention, extend_attention_int8prefix

    B, T, D = inputs_embeds.shape
    H, KH, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = rotary_embedding(positions, Dh, cfg.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    mm = _mm_w8a8 if w8a8 else _mm
    quantized_prefix = isinstance(prefix.k, dict)
    layers_rest, int4_stacks = (
        _split_int4_stacks(params["layers"])
        if _layered_int4_enabled()
        else (params["layers"], {})
    )

    def layer(x, xs):
        lp, li, pk, pv = xs
        if int4_stacks:
            lp = _with_sentinels(lp, int4_stacks)
            mml = _layered_mm(mm, int4_stacks, li)
        else:
            mml = mm
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, h, mml, H, KH, Dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if quantized_prefix:
            Bp, P = pk["q"].shape[0], pk["q"].shape[1]
            attn = extend_attention_int8prefix(
                q, k, v,
                pk["q"].reshape(Bp, P, KH, Dh), pk["s"],
                pv["q"].reshape(Bp, P, KH, Dh), pv["s"],
                prefix_mask,
            )
        else:
            attn = extend_attention(q, k, v, pk, pv, prefix_mask)
        x = x + mml(attn.reshape(B, T, H * Dh), lp["o_proj"])
        h2 = rms_norm(x, lp["post_attn_ln"], cfg.rms_norm_eps)
        return x + _mlp(lp, h2, mml), (k, v)

    L = layers_rest["input_ln"].shape[0]
    x, (ks, vs) = jax.lax.scan(
        layer,
        inputs_embeds,
        (layers_rest, jnp.arange(L, dtype=jnp.int32), prefix.k, prefix.v),
    )
    return rms_norm(x, params["norm"], cfg.rms_norm_eps), KVCache(ks, vs)


def _tp_attend(fn, mesh, arg_kinds):
    """Head-parallel shard_map wrapper for the ensemble decode attention
    ops (XLA or fused Pallas): under TP the cache's KH axis and q's H axis
    are sharded on "model" (parallel/mesh.py), attention is embarrassingly
    head-parallel (softmax runs over the UNSHARDED S axis), so each shard
    computes its local heads with zero collectives.  This is also the
    GSPMD escape hatch for pl.pallas_call, which has no partitioning rule:
    inside shard_map the kernel sees local per-device shapes.

    ``arg_kinds``: one char per operand — 'h' = [B, ., heads, .] (q, cache
    int8/dense leaves, new-token K/V), 's' = [B, KH, S] scale leaves
    (head axis at dim 1), 'm' = the [B, M, S] mask, replicated over
    "model"."""
    from jax.sharding import PartitionSpec as P

    kind = {
        "h": P("data", None, "model", None),
        "s": P("data", "model", None),
        "m": P("data", None, None),
    }
    in_specs = tuple(kind[k] for k in arg_kinds)

    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=kind["h"], check_vma=False
    )


def decode_step(
    params: dict,
    cfg: LlamaConfig,
    x: jax.Array,
    position: jax.Array,
    cache: KVCache,
    key_mask: jax.Array,
    tp_mesh=None,
    w8a8: bool = False,
):
    """One-token forward for M ensemble members sharing the canonical cache.

    Args:
      x: [B, M, D] current-token embeddings (same token replicated across
        members — they differ only in attention mask, reference
        llava.py:340-359).
      position: [B] rope position of the current token.
      cache: canonical KVCache ([L, B, Smax, KH, Dh]).
      key_mask: [B, M, Smax] per-member cache-slot mask (0 = dropped visual
        token or beyond current length).
      tp_mesh: optional ("data", "model") Mesh when params/cache are
        TP-sharded (parallel/mesh.py): attention runs head-parallel under
        shard_map, which keeps the fused Pallas kernels eligible on
        multi-device runs (a bare pallas_call has no GSPMD rule).
      w8a8: int8-MXU projection feed (s8 x s8 -> s32), the decode-side
        counterpart of the w8a8 prefill mode.  At B=1 decode is HBM-bound
        and this gains nothing, but at the large-batch configs the
        B*M-row projections are MXU-COMPUTE-bound (>~100 rows is the
        bf16 crossover for int8 weights: 2*P*R/164e12 > P/819e9), so the
        int8 MXU's ~1.6x rate is step time off the top.  Drift (which
        accumulates across steps, unlike prefill) is measured by
        cli/fused_gap.py --study w8a8decode.
    Returns:
      (hidden [B, M, D], k_new [L, B, M, KH, Dh], v_new [L, B, M, KH, Dh])
    """
    B, M, D = x.shape
    H, KH, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = rotary_embedding(position, Dh, cfg.rope_theta)  # [B, Dh]
    cos, sin = cos[:, None, None, :], sin[:, None, None, :]  # [B,1,1,Dh]

    quantized = cache_is_quantized(cache)
    # Without a tp_mesh, the fused Pallas kernels are gated to
    # single-device execution: under the documented TP path
    # (parallel/mesh.py NamedSharding inputs, KV heads sharded on
    # "model") a bare pl.pallas_call inside the GSPMD-partitioned program
    # would fail to compile or force full replication.  With a
    # tp_mesh the shard_map wrapper below restores eligibility (local
    # shapes per shard); head/batch counts must divide the mesh.
    single_device = jax.device_count() == 1
    tp_sharded = (
        tp_mesh is not None
        and KH % tp_mesh.shape["model"] == 0
        and H % tp_mesh.shape["model"] == 0
        and B % tp_mesh.shape["data"] == 0
    )
    if tp_sharded:
        nm = tp_mesh.shape["model"]
        H_l, KH_l = H // nm, KH // nm  # local head counts per shard
    else:
        H_l, KH_l = H, KH
    Smax = (cache.k["q"] if quantized else cache.k).shape[2]
    bf16_cache = (not quantized) and cache.k.dtype == jnp.bfloat16

    from ..ops.attention import ensemble_decode_attention_int8kv
    from ..ops.pallas_decode_attention import layered_supported

    # Preferred single-device int8 path: the LAYERED Pallas kernel reads
    # layer l's [B, S, KH*D] panel straight out of the full cache in HBM
    # via scalar-prefetch block indexing, so the per-layer cache slice
    # that the scan-over-slices structure materializes (a read+write copy
    # of both K and V, profiled at 2 x 57 us/layer on the batch-16 LLaVA
    # stretch config) never exists — and the score/softmax/PV chain stays
    # in VMEM.  Measured per layer: 133-218 us at the MHA stretch shape
    # vs the in-program XLA chain's ~395 us (incl. its slice copies), and
    # 176 us at the GQA LLaVA-NeXT serving shape vs the sliced kernel's
    # 117 us + ~133 us slice copies.  The gate is int8-only because only
    # the int8 cache stores "q" head-flattened ([L,B,S,KH*D]) — for the
    # 5-D dense cache the kernel-side reshape would RETILE the whole
    # cache every step (profiled at 2 x 4.9 ms/step), so bf16 keeps the
    # sliced fused kernel.  fp32 caches (bit-parity runs) and tiny test
    # head dims keep the XLA ops; TP meshes keep the sliced shard_map
    # path (the full-cache operand would have to be re-gathered per
    # shard).
    use_layered = (
        single_device
        and quantized
        and layered_supported(Smax, Dh)
        # like fused_ok below: the Pallas kernels compute in bf16 —
        # fp32-activation parity runs take the XLA op instead
        and x.dtype == jnp.bfloat16
    )
    fused_ok = (
        not use_layered
        and (single_device or tp_sharded)
        and H_l // KH_l > 1
        and Dh % 128 == 0
        # the int8 fused kernel computes in bf16 internally; fp32
        # activations (bit-parity runs) must fall back to the XLA op
        # rather than silently losing mantissa in the kernel's astype
        and x.dtype == jnp.bfloat16
    )
    if quantized and not use_layered:
        if fused_ok:
            # GQA under TP (or shapes the layered gate rejects): the XLA
            # path's repeat_kv materializes an n_rep-times bf16 copy of
            # the int8 cache per step; the sliced Pallas kernel streams
            # the int8 cache once per (row, layer).  At KH == H its
            # (B, KH)-cell geometry loses to XLA's batched GEMV, so only
            # GQA dispatches here (ops/pallas_decode_attention.py header).
            from ..ops.pallas_decode_attention import (
                ensemble_decode_attention_int8kv_fused,
            )

            def _int8_attend(*a):
                return jax.lax.platform_dependent(
                    *a,
                    tpu=ensemble_decode_attention_int8kv_fused,
                    default=ensemble_decode_attention_int8kv,
                )

            if tp_sharded:
                _int8_attend = _tp_attend(_int8_attend, tp_mesh, "hhshshhm")
        else:
            _int8_attend = ensemble_decode_attention_int8kv

    if bf16_cache and not use_layered and fused_ok:
        # same repeat_kv expansion waste on the dense-cache path (measured
        # 2679 us vs a 133 us read floor at the LLaVA-NeXT serving shape,
        # 288 vs 17 us even at B=1 M=4)
        from ..ops.pallas_decode_attention import (
            ensemble_decode_attention_fused,
        )

        def _dense_attend(*a):
            return jax.lax.platform_dependent(
                *a,
                tpu=ensemble_decode_attention_fused,
                default=ensemble_decode_attention,
            )

        if tp_sharded:
            _dense_attend = _tp_attend(_dense_attend, tp_mesh, "hhhhhm")
    else:
        _dense_attend = ensemble_decode_attention

    if use_layered:
        from ..ops.pallas_decode_attention import (
            ensemble_decode_attention_int8kv_layered,
        )

        def _pallas_layered(li, q, k, v):
            return ensemble_decode_attention_int8kv_layered(
                li, q, cache.k["q"], cache.k["s"],
                cache.v["q"], cache.v["s"], k, v, key_mask,
            )

        # non-TPU backends (CPU tests) run the same layer-indexed
        # structure through the XLA op on a dynamic slice of the full
        # cache — identical numerics, no Pallas (the [B,S,KH*D] ->
        # [B,S,KH,D] reshape is free outside TPU tiling)
        def _xla_layered(li, q, k, v):
            idx = lambda a: jax.lax.dynamic_index_in_dim(
                a, li, 0, keepdims=False
            )
            return ensemble_decode_attention_int8kv(
                q,
                idx(cache.k["q"]).reshape(B, Smax, KH, Dh),
                idx(cache.k["s"]),
                idx(cache.v["q"]).reshape(B, Smax, KH, Dh),
                idx(cache.v["s"]),
                k,
                v,
                key_mask,
            )

        def _attend_layered(li, q, k, v):
            return jax.lax.platform_dependent(
                li, q, k, v, tpu=_pallas_layered, default=_xla_layered
            )

    mm = _mm_w8a8 if w8a8 else _mm
    # int4 towers on a single device dispatch their projections through
    # the LAYERED Pallas matmul (full packed stack in HBM, scalar-prefetch
    # layer indexing) instead of scan-sliced leaves — see _LayeredInt4.
    layers_rest, int4_stacks = (
        _split_int4_stacks(params["layers"])
        if _layered_int4_enabled()
        else (params["layers"], {})
    )

    def _layer_math(lp, xc, attend, mml=mm):
        h = rms_norm(xc, lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, h, mml, H, KH, Dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = attend(q, k, v).reshape(B, M, H * Dh)
        xc = xc + mml(attn, lp["o_proj"])
        h2 = rms_norm(xc, lp["post_attn_ln"], cfg.rms_norm_eps)
        xc = xc + _mlp(lp, h2, mml)
        return xc, (k, v)

    L = (cache.k["q"] if quantized else cache.k).shape[0]

    if use_layered:

        def layer(xc, scanned):
            lp, li = scanned
            if int4_stacks:
                lp = _with_sentinels(lp, int4_stacks)
            return _layer_math(
                lp,
                xc,
                lambda q, k, v: _attend_layered(li, q, k, v),
                _layered_mm(mm, int4_stacks, li) if int4_stacks else mm,
            )

        xs = (layers_rest, jnp.arange(L, dtype=jnp.int32))
    else:

        def layer(xc, scanned):
            lp, li, kc, vc = scanned

            def attend(q, k, v):
                if quantized:
                    return _int8_attend(
                        q,
                        kc["q"].reshape(B, Smax, KH, Dh),
                        kc["s"],
                        vc["q"].reshape(B, Smax, KH, Dh),
                        vc["s"],
                        k,
                        v,
                        key_mask,
                    )
                return _dense_attend(q, kc, vc, k, v, key_mask)

            if int4_stacks:
                lp = _with_sentinels(lp, int4_stacks)
            return _layer_math(
                lp,
                xc,
                attend,
                _layered_mm(mm, int4_stacks, li) if int4_stacks else mm,
            )

        xs = (layers_rest, jnp.arange(L, dtype=jnp.int32), cache.k, cache.v)

    xf, (k_new, v_new) = jax.lax.scan(layer, x, xs)
    hidden = rms_norm(xf, params["norm"], cfg.rms_norm_eps)
    return hidden, k_new, v_new


def decode_step_attn(
    params: dict,
    cfg: LlamaConfig,
    x: jax.Array,
    position: jax.Array,
    cache: KVCache,
    key_mask: jax.Array,
):
    """One-token forward that ALSO returns the new token's self-attention
    probabilities — the capture OPERA's over-trust penalty needs
    (engine/opera.py; the reference reaches OPERA via `output_attentions=
    True` generate kwargs, chair_test.py:312-323).

    Plain XLA formulation (no member axis, no Pallas): OPERA is a
    baseline decoding method, and its candidate fan-out runs as extra
    batch rows, which XLA's batched GEMV handles well at beam-search
    widths.

    Args:
      x: [B, D] current-token embeddings (B = flattened beams x
        attention candidates).
      position: [B] rope position of the current token.
      cache: canonical KVCache, dense [L, B, S, KH, Dh] or int8
        ({"q" [L,B,S,KH*D], "s" [L,B,KH,S]}).
      key_mask: [B, S] cache-slot mask (True = attend).
    Returns:
      (hidden [B, D], k_new [L, B, KH, Dh], v_new [L, B, KH, Dh],
       attn [B, S]): attn is the LAST layer's head-mean attention of the
      current token over cache slots (softmax includes the token's
      self-score; the self column is not part of the returned row).
    """
    B, D = x.shape
    H, KH, Dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    n_rep = H // KH
    cos, sin = rotary_embedding(position, Dh, cfg.rope_theta)  # [B, Dh]
    cos, sin = cos[:, None, None, :], sin[:, None, None, :]
    quantized = cache_is_quantized(cache)
    Smax = (cache.k["q"] if quantized else cache.k).shape[2]
    scale = 1.0 / jnp.sqrt(jnp.float32(Dh))

    def attend(q, kc, vc, ksc, vsc, k_new, v_new):
        # q [B,1,H,Dh]; kc/vc [B,S,KH,Dh]; ksc/vsc [B,KH,S] or None
        kr = jnp.repeat(kc, n_rep, axis=2) if n_rep > 1 else kc
        vr = jnp.repeat(vc, n_rep, axis=2) if n_rep > 1 else vc
        scores = (
            jnp.einsum(
                "bmhd,bshd->bmhs", q, kr.astype(q.dtype),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        if ksc is not None:
            ksr = jnp.repeat(ksc, n_rep, axis=1) if n_rep > 1 else ksc
            scores = scores * ksr[:, None]  # [B,1,H,S]
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
        self_s = (
            jnp.einsum(
                "bmhd,bmhd->bmh", q, jnp.repeat(k_new, n_rep, axis=2)
                if n_rep > 1 else k_new,
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        m = jnp.maximum(jnp.max(scores, -1), self_s)  # [B,1,H]
        e = jnp.exp(scores - m[..., None])
        e_self = jnp.exp(self_s - m)
        denom = jnp.sum(e, -1) + e_self  # [B,1,H]
        probs = e / denom[..., None]  # [B,1,H,S]
        p_self = e_self / denom
        pv = probs.astype(q.dtype)
        if vsc is not None:
            vsr = jnp.repeat(vsc, n_rep, axis=1) if n_rep > 1 else vsc
            pv = pv * vsr[:, None].astype(q.dtype)
        out = jnp.einsum("bmhs,bshd->bmhd", pv, vr.astype(q.dtype))
        out = out + p_self[..., None].astype(q.dtype) * (
            jnp.repeat(v_new, n_rep, axis=2) if n_rep > 1 else v_new
        )
        return out, probs.mean(axis=2)[:, 0]  # [B,1,H,Dh], [B,1? -> B,S]

    layers_rest, int4_stacks = (
        _split_int4_stacks(params["layers"])
        if _layered_int4_enabled()
        else (params["layers"], {})
    )

    def layer(xc, scanned):
        lp, li, kc_l, vc_l = scanned
        if int4_stacks:
            lp = _with_sentinels(lp, int4_stacks)
            mml = _layered_mm(_mm, int4_stacks, li)
        else:
            mml = _mm
        h = rms_norm(xc[:, None], lp["input_ln"], cfg.rms_norm_eps)
        q, k, v = _qkv(lp, h, mml, H, KH, Dh)  # [B,1,H,Dh]/[B,1,KH,Dh]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if quantized:
            kc = kc_l["q"].reshape(B, Smax, KH, Dh)
            vc = vc_l["q"].reshape(B, Smax, KH, Dh)
            ksc, vsc = kc_l["s"], vc_l["s"]
        else:
            kc, vc, ksc, vsc = kc_l, vc_l, None, None
        attn_out, probs = attend(q, kc, vc, ksc, vsc, k, v)
        xc = xc + mml(attn_out.reshape(B, H * Dh), lp["o_proj"])
        h2 = rms_norm(xc[:, None], lp["post_attn_ln"], cfg.rms_norm_eps)
        xc = xc + _mlp(lp, h2, mml)[:, 0]
        return xc, (k[:, 0], v[:, 0], probs)

    L = layers_rest["input_ln"].shape[0]
    xs = (layers_rest, jnp.arange(L, dtype=jnp.int32), cache.k, cache.v)
    xf, (k_new, v_new, probs_all) = jax.lax.scan(layer, x, xs)
    hidden = rms_norm(xf, params["norm"], cfg.rms_norm_eps)
    return hidden, k_new, v_new, probs_all[-1]
