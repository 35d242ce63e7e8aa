"""Attention ops for prefill and ensemble decode.

Two shapes of the same computation:

- ``prefill_attention``: causal self-attention over the merged
  (visual + text) sequence.  Dense scores; XLA fuses the softmax chain.
  Sequence lengths are <= ~3k (LLaVA-NeXT multi-tile), so an S^2 score
  tile per head is fine on-chip; a Pallas blockwise variant lives in
  ops/pallas_attention.py for the long-sequence path.

- ``ensemble_decode_attention``: THE core TPU trick (SURVEY.md §7).  The
  reference runs K+1 sequential torch forwards per generated token, each on
  a ``copy.deepcopy`` of the whole KV cache (reference llava.py:292,343).
  Here all members read the *same* canonical cache (read-only prefix) and
  carry only their own current-token K/V separately, so the ensemble is one
  batched matvec against the cache — zero cache copies.  Per-member
  visual-token dropout enters as a key-position mask over cache slots.

All softmax accumulation in fp32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large-negative in fp32; avoids NaN from (-inf) - (-inf)


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[..., S, KH, D] -> [..., S, KH*n_rep, D] (GQA head expansion)."""
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=-2)


def prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    key_mask: jax.Array | None = None,
) -> jax.Array:
    """Dense multi-head attention.

    Args:
      q: [B, S, H, D]
      k, v: [B, S, KH, D] (KH divides H)
      key_mask: optional [B, S] (1 = attend) padding/dropout mask over keys.
    Returns:
      [B, S, H, D]
    """
    B, S, H, D = q.shape
    KH = k.shape[2]
    k = repeat_kv(k, H // KH)
    v = repeat_kv(v, H // KH)
    scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)
    scores = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    if causal:
        qi = jnp.arange(S)[:, None]
        ki = jnp.arange(S)[None, :]
        scores = jnp.where((ki <= qi)[None, None], scores, _NEG_INF)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :].astype(bool), scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def ensemble_decode_attention_int8kv(
    q: jax.Array,
    kq: jax.Array,
    ks: jax.Array,
    vq: jax.Array,
    vs: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    key_mask: jax.Array,
) -> jax.Array:
    """ensemble_decode_attention over an int8-quantized cache
    (utils/quantize.quantize_kv layout).

    Dequantization never materializes a bf16 cache copy: per-key scales
    fold into the score AFTER the int8->bf16 dot (score_s *= ks_s), and
    per-value scales fold into the probabilities BEFORE the PV dot
    (p_s *= vs_s) — so the HBM stream is the int8 cache + tiny scales.
    Numerics validated in tests/test_quantize.py.

    Args:
      q: [B, M, H, D]; kq/vq: [B, S, KH, D] int8; ks/vs: [B, KH, S] f32
      (the cache's stored scale layout, models/llama.KVCache);
      k_new/v_new: [B, M, KH, D] (unquantized current token);
      key_mask: [B, M, S].
    """
    B, M, H, D = q.shape
    KH = kq.shape[2]
    n_rep = H // KH
    kc = repeat_kv(kq.astype(q.dtype), n_rep)  # int8 -> activation dtype
    vc = repeat_kv(vq.astype(q.dtype), n_rep)
    ksr = jnp.repeat(ks, n_rep, axis=1) if n_rep > 1 else ks  # [B, H, S]
    vsr = jnp.repeat(vs, n_rep, axis=1) if n_rep > 1 else vs
    kn = repeat_kv(k_new, n_rep)
    vn = repeat_kv(v_new, n_rep)

    scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)
    cache_scores = (
        jnp.einsum("bmhd,bshd->bmhs", q, kc, preferred_element_type=jnp.float32)
        * scale
    )
    cache_scores = cache_scores * ksr[:, None]  # fold k scales [B,1,H,S]
    cache_scores = jnp.where(
        key_mask[:, :, None, :].astype(bool), cache_scores, _NEG_INF
    )
    self_scores = (
        jnp.einsum("bmhd,bmhd->bmh", q, kn, preferred_element_type=jnp.float32)
        * scale
    )[..., None]
    all_scores = jnp.concatenate([cache_scores, self_scores], axis=-1)
    probs = jax.nn.softmax(all_scores, axis=-1)
    cache_probs = probs[..., :-1] * vsr[:, None]  # fold v scales [B,1,H,S]
    out = jnp.einsum(
        "bmhs,bshd->bmhd",
        cache_probs.astype(vc.dtype),
        vc,
        preferred_element_type=jnp.float32,
    )
    out = out + probs[..., -1:].astype(jnp.float32) * vn.astype(jnp.float32)
    return out.astype(q.dtype)


def chunked_prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: jax.Array | None = None,
    *,
    causal: bool = True,
    chunk: int = 256,
) -> jax.Array:
    """Query-chunked causal attention via ``lax.map``.

    Same results as ``prefill_attention`` but the score tensor exists only
    as a [B, H, chunk, S] transient (~100 MB at LLaVA-NeXT scale instead of
    the ~1.1 GB dense [B, H, S, S]).  Measured FASTER than dense at S≈3k on
    v5e (better HBM locality), and unlike a hand-written kernel it runs on
    every backend.  Used by models/llama.prefill for S >= 1024.
    """
    B, S, H, D = q.shape
    KH = k.shape[2]
    kf = repeat_kv(k, H // KH)
    vf = repeat_kv(v, H // KH)
    Sp = ((S + chunk - 1) // chunk) * chunk
    qp = jnp.pad(q, ((0, 0), (0, Sp - S), (0, 0), (0, 0)))
    scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)
    km = (
        key_mask[:, None, None, :].astype(bool)
        if key_mask is not None
        else jnp.ones((B, 1, 1, S), bool)
    )

    def one(ci):
        qc = jax.lax.dynamic_slice_in_dim(qp, ci * chunk, chunk, axis=1)
        s = (
            jnp.einsum("bqhd,bkhd->bhqk", qc, kf, preferred_element_type=jnp.float32)
            * scale
        )
        ok = km
        if causal:
            qi = ci * chunk + jnp.arange(chunk)[:, None]
            ki = jnp.arange(S)[None, :]
            ok = ok & (ki <= qi)[None, None]
        s = jnp.where(ok, s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", p.astype(vf.dtype), vf,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    outs = jax.lax.map(one, jnp.arange(Sp // chunk))  # [n, B, chunk, H, D]
    out = outs.transpose(1, 0, 2, 3, 4).reshape(B, Sp, H, D)
    return out[:, :S]


def ensemble_decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    key_mask: jax.Array,
) -> jax.Array:
    """Single-token decode attention for M ensemble members sharing one cache.

    Member m's context = cache slots where key_mask[b, m, s] = 1, plus its
    own current token (always attended, mirroring the reference where the
    new token's position is beyond the image span and the generate loop's
    mask extends with ones).

    Args:
      q: [B, M, H, D] current-token queries per member.
      k_cache, v_cache: [B, Smax, KH, D] canonical cache (shared, read-only).
      k_new, v_new: [B, M, KH, D] members' own current-token K/V.
      key_mask: [B, M, Smax] 1 = attend to that cache slot (0 beyond
        cache_len and at dropped visual tokens).
    Returns:
      [B, M, H, D] attention outputs.
    """
    B, M, H, D = q.shape
    KH = k_cache.shape[2]
    n_rep = H // KH
    kc = repeat_kv(k_cache, n_rep)  # [B, S, H, D]
    vc = repeat_kv(v_cache, n_rep)
    kn = repeat_kv(k_new, n_rep)  # [B, M, H, D]
    vn = repeat_kv(v_new, n_rep)

    scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)
    # Scores against the shared cache: batched over members.
    cache_scores = (
        jnp.einsum("bmhd,bshd->bmhs", q, kc, preferred_element_type=jnp.float32)
        * scale
    )  # [B, M, H, S]
    cache_scores = jnp.where(
        key_mask[:, :, None, :].astype(bool), cache_scores, _NEG_INF
    )
    # Score against the member's own new token (always attended).
    self_scores = (
        jnp.einsum("bmhd,bmhd->bmh", q, kn, preferred_element_type=jnp.float32)
        * scale
    )[..., None]  # [B, M, H, 1]

    all_scores = jnp.concatenate([cache_scores, self_scores], axis=-1)
    probs = jax.nn.softmax(all_scores, axis=-1)
    cache_probs = probs[..., :-1].astype(vc.dtype)
    self_probs = probs[..., -1:].astype(vn.dtype)

    out = jnp.einsum(
        "bmhs,bshd->bmhd", cache_probs, vc, preferred_element_type=jnp.float32
    )
    out = out + self_probs * vn.astype(jnp.float32)
    return out.astype(q.dtype)


def extend_attention(
    q: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    k_prefix: jax.Array,
    v_prefix: jax.Array,
    prefix_mask: jax.Array | None = None,
) -> jax.Array:
    """Continued-prefill attention: T new queries attend to a fully-visible
    shared prefix plus causally to themselves (prefix caching — the POPE
    workload asks ~6 questions per image whose merged prompts share the
    ~580-token image prefix; reference pope_test.py:239-242 re-prefills it
    per question).

    Args:
      q: [B, T, H, D] (rope already applied at absolute positions P..P+T)
      k_new, v_new: [B, T, KH, D]
      k_prefix, v_prefix: [Bp, P, KH, D] with Bp in {1, B} — Bp=1 shares
        one prefix across all rows WITHOUT a [B, P, ...] copy (the einsum
        contracts the un-batched prefix directly).
      prefix_mask: optional [Bp, P] bool — False slots are padding inside
        the prefix (LLaVA-NeXT prefixes are static-padded past the real
        anyres token count) and are masked out of the softmax.
    Returns:
      [B, T, H, D]
    """
    B, T, H, D = q.shape
    KH = k_new.shape[2]
    n = H // KH
    scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)
    qg = q.reshape(B, T, KH, n, D)

    if k_prefix.shape[0] == 1:
        sp = jnp.einsum(
            "btknd,pkd->btknp", qg, k_prefix[0],
            preferred_element_type=jnp.float32,
        )
    else:
        sp = jnp.einsum(
            "btknd,bpkd->btknp", qg, k_prefix,
            preferred_element_type=jnp.float32,
        )
    if prefix_mask is not None:
        # [Bp, P] -> broadcast over (T, KH, n); Bp=1 broadcasts over B
        pm = prefix_mask[:, None, None, None, :]
        sp = jnp.where(pm, sp, _NEG_INF)
    st = jnp.einsum(
        "btknd,bskd->btkns", qg, k_new, preferred_element_type=jnp.float32
    )
    qi = jnp.arange(T)[:, None]
    si = jnp.arange(T)[None, :]
    st = jnp.where((si <= qi)[None, :, None, None, :], st, _NEG_INF)
    scores = jnp.concatenate([sp, st], axis=-1) * scale  # [B,T,KH,n,P+T]
    probs = jax.nn.softmax(scores, axis=-1)
    P = k_prefix.shape[1]
    pp, pt = probs[..., :P], probs[..., P:]
    if v_prefix.shape[0] == 1:
        out = jnp.einsum(
            "btknp,pkd->btknd", pp.astype(v_prefix.dtype), v_prefix[0],
            preferred_element_type=jnp.float32,
        )
    else:
        out = jnp.einsum(
            "btknp,bpkd->btknd", pp.astype(v_prefix.dtype), v_prefix,
            preferred_element_type=jnp.float32,
        )
    out = out + jnp.einsum(
        "btkns,bskd->btknd", pt.astype(v_new.dtype), v_new,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, H, D).astype(q.dtype)


def extend_attention_int8prefix(
    q: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    kq: jax.Array,
    ks: jax.Array,
    vq: jax.Array,
    vs: jax.Array,
    prefix_mask: jax.Array | None = None,
) -> jax.Array:
    """``extend_attention`` over an int8-quantized prefix (the KVCache
    decode layout) — lets the DEPLOYMENT config (int8 KV) run
    prefix-cached probes, chunked buffers, and the speculative verify
    without a dense prefix copy.  Scale folding mirrors
    ensemble_decode_attention_int8kv: per-key scales fold into the score
    after the int8->activation dot, per-value scales into the
    probabilities before the PV dot.

    Args:
      q: [B, T, H, D]; k_new/v_new: [B, T, KH, D] (unquantized chunk);
      kq/vq: [Bp, P, KH, D] int8; ks/vs: [Bp, KH, P] f32;
      prefix_mask: optional [Bp, P] bool (False = pad/invalid slot).
    Returns: [B, T, H, D].
    """
    B, T, H, D = q.shape
    KH = k_new.shape[2]
    n = H // KH
    scale = 1.0 / jnp.sqrt(D).astype(jnp.float32)
    qg = q.reshape(B, T, KH, n, D)

    kp = kq.astype(q.dtype)
    # ks/vs arrive in the cache layout [Bp, KH, P]; fold as [Bp,1,KH,1,P]
    # against the [B, T, KH, n, P] scores
    if kq.shape[0] == 1:
        sp = jnp.einsum(
            "btknd,pkd->btknp", qg, kp[0],
            preferred_element_type=jnp.float32,
        )
        sp = sp * ks[0][None, None, :, None, :]
    else:
        sp = jnp.einsum(
            "btknd,bpkd->btknp", qg, kp,
            preferred_element_type=jnp.float32,
        )
        sp = sp * ks[:, None, :, None, :]
    if prefix_mask is not None:
        pm = prefix_mask[:, None, None, None, :]
        sp = jnp.where(pm, sp, _NEG_INF)
    st = jnp.einsum(
        "btknd,bskd->btkns", qg, k_new, preferred_element_type=jnp.float32
    )
    qi = jnp.arange(T)[:, None]
    si = jnp.arange(T)[None, :]
    st = jnp.where((si <= qi)[None, :, None, None, :], st, _NEG_INF)
    scores = jnp.concatenate([sp, st], axis=-1) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    P = kq.shape[1]
    pp, pt = probs[..., :P], probs[..., P:]
    # fold value scales into the probabilities, then one int8->bf16 dot
    if vq.shape[0] == 1:
        ppv = pp * vs[0][None, None, :, None, :]
        out = jnp.einsum(
            "btknp,pkd->btknd", ppv.astype(q.dtype), vq[0].astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        ppv = pp * vs[:, None, :, None, :]
        out = jnp.einsum(
            "btknp,bpkd->btknd", ppv.astype(q.dtype), vq.astype(q.dtype),
            preferred_element_type=jnp.float32,
        )
    out = out + jnp.einsum(
        "btkns,bskd->btknd", pt.astype(v_new.dtype), v_new,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, H, D).astype(q.dtype)
