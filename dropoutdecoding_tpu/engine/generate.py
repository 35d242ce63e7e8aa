"""The inference engine: fused prefill + single-program ensemble decode.

This is the TPU-native replacement for the reference's hot path
(SURVEY.md §3.1): per generated token the reference runs K+1 *sequential*
HF Llama forwards plus two full-KV ``copy.deepcopy``s and Python mask loops
(reference llava.py:292-361).  Here one decode step is ONE compiled XLA
program that:

  1. runs the unmasked forward of the current token against the canonical
     KV cache (ensemble member axis M=1);
  2. derives the overlap keep-set from the unmasked argmax and samples the
     K members' dropout masks from the prefill-time epistemic uncertainty
     (decoding/masks.py) — the masks are key-position masks over the cache,
     never materialized as S^2 score masks;
  3. runs all K masked members as ONE batched forward (member axis) that
     *shares* the canonical cache read-only (ops/attention.
     ensemble_decode_attention) — the winner-KV-carry equivalence proved in
     SURVEY.md §7 makes this exactly the reference's deepcopy semantics;
  4. aggregates by majority vote / logit averaging and scatters only the
     winner's new-token K/V into the canonical cache.

The whole generation loop is a ``lax.while_loop`` under jit: zero host
round-trips from prompt to final token.
"""
from __future__ import annotations


import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding.aggregate import select_by_average, select_by_vote
from ..decoding.masks import build_member_drop_mask, overlap_keep_mask
from ..models import llama as llama_mod
from ..models import llava as llava_mod
from ..models.llama import KVCache
from ..ops.uncertainty import (
    exact_top_k_ids,
    lowest_percent_kl_indices_mask,
    vision_uncertainty_auto,
)
from ..utils.config import EnsembleConfig, GenerationConfig, LlavaConfig


def extract_probe_ids(
    input_ids: jax.Array,
    marker: int = 727,
    max_probes: int = 8,
    text_lens: jax.Array | None = None,
):
    """Token ids following the first `marker` ('?') token — the reference's
    POPE probe-word capture (instructblip.py:653-659).  -1 padded.

    ``text_lens``: per-row real length for right-padded variable-length
    batches — without it, pad token 0 past a row's real end would be
    captured as a valid probe id (and 0 is a valid vocab id, so the
    "vqa" mask policy's keep-set would silently change vs the unpadded
    row)."""
    B, S = input_ids.shape
    pos = jnp.argmax(input_ids == marker, axis=1)  # [B]
    has = jnp.any(input_ids == marker, axis=1)
    gather = pos[:, None] + 1 + jnp.arange(max_probes)[None]
    limit = (
        jnp.full((B, 1), S)
        if text_lens is None
        else jnp.asarray(text_lens, jnp.int32)[:, None]
    )
    valid = has[:, None] & (gather < limit)
    ids = jnp.take_along_axis(input_ids, jnp.clip(gather, 0, S - 1), axis=1)
    return jnp.where(valid, ids, -1).astype(jnp.int32)


class TextMaskState(NamedTuple):
    """Per-generated-position statistics for the text-mask policies
    (reference logits_mask_prob / token_entropies / token_ventropies,
    llava.py:62-67, instructblip.py:141-144)."""

    prob: jax.Array  # [B, T] 1/max-logit of the step that emitted position
    ent: jax.Array  # [B, T] entropy (base 2)
    vent: jax.Array  # [B, T] varentropy


class PrefillState(NamedTuple):
    cache: KVCache
    cur_len: jax.Array  # [B] current cache fill (= merged prompt length)
    last_logits: jax.Array  # [B, V] logits at the prompt's last position
    first_token: jax.Array  # [B] greedy token from the prompt's last logits
    epis: jax.Array  # [B, N] epistemic uncertainty per visual token
    topk_ids: jax.Array  # [B, N, k] text-projection table
    image_logits: jax.Array  # [B, N, V] visual-token logits under the
    #   epis_kl policy (its per-step KL keep-set needs them); a [B, N, 1]
    #   zero stub for every other policy (kl_logits_or_stub) so the
    #   ~74 MB/image fp32 buffer never stays resident
    image_pos: jax.Array  # [B] start of the visual span
    visual_mask: jax.Array  # [B, N] validity (LLaVA-NeXT pads N to a max)
    probe_ids: jax.Array  # [B, P] VQA probe token ids (-1 pad; "vqa" policy)
    rng_id: jax.Array  # [B] per-request RNG stream id (row index at prefill;
    #   preserved by the serving layer so slot placement never changes draws)
    uncertainty: dict  # full uncertainty dict (diagnostics)


class GenerationResult(NamedTuple):
    tokens: np.ndarray  # [B, T] generated tokens (eos-padded)
    num_tokens: np.ndarray  # [B]


class ProbeResult(NamedTuple):
    """Result of the lite ``probe`` prefill: exactly what a 1-token
    workload (POPE, reference pope_test.py:239-242) consumes.  Skips the
    [B, N, V] visual-logits table, uncertainty, top-k projection, and the
    max-len KV-cache materialization the full prefill pays for — none of
    which can affect the FIRST token (ensemble masking only changes steps
    after it)."""

    first_token: jax.Array  # [B] greedy token at the prompt's last position
    last_logits: jax.Array  # [B, V]


def kl_logits_or_stub(img_logits: jax.Array, mask_policy: str) -> jax.Array:
    """``epis_kl`` is the only policy that reads the full [B, N, V]
    visual-token logits after prefill (engine _member_drop_slots); for
    every other policy return a [B, N, 1] stub so the prefill program does
    not keep a ~74 MB/image fp32 output buffer resident in the decode
    state (1.2 GB at the batch-16 stretch config).  The serving layer
    already gates its slot buffer the same way (serving.py _track_kl)."""
    if mask_policy == "epis_kl":
        return img_logits
    return jnp.zeros(img_logits.shape[:-1] + (1,), jnp.float32)


def _record_text_stats(tm: TextMaskState, steps, winner_logits) -> TextMaskState:
    """Record 1/max-logit + entropy/varentropy of the emitting step
    (reference llava.py:366-369 / instructblip.py:141-144).

    ``steps``: [B] per-row generation index (rows may be at different steps
    under the continuous-batching server)."""
    from ..ops.uncertainty import entropy_varentropy

    B = winner_logits.shape[0]
    T = tm.prob.shape[1]
    idx = jnp.clip(steps, 0, T - 1)
    rows = jnp.arange(B)
    ent, vent = jax.vmap(entropy_varentropy)(winner_logits)
    return TextMaskState(
        prob=tm.prob.at[rows, idx].set(1.0 / jnp.max(winner_logits, axis=-1)),
        ent=tm.ent.at[rows, idx].set(ent),
        vent=tm.vent.at[rows, idx].set(vent),
    )


@dataclass
class LlavaEngine:
    """LLaVA-1.5 dropout-decoding engine.

    Equivalent surface to the reference CustomLlavaForConditionalGeneration
    + HF generate (llava.py:54, chair_test.py:341-346), exposed as
    ``generate(input_ids, pixel_values)``.
    """

    cfg: LlavaConfig
    params: llava_mod.LlavaParams
    ens: EnsembleConfig = EnsembleConfig()
    gen: GenerationConfig = GenerationConfig()
    max_len: int = 1280
    seed: int = 24
    ensemble: bool = True  # False => plain greedy ("--original")
    text_logits_mask: bool = False  # the "+ logit text-mask" variant
    text_mask_policy: str = "none"  # "none" | "logits" | "entropy"
    int8_kv: bool = False  # int8-quantized KV cache (halves the decode
    #   cache stream; pairs with utils/quantize.quantize_llama_params for
    #   full-depth 7B on a 16 GB chip)
    w8a8_prefill: bool = False  # int8-MXU prefill projections (s8 x s8 ->
    #   s32, ~1.6x the bf16 MXU rate): quantize activation rows on the fly
    #   against the already-int8 weights.  Prefill-only — decode is
    #   HBM-bound.  Opt-in; drift measured in cli/fused_gap.py --study w8a8
    int8_prefix_cache: bool = False  # store probe_prefix handles int8-
    #   quantized: HALVES resident bytes per cached image (the lever when
    #   many prefixes stay resident) at measured 12-24% slower extends
    #   (bench: LLaVA prefix-POPE 84.8 -> 111.9 ms/image) — a memory/
    #   speed trade the caller picks explicitly
    w8a8_decode: bool = False  # int8-MXU DECODE projections.  Worthless at
    #   B=1 (decode is HBM-bound) but the large-batch configs run
    #   B*(K+1)-row projections that are MXU-compute-bound (batch-16 x K=8
    #   = 144 rows), where the int8 MXU rate is step time off the top.
    #   Opt-in; accumulated drift measured in cli/fused_gap.py
    #   --study w8a8decode
    param_dtype = jnp.bfloat16

    def __post_init__(self):
        # Round the cache length up to the int8 sublane tile: the fused
        # GQA decode-attention kernels pad S to a 32-multiple, and at an
        # unaligned max_len that pad is a full cache copy inside EVERY
        # layer of every step.  Extra slots sit beyond cur_len and are
        # masked off, so this is semantically free.
        self.max_len = -(-self.max_len // 32) * 32
        # epis_kl under fused mode runs the LAGGED variant: the KL
        # keep-set reads the previous step's unmasked logits (carried in
        # the decode loop), the same one-step lag fused mode already
        # applies to the overlap keep-set.  Gap measured by
        # cli/fused_gap.py --study epis_kl.
        # lagged-KL mode: fused epis_kl carries the previous step's
        # unmasked logits through the decode loop (see _one_step)
        self._lag_kl = (
            self.ensemble
            and self.ens.fused_step
            and self.ens.mask_policy == "epis_kl"
        )
        # TP: when params were sharded over a ("data", "model") mesh before
        # construction (parallel/mesh.shard_llava_params), decode_step gets
        # the mesh so the fused Pallas attention runs head-parallel under
        # shard_map instead of being gated off multi-device runs.
        from ..parallel.mesh import mesh_of

        self.tp_mesh = mesh_of(self.params)
        self._prefill = jax.jit(self._prefill_impl)
        self._probe = jax.jit(functools.partial(self._prefill_impl, probe=True))
        self._probe_prefix = jax.jit(self._probe_prefix_impl)
        self._probe_extend = jax.jit(self._probe_extend_impl)
        self._merge = jax.jit(self._merge_embeds_impl)
        self._finalize_chunked = jax.jit(self._finalize_chunked_impl)
        self._chunk_fns = {}
        self._decode = jax.jit(self._decode_loop_impl)
        # Donated variant used by generate(): without donation XLA copies
        # EVERY cache leaf at dispatch entry because the while-loop body
        # scatters into a non-donated input buffer (profiled: 2 x 4.1 ms
        # and 2 x 2.68 GB transient for the batch-16 int8 stretch config).
        # Only the cache is donated (passed as its own argument; the rest
        # of the state stays valid on the caller side) and the final cache
        # is returned so the input buffer aliases an output.  Call as
        #   tokens, steps, fc = self._decode_d(
        #       params, state.cache, state._replace(cache=None))
        # treating state.cache as CONSUMED; to decode again from the same
        # prefill, rebind cache=fc (same shapes; bench.py time_decode
        # does this).  Tools that re-decode a state verbatim
        # (cli/fused_gap.py) keep the non-donating _decode.
        self._decode_d = jax.jit(
            lambda params, cache, state_rest: self._decode_loop_impl(
                params, state_rest._replace(cache=cache), return_cache=True
            ),
            donate_argnums=(1,),
        )

    @property
    def n_visual(self) -> int:
        """Number of visual tokens in the merged sequence."""
        return self.cfg.vision.num_patches

    # ------------------------------------------------------------------
    # prefill
    # ------------------------------------------------------------------
    def _prefill_impl(
        self,
        params,
        input_ids,
        pixel_values,
        text_lens=None,
        image_index=None,
        probe=False,
    ):
        """``text_lens`` (optional [B] int32): per-row REAL text length for
        right-padded variable-length batches (e.g. the batched POPE path —
        3,000 different questions).  Right padding is free under causal
        attention: pad positions sit after every real token, so no real
        position attends them during prefill, and decode masks cache slots
        >= cur_len.  Only the last-real-position logits and cur_len need
        per-row indexing.

        ``image_index`` (optional [B] int32): row -> image mapping when
        ``pixel_values`` holds only the batch's UNIQUE images ([U, ...],
        U <= B).  The vision tower runs once per image; rows gather their
        features.  POPE asks 6 consecutive questions per image, so batch-8
        groups carry ~2 unique images.

        ``probe`` (static): lite mode returning ProbeResult — the 1-token
        fast path (no uncertainty / top-k / KV-cache materialization)."""
        cfg = self.cfg
        B, S_text = input_ids.shape
        N = cfg.vision.num_patches
        image_pos = llava_mod.find_image_pos(input_ids, cfg.image_token_index)

        feats = llava_mod.image_features(cfg, params, pixel_values)  # [U,N,D]
        if image_index is not None:
            feats = feats[image_index]  # [B, N, D]
        text_embeds = llama_mod.embed(
            params.lm, jnp.where(input_ids == cfg.image_token_index, 0, input_ids)
        )
        merged = llava_mod.merge_image_features(text_embeds, feats, image_pos)
        S = merged.shape[1]
        positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        hidden, kv = llama_mod.prefill(
            params.lm, cfg.text, merged, positions, w8a8=self.w8a8_prefill
        )

        return self._assemble_state(
            params, input_ids, hidden, kv, image_pos, text_lens, probe
        )

    def _assemble_state(
        self, params, input_ids, hidden, kv, image_pos, text_lens, probe=False
    ):
        """PrefillState from the LM forward's outputs — shared by the
        one-shot prefill and the chunked prefill (whose hidden/kv arrive
        from N chunk dispatches but are numerically the same buffers)."""
        cfg = self.cfg
        B, S, _ = hidden.shape
        N = cfg.vision.num_patches

        if text_lens is None:
            cur_len = jnp.full((B,), S, jnp.int32)
            last_hidden = hidden[:, -1]
        else:
            cur_len = (jnp.asarray(text_lens, jnp.int32) + N - 1)  # merged len
            idx = jnp.clip(cur_len - 1, 0, S - 1)
            last_hidden = jnp.take_along_axis(
                hidden, idx[:, None, None], axis=1
            )[:, 0]
        last_logits = llama_mod.lm_head(params.lm, last_hidden)  # [B, V]
        first_token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        if probe:
            return ProbeResult(first_token=first_token, last_logits=last_logits)

        # visual-span logits -> uncertainty + top-k projection table
        # (reference llava.py:310-314, 390-410)
        def span(h, p):
            return jax.lax.dynamic_slice_in_dim(h, p, N, axis=0)

        hidden_img = jax.vmap(span)(hidden, image_pos)  # [B, N, D]
        img_logits = llama_mod.lm_head(params.lm, hidden_img)  # [B, N, V] fp32
        uncert = vision_uncertainty_auto(img_logits)
        topk_ids = exact_top_k_ids(img_logits, self.ens.topk)

        cache = llama_mod.empty_cache(
            cfg.text, B, self.max_len, self.param_dtype, quantized=self.int8_kv
        )
        cache = llama_mod.cache_seed(cache, kv)
        return PrefillState(
            cache=cache,
            cur_len=cur_len,
            last_logits=last_logits,
            first_token=first_token,
            epis=uncert["epis_uncert_per_token"],
            topk_ids=topk_ids,
            image_logits=kl_logits_or_stub(img_logits, self.ens.mask_policy),
            image_pos=image_pos,
            visual_mask=jnp.ones((B, N), bool),
            probe_ids=extract_probe_ids(input_ids, text_lens=text_lens),
            rng_id=jnp.arange(B, dtype=jnp.int32),
            uncertainty=uncert,
        )

    # ------------------------------------------------------------------
    # chunked prefill (serving: bound the decode stall of long prefills)
    # ------------------------------------------------------------------
    def _merge_embeds_impl(self, params, input_ids, pixel_values):
        """Vision + projector + merge only — the front of _prefill_impl,
        dispatched separately so the LM prefill can run in chunks.
        Returns (merged, real_len, finalize-aux)."""
        cfg = self.cfg
        image_pos = llava_mod.find_image_pos(input_ids, cfg.image_token_index)
        feats = llava_mod.image_features(cfg, params, pixel_values)
        text_embeds = llama_mod.embed(
            params.lm,
            jnp.where(input_ids == cfg.image_token_index, 0, input_ids),
        )
        merged = llava_mod.merge_image_features(text_embeds, feats, image_pos)
        return merged, jnp.int32(merged.shape[1]), (image_pos,)

    def _chunk_embeds_impl(
        self, params, merged_pad, off, kbuf, vbuf, hbuf, real_len, *, chunk
    ):
        """One LM chunk: rows [off, off+chunk) attend the fully-visible
        valid prefix (prefix_mask < min(off, real_len)) plus causally to
        themselves — numerically the rows of a one-shot causal prefill
        (causal attention factorizes; ops/attention.extend_attention).
        The chunk's K/V and final-norm hidden land in the donated
        accumulation buffers.  ``off`` is a traced scalar: every chunk of
        a prompt shape runs the SAME compiled program."""
        cfg = self.cfg
        B, S_pad, D = merged_pad.shape
        mc = jax.lax.dynamic_slice(merged_pad, (0, off, 0), (B, chunk, D))
        pos = jnp.broadcast_to(off + jnp.arange(chunk)[None], (B, chunk))
        pm = jnp.arange(S_pad)[None, :] < jnp.minimum(off, real_len)
        hidden_c, kv_c = llama_mod.prefill_extend(
            params.lm,
            cfg.text,
            mc,
            pos,
            llama_mod.KVCache(kbuf, vbuf),
            w8a8=self.w8a8_prefill,
            prefix_mask=pm,
        )
        kbuf = jax.lax.dynamic_update_slice(kbuf, kv_c.k, (0, 0, off, 0, 0))
        vbuf = jax.lax.dynamic_update_slice(vbuf, kv_c.v, (0, 0, off, 0, 0))
        hbuf = jax.lax.dynamic_update_slice(hbuf, hidden_c, (0, off, 0))
        return kbuf, vbuf, hbuf

    def _chunk_fn(self, chunk: int):
        fns = getattr(self, "_chunk_fns", None)
        if fns is None:
            fns = self._chunk_fns = {}
        if chunk not in fns:
            fns[chunk] = jax.jit(
                functools.partial(self._chunk_embeds_impl, chunk=chunk),
                donate_argnums=(3, 4, 5),
            )
        return fns[chunk]

    def _finalize_chunked_impl(self, params, input_ids, hidden, kbuf, vbuf,
                               image_pos):
        kv = llama_mod.KVCache(kbuf, vbuf)
        return self._assemble_state(
            params, input_ids, hidden, kv, image_pos, None
        )

    def prefill_chunked(self, input_ids, *rest, chunk=256, pump=None):
        """Prefill one request in ``chunk``-token LM dispatches, calling
        ``pump()`` between them — the serving layer passes a pump that
        enqueues decode steps for active slots, so a long prefill stalls
        concurrent streams by at most one chunk of device time instead of
        the whole prompt (DecodeServer.submit_chunked).  Device programs
        execute in queue order; the pump needs no host synchronisation.

        Args are the engine's standard prefill args.  Numerically
        identical to ``prefill`` (same buffers, chunked causal
        factorization; tests/test_chunked_prefill.py).  B=1 — serving
        submits one joining request at a time."""
        ids = jnp.asarray(input_ids)
        if ids.shape[0] != 1:
            raise ValueError("prefill_chunked is per-request (B=1)")
        merged, real_len, aux = self._merge(self.params, ids, *rest)
        B, S, D = merged.shape
        n = -(-S // chunk)
        S_pad = n * chunk
        if S_pad != S:
            merged = jnp.pad(merged, ((0, 0), (0, S_pad - S), (0, 0)))
        cfgt = self.cfg.text
        shape = (
            cfgt.num_hidden_layers, B, S_pad,
            cfgt.num_key_value_heads, cfgt.head_dim,
        )
        kbuf = jnp.zeros(shape, merged.dtype)
        vbuf = jnp.zeros(shape, merged.dtype)
        hbuf = jnp.zeros((B, S_pad, D), merged.dtype)
        fn = self._chunk_fn(chunk)
        for i in range(n):
            if pump is not None and i > 0:
                pump()
            kbuf, vbuf, hbuf = fn(
                self.params, merged, jnp.int32(i * chunk),
                kbuf, vbuf, hbuf, real_len,
            )
        # junk rows past the real merged length sit at positions >= cur_len
        # and are masked everywhere downstream; slice the static pad off
        return self._finalize_chunked(
            self.params, ids, hbuf[:, :S], kbuf[:, :, :S], vbuf[:, :, :S],
            *aux,
        )

    def _probe_prefix_impl(self, params, prefix_ids, pixel_values):
        """KV of the SHARED prompt prefix (vision + merge + LM prefill of
        one row) — prefix caching for 1-token workloads.  POPE asks ~6
        questions per image whose merged prompts share everything up to
        the question text (~580 of ~615 tokens at LLaVA-1.5 shapes); the
        reference re-prefills the whole prompt per question
        (pope_test.py:239-242)."""
        cfg = self.cfg
        image_pos = llava_mod.find_image_pos(prefix_ids, cfg.image_token_index)
        feats = llava_mod.image_features(cfg, params, pixel_values)
        text_embeds = llama_mod.embed(
            params.lm,
            jnp.where(prefix_ids == cfg.image_token_index, 0, prefix_ids),
        )
        merged = llava_mod.merge_image_features(text_embeds, feats, image_pos)
        S = merged.shape[1]
        positions = jnp.broadcast_to(
            jnp.arange(S)[None], (prefix_ids.shape[0], S)
        )
        _, kv = llama_mod.prefill(
            params.lm, cfg.text, merged, positions, w8a8=self.w8a8_prefill
        )
        return kv

    def _probe_extend_impl(self, params, prefix_kv, tail_ids, text_lens):
        """Per-question tail over a cached prefix: embed + prefill_extend
        + last-valid-position logits.  Tails are plain text (no image
        token); right padding is exact under causal attention."""
        cfg = self.cfg
        B, T = tail_ids.shape
        P = (
            prefix_kv.k["q"] if isinstance(prefix_kv.k, dict) else prefix_kv.k
        ).shape[2]
        emb = llama_mod.embed(params.lm, tail_ids)
        positions = jnp.broadcast_to(P + jnp.arange(T)[None], (B, T))
        hidden, _ = llama_mod.prefill_extend(
            params.lm, cfg.text, emb, positions, prefix_kv,
            w8a8=self.w8a8_prefill,
        )
        if text_lens is None:
            last_hidden = hidden[:, -1]
        else:
            idx = jnp.clip(jnp.asarray(text_lens, jnp.int32) - 1, 0, T - 1)
            last_hidden = jnp.take_along_axis(
                hidden, idx[:, None, None], axis=1
            )[:, 0]
        last_logits = llama_mod.lm_head(params.lm, last_hidden)
        first_token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        return ProbeResult(first_token=first_token, last_logits=last_logits)

    # ------------------------------------------------------------------
    # decode
    # ------------------------------------------------------------------
    def _member_drop_slots(
        self, state, argmax_src, logits_for_kl, steps, cur_len, tm
    ):
        """Sample the K members' cache-slot drop masks [B, K, Smax] from an
        argmax source (current step's unmasked argmax in exact mode,
        previous step's in fused mode)."""
        ens = self.ens
        B = argmax_src.shape[0]
        N = self.n_visual
        Smax = self.max_len

        if ens.mask_policy == "vqa":
            from ..decoding.masks import overlap_keep_mask_multi

            overlap = jax.vmap(overlap_keep_mask_multi)(
                state.probe_ids, state.topk_ids
            )
        else:
            overlap = jax.vmap(overlap_keep_mask)(argmax_src, state.topk_ids)
        kl_keep = None
        if ens.mask_policy == "epis_kl":
            kl_keep = jax.vmap(lowest_percent_kl_indices_mask)(
                state.image_logits, logits_for_kl
            )

        base_key = jax.random.key(self.seed)

        def member_masks(b_key, epis_b, overlap_b, kl_b, valid_b):
            drops = []
            prev = jnp.zeros((N,), bool)
            for m, cap in enumerate(ens.voting_probs):
                mk = jax.random.fold_in(b_key, m)
                d = build_member_drop_mask(
                    mk,
                    ens.mask_policy,
                    epis_b,
                    cap,
                    overlap_b,
                    prev,
                    ens.mask_accumulate,
                    kl_keep=kl_b,
                    floor=ens.prob_floor,
                    valid=valid_b,
                )
                drops.append(d)
                prev = d
            return jnp.stack(drops)  # [K, N]

        b_keys = jax.vmap(
            lambda s, b: jax.random.fold_in(jax.random.fold_in(base_key, s), b)
        )(steps, state.rng_id)
        kl_arg = kl_keep if kl_keep is not None else jnp.zeros((B, N), bool)
        drops = jax.vmap(member_masks)(
            b_keys, state.epis, overlap, kl_arg, state.visual_mask
        )
        drops = drops & state.visual_mask[:, None, :]

        # place drops into cache-slot space: slot s is visual token
        # s - image_pos when in [image_pos, image_pos + n_img)
        n_img = jnp.sum(state.visual_mask, axis=-1)  # [B] actual count
        slots = jnp.arange(Smax)[None, :]  # [1, Smax]
        in_span = (slots >= state.image_pos[:, None]) & (
            slots < state.image_pos[:, None] + n_img[:, None]
        )  # [B, Smax]
        tok_idx = jnp.clip(slots - state.image_pos[:, None], 0, N - 1)
        drop_slots = jnp.take_along_axis(drops, tok_idx[:, None, :], axis=2)
        drop_slots = drop_slots & in_span[:, None, :]  # [B, K, Smax]

        text_policy = "logits" if self.text_logits_mask else self.text_mask_policy
        if text_policy != "none":
            # text-position masking over generated tokens; last 3 positions
            # always attended (reference llava.py:548-569)
            gen_start = state.cur_len  # [B] prompt length
            T = tm.prob.shape[1]
            gidx = jnp.clip(slots - gen_start[:, None], 0, T - 1)
            gprob = jnp.take_along_axis(tm.prob, gidx, axis=1)  # [B, Smax]
            tkeys = jax.vmap(
                lambda s, b: jax.random.fold_in(
                    jax.random.fold_in(jax.random.fold_in(base_key, s), 7919), b
                )
            )(steps, state.rng_id)
            u = jax.vmap(lambda k: jax.random.uniform(k, (Smax,)))(tkeys)
            if text_policy == "logits":
                # drop with prob 1/max_logit of the emitting step
                tdrop = u < gprob
            else:  # "entropy" (reference llava.py:558-569)
                ent = jnp.take_along_axis(tm.ent, gidx, axis=1)
                vent = jnp.take_along_axis(tm.vent, gidx, axis=1)
                low = (ent < 0.1) & (vent < 0.1)  # confident: force attend
                high = (ent > 5.0) & (vent > 5.0)  # chaotic: coin flip
                tdrop = jnp.where(
                    low, False, jnp.where(high, u <= 0.5, u < gprob)
                )
            in_gen = (slots >= gen_start[:, None]) & (slots < cur_len[:, None] - 3)
            drop_slots = drop_slots | (tdrop & in_gen)[:, None, :]
        return drop_slots

    def _sample_rows(self, steps, rng_id, logits):
        """Per-row sampled tokens (gen.do_sample): HF warper semantics
        (temperature -> top-k -> top-p, ops/sampling.py) + categorical
        draw keyed by (seed, step, rng stream) — deterministic per
        request like the mask streams, stable under the serving layer's
        slot placement."""
        from ..ops.sampling import warp_logits

        base = jax.random.fold_in(jax.random.key(self.seed), 104729)
        keys = jax.vmap(
            lambda s, b: jax.random.fold_in(jax.random.fold_in(base, s), b)
        )(steps, rng_id)
        warped = warp_logits(
            logits, self.gen.temperature, self.gen.top_k, self.gen.top_p
        )
        return jax.vmap(jax.random.categorical)(keys, warped).astype(jnp.int32)

    def _one_step(self, params, state, carry):
        """One ensemble decode step.  carry = (cache, cur_len, token,
        steps [B] per-row generation index, tokens_buf, done,
        tm: TextMaskState, prev_argmax0)."""
        cfg, ens = self.cfg, self.ens
        (cache, cur_len, token, steps, tokens_buf, done, tm, prev_argmax0,
         prev_logits0) = carry
        B = token.shape[0]
        K = ens.k
        Smax = self.max_len

        x = llama_mod.embed(params.lm, token)  # [B, D]
        base_mask = jnp.arange(Smax)[None, :] < cur_len[:, None]  # [B, Smax]

        if self.ensemble and ens.fused_step:
            # --- fused mode: ONE width-(K+1) forward; member 0 unmasked,
            # members 1..K masked with the PREVIOUS step's overlap set
            # (one weight stream per token; see EnsembleConfig.fused_step).
            # epis_kl's keep-set reads the PREVIOUS step's unmasked
            # logits (lagged variant; other policies ignore the argument)
            drop_slots = self._member_drop_slots(
                state, prev_argmax0, prev_logits0, steps, cur_len, tm
            )
            masks = jnp.concatenate(
                [
                    base_mask[:, None, :],
                    base_mask[:, None, :] & ~drop_slots,
                ],
                axis=1,
            )  # [B, K+1, Smax]
            xa = jnp.broadcast_to(x[:, None], (B, K + 1, x.shape[-1]))
            ha, ka, va = llama_mod.decode_step(
                params.lm, cfg.text, xa, cur_len, cache, masks,
                tp_mesh=self.tp_mesh, w8a8=self.w8a8_decode,
            )
            logits_all = llama_mod.lm_head(params.lm, ha)  # [B, K+1, V]
            logits0 = logits_all[:, 0]
            argmax0 = jnp.argmax(logits0, axis=-1)
            logits_k = logits_all[:, 1:]
            agg = select_by_average if ens.use_avg else select_by_vote
            winner, next_token = jax.vmap(agg)(logits_k)
            next_token = next_token.astype(jnp.int32)
            kw = jnp.take_along_axis(
                ka, (winner + 1)[None, :, None, None, None], axis=2
            )[:, :, 0]
            vw = jnp.take_along_axis(
                va, (winner + 1)[None, :, None, None, None], axis=2
            )[:, :, 0]
            if ens.use_avg:
                # the reference substitutes the member-AVERAGE into
                # outputs[0] (llava.py:37-52), so sampling and the
                # text-mask stats must see the averaged logits, not
                # member 0's raw ones (the propagated KV stays member 0's)
                winner_logits = jnp.mean(
                    logits_k.astype(jnp.float32), axis=1
                )
            else:
                winner_logits = jnp.take_along_axis(
                    logits_k, winner[:, None, None], axis=1
                )[:, 0]
            if self.gen.do_sample:
                # HF sample(): multinomial over the forward's returned
                # (= vote-winner) logits; masks/overlap stay on argmax
                next_token = self._sample_rows(steps, state.rng_id, winner_logits)
            tm = _record_text_stats(tm, steps, winner_logits)
        else:
            # --- phase 1: unmasked forward (reference llava.py:294-305) ---
            h0, k0, v0 = llama_mod.decode_step(
                params.lm, cfg.text, x[:, None], cur_len, cache,
                base_mask[:, None], tp_mesh=self.tp_mesh,
                w8a8=self.w8a8_decode,
            )
            logits0 = llama_mod.lm_head(params.lm, h0)[:, 0]  # [B, V]
            argmax0 = jnp.argmax(logits0, axis=-1)  # [B]

            if not self.ensemble:
                # plain greedy: the unmasked member IS the output
                # (or a sampled draw from it under gen.do_sample).
                if self.gen.do_sample:
                    next_token = self._sample_rows(steps, state.rng_id, logits0)
                else:
                    next_token = argmax0.astype(jnp.int32)
                kw, vw = k0[:, :, 0], v0[:, :, 0]
            else:
                # --- phases 2-3: masks from the CURRENT unmasked argmax
                # (reference llava.py:305->345), then the K-member batch ---
                drop_slots = self._member_drop_slots(
                    state, argmax0, logits0, steps, cur_len, tm
                )
                member_mask = base_mask[:, None, :] & ~drop_slots  # [B,K,Smax]
                xk = jnp.broadcast_to(x[:, None], (B, K, x.shape[-1]))
                hk, kk, vk = llama_mod.decode_step(
                    params.lm, cfg.text, xk, cur_len, cache, member_mask,
                    tp_mesh=self.tp_mesh, w8a8=self.w8a8_decode,
                )
                logits_k = llama_mod.lm_head(params.lm, hk)  # [B, K, V]

                # --- phase 4: aggregate + winner-KV scatter ---
                agg = select_by_average if ens.use_avg else select_by_vote
                winner, next_token = jax.vmap(agg)(logits_k)
                next_token = next_token.astype(jnp.int32)
                # winner K/V: [L, B, K, KH, D] -> [L, B, KH, D]
                kw = jnp.take_along_axis(
                    kk, winner[None, :, None, None, None], axis=2
                )[:, :, 0]
                vw = jnp.take_along_axis(
                    vk, winner[None, :, None, None, None], axis=2
                )[:, :, 0]
                if ens.use_avg:
                    # see the fused path: the reference's average
                    # substitution means downstream consumers read the
                    # averaged logits (llava.py:37-52)
                    winner_logits = jnp.mean(
                        logits_k.astype(jnp.float32), axis=1
                    )
                else:
                    winner_logits = jnp.take_along_axis(
                        logits_k, winner[:, None, None], axis=1
                    )[:, 0]
                if self.gen.do_sample:
                    next_token = self._sample_rows(
                        steps, state.rng_id, winner_logits
                    )
                tm = _record_text_stats(tm, steps, winner_logits)

        cache = llama_mod.cache_set_rows(cache, cur_len, kw, vw)

        prev_done = done
        next_token = jnp.where(prev_done, self.gen.pad_token_id, next_token)
        T = tokens_buf.shape[1]
        rows = jnp.arange(B)
        idx = jnp.clip(steps, 0, T - 1)
        written = tokens_buf.at[rows, idx].set(next_token)
        # rows already done (or past T) keep their buffer unchanged
        keep = prev_done | (steps >= T)
        tokens_buf = jnp.where(keep[:, None], tokens_buf, written)
        done = prev_done | (next_token == self.gen.eos_token_id)
        if self._lag_kl:
            new_prev_logits0 = logits0
        else:
            new_prev_logits0 = prev_logits0  # [B, 1] stub passthrough
        return (
            cache,
            cur_len + jnp.where(prev_done, 0, 1),
            next_token,
            steps + jnp.where(prev_done, 0, 1),
            tokens_buf,
            done,
            tm,
            argmax0,
            new_prev_logits0,
        )

    def _decode_loop_impl(self, params, state: PrefillState, return_cache=False):
        B = state.first_token.shape[0]
        T = self.gen.max_new_tokens
        if self.gen.do_sample:
            # HF samples EVERY generated token, including the one drawn
            # from the prompt's last logits (step key 0; decode steps
            # start at 1).  Mask/overlap machinery stays on the argmax.
            first_token = self._sample_rows(
                jnp.zeros((B,), jnp.int32), state.rng_id, state.last_logits
            )
        else:
            first_token = state.first_token
        tokens_buf = jnp.full((B, T), self.gen.pad_token_id, jnp.int32)
        tokens_buf = tokens_buf.at[:, 0].set(first_token)
        done = first_token == self.gen.eos_token_id
        tm0 = TextMaskState(
            prob=jnp.zeros((B, T), jnp.float32),
            ent=jnp.zeros((B, T), jnp.float32),
            vent=jnp.zeros((B, T), jnp.float32),
        )
        # entry 0 holds the stats of the forward that EMITTED token 0 —
        # the prefill (reference llava.py:366-369 records every emitting
        # step); without this seed the first generated token's cache slot
        # is never text-maskable (pinned-attend under the entropy policy)
        tm0 = _record_text_stats(
            tm0, jnp.zeros((B,), jnp.int32), state.last_logits
        )

        carry = (
            state.cache,
            state.cur_len,
            first_token,
            jnp.ones((B,), jnp.int32),  # per-row step index into tokens_buf
            tokens_buf,
            done,
            tm0,
            # prefill's unmasked argmax == first_token (fused-mode overlap
            # source for the first decode step)
            state.first_token.astype(jnp.int32),
            # prefill's last logits seed the lagged-KL source; a [B, 1]
            # stub for every other mode so the loop never carries the
            # [B, V] buffer it does not read
            (
                state.last_logits
                if self._lag_kl
                else jnp.zeros((B, 1), jnp.float32)
            ),
        )

        def cond(c):
            return jnp.any((c[3] < T) & ~c[5])

        def body(c):
            return self._one_step(params, state, c)

        carry = jax.lax.while_loop(cond, body, carry)
        tokens_buf, steps = carry[4], carry[3]
        if return_cache:
            return tokens_buf, jnp.max(steps), carry[0]
        return tokens_buf, jnp.max(steps)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def prefill(self, input_ids, pixel_values, text_lens=None) -> PrefillState:
        return self._prefill(
            self.params,
            jnp.asarray(input_ids),
            jnp.asarray(pixel_values),
            None if text_lens is None else jnp.asarray(text_lens, jnp.int32),
        )

    def probe(
        self, input_ids, pixel_values, text_lens=None, image_index=None
    ) -> ProbeResult:
        """1-token fast path (POPE): first_token + last_logits only.
        ``pixel_values`` may hold just the batch's unique images with
        ``image_index`` [B] mapping rows to them."""
        return self._probe(
            self.params,
            jnp.asarray(input_ids),
            jnp.asarray(pixel_values),
            None if text_lens is None else jnp.asarray(text_lens, jnp.int32),
            None if image_index is None else jnp.asarray(image_index, jnp.int32),
        )

    def probe_prefix(self, prefix_ids, pixel_values):
        """Prefix KV for probe_extend: run the shared [text-prefix +
        image] span once per image (prefix caching).  With
        ``int8_prefix_cache`` the handle is stored quantized — half the
        resident bytes per cached image, read via
        ops.attention.extend_attention_int8prefix at a measured 12-24%
        extend cost (see the engine field)."""
        kv = self._probe_prefix(
            self.params, jnp.asarray(prefix_ids), jnp.asarray(pixel_values)
        )
        if self.int8_prefix_cache:
            # layout contract lives in models/llama (KVCache docstring)
            kv = llama_mod.KVCache(
                llama_mod.kv_int8_reader_layout(kv.k),
                llama_mod.kv_int8_reader_layout(kv.v),
            )
        return kv

    def probe_extend(self, prefix_kv, tail_ids, text_lens=None) -> ProbeResult:
        """1-token answers for a batch of question tails over a cached
        prefix — probe() semantics at a fraction of the prefill cost
        (the prefix tower runs once per image, not once per question)."""
        return self._probe_extend(
            self.params,
            prefix_kv,
            jnp.asarray(tail_ids),
            None if text_lens is None else jnp.asarray(text_lens, jnp.int32),
        )

    def generate(self, input_ids, pixel_values) -> GenerationResult:
        state = self.prefill(input_ids, pixel_values)
        cur_len = state.cur_len
        tokens, steps, _ = self._decode_d(
            self.params, state.cache, state._replace(cache=None)
        )
        # KV-capacity check: each of the T-1 decode steps appends one row
        # at cur_len; an overflowing write is SILENTLY dropped (dense
        # `.at[].set` out-of-bounds) or clamp-overwrites recent KV (int8
        # Pallas row append), corrupting output with no error.  Checked
        # AFTER the decode dispatch: fetching cur_len between prefill and
        # decode would serialize the pipeline on a host sync (measured
        # -35% serving throughput when this check blocked per-submit).
        longest = int(np.max(np.asarray(cur_len)))
        if longest + self.gen.max_new_tokens - 1 > self.max_len:
            raise ValueError(
                f"prompt ({longest} tokens) + max_new_tokens "
                f"({self.gen.max_new_tokens}) - 1 exceeds the KV capacity "
                f"max_len={self.max_len}; raise max_len or lower the budget"
            )
        tokens = np.asarray(tokens)
        eos = self.gen.eos_token_id
        num = np.array(
            [
                (np.where(row == eos)[0][0] + 1) if (row == eos).any() else len(row)
                for row in tokens
            ]
        )
        return GenerationResult(tokens=tokens, num_tokens=num)
