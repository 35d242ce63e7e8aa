"""InstructBLIP dropout-decoding engine.

Same decode machinery as LlavaEngine (the method runs identically per
step); only prefill differs: visual tokens come from the Q-Former (32
projected query outputs prepended to the text embeds, reference
instructblip.py:661-664), the visual span is [0, 32), and the per-model
mask policy defaults follow the reference (deterministic top-quantile
"epis" with per-member mask restore, topk=10 — instructblip.py:121-122,
187, 447-460).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import instructblip as ib_mod
from ..models import llama as llama_mod
from ..ops.uncertainty import exact_top_k_ids, vision_uncertainty_auto
from .generate import (
    LlavaEngine,
    PrefillState,
    extract_probe_ids,
    kl_logits_or_stub,
)


@dataclass
class InstructBlipEngine(LlavaEngine):
    @property
    def n_visual(self) -> int:
        return self.cfg.num_query_tokens

    def prefill_chunked(self, *a, **kw):
        raise NotImplementedError(
            "chunked prefill targets long prompts; InstructBLIP merged "
            "prompts are ~64 tokens (32 Q-Former queries + instruction) — "
            "a single prefill dispatch is already shorter than one chunk"
        )

    def _prefill_impl(
        self,
        params,
        input_ids,
        pixel_values,
        qformer_input_ids=None,
        text_lens=None,
        qformer_attention_mask=None,
        image_index=None,
        probe=False,
    ):
        """``text_lens`` / ``qformer_attention_mask``: variable-length
        batches (batched POPE).  Visual tokens come first in the merged
        sequence, so right-padded text is exact under causal attention
        just like the LLaVA engine; the Q-Former masks padded instruction
        ids via its attention mask."""
        cfg = self.cfg
        B, S_text = input_ids.shape
        N = cfg.num_query_tokens

        visual = ib_mod.visual_tokens(
            cfg, params, pixel_values, qformer_input_ids,
            qformer_attention_mask, image_index=image_index,
        )  # [B, N, D]
        text_embeds = llama_mod.embed(params.lm, input_ids)
        merged = jnp.concatenate([visual.astype(text_embeds.dtype), text_embeds], 1)
        S = merged.shape[1]
        positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        hidden, kv = llama_mod.prefill(
            params.lm, cfg.text, merged, positions, w8a8=self.w8a8_prefill
        )

        if text_lens is None:
            cur_len = jnp.full((B,), S, jnp.int32)
            last_hidden = hidden[:, -1]
        else:
            cur_len = jnp.asarray(text_lens, jnp.int32) + N
            idx = jnp.clip(cur_len - 1, 0, S - 1)
            last_hidden = jnp.take_along_axis(
                hidden, idx[:, None, None], axis=1
            )[:, 0]
        last_logits = llama_mod.lm_head(params.lm, last_hidden)
        first_token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        if probe:
            from .generate import ProbeResult

            return ProbeResult(first_token=first_token, last_logits=last_logits)

        img_logits = llama_mod.lm_head(params.lm, hidden[:, :N])  # [B, N, V]
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
            image_pos=jnp.zeros((B,), jnp.int32),
            visual_mask=jnp.ones((B, N), bool),
            probe_ids=extract_probe_ids(input_ids, text_lens=text_lens),
            rng_id=jnp.arange(B, dtype=jnp.int32),
            uncertainty=uncert,
        )

    def prefill(
        self,
        input_ids,
        pixel_values,
        qformer_input_ids,
        text_lens=None,
        qformer_attention_mask=None,
    ):
        return self._prefill(
            self.params,
            jnp.asarray(input_ids),
            jnp.asarray(pixel_values),
            jnp.asarray(qformer_input_ids),
            None if text_lens is None else jnp.asarray(text_lens, jnp.int32),
            (
                None
                if qformer_attention_mask is None
                else jnp.asarray(qformer_attention_mask, jnp.int32)
            ),
        )

    def probe(
        self,
        input_ids,
        pixel_values,
        qformer_input_ids,
        text_lens=None,
        qformer_attention_mask=None,
        image_index=None,
    ):
        """1-token fast path (POPE): first_token + last_logits only.
        ``pixel_values`` may hold just the batch's unique images with
        ``image_index`` [B] mapping rows to them (ViT dedupe; the
        Q-Former still runs per row on the instruction text)."""
        return self._probe(
            self.params,
            jnp.asarray(input_ids),
            jnp.asarray(pixel_values),
            jnp.asarray(qformer_input_ids),
            None if text_lens is None else jnp.asarray(text_lens, jnp.int32),
            (
                None
                if qformer_attention_mask is None
                else jnp.asarray(qformer_attention_mask, jnp.int32)
            ),
            None if image_index is None else jnp.asarray(image_index, jnp.int32),
        )

    def generate(self, input_ids, pixel_values, qformer_input_ids=None):
        if qformer_input_ids is None:
            # the Q-Former uses the BERT vocabulary (30522), the LM a
            # 32k one: silently reusing LM ids would clamp out-of-range
            # ids into garbage BERT embeddings with no error
            raise ValueError(
                "qformer_input_ids is required (BERT-tokenized "
                "instruction from the InstructBLIP processor); LM "
                "input_ids are from a different vocabulary"
            )
        state = self.prefill(input_ids, pixel_values, qformer_input_ids)
        cur_len = state.cur_len
        tokens, steps, _ = self._decode_d(
            self.params, state.cache, state._replace(cache=None)
        )
        # KV-capacity guard, post-dispatch (see LlavaEngine.generate)
        longest = int(np.max(np.asarray(cur_len)))
        if longest + self.gen.max_new_tokens - 1 > self.max_len:
            raise ValueError(
                f"prompt ({longest} tokens) + max_new_tokens "
                f"({self.gen.max_new_tokens}) - 1 exceeds max_len="
                f"{self.max_len}"
            )
        tokens = np.asarray(tokens)
        eos = self.gen.eos_token_id
        from .generate import GenerationResult

        num = np.array(
            [
                (np.where(row == eos)[0][0] + 1) if (row == eos).any() else len(row)
                for row in tokens
            ]
        )
        return GenerationResult(tokens=tokens, num_tokens=num)
