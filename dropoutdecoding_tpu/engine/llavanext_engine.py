"""LLaVA-NeXT dropout-decoding engine.

Reuses LlavaEngine's decode machinery; the prefill differs:
- host-side anyres geometry (models/llavanext.image_geometry) turns the
  variable tile/token counts into gather DATA, so device programs are
  specialized only by (n_tiles, padded lengths);
- the merged sequence is padded to a static max with a key mask, the last
  real token is gathered dynamically, and the visual span carries a
  validity mask consumed by the mask policies.

Reference behavior preserved: stochastic epis masks restored per member
(llavanext.py:546), `use_random` -> epis_no_overlap (:547-551), topk=10
projection table (:652 via get_image_features).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod
from ..models import llavanext as next_mod
from ..ops.uncertainty import vision_uncertainty_auto
from .generate import GenerationResult, LlavaEngine, PrefillState, extract_probe_ids


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class LlavaNextEngine(LlavaEngine):
    seq_bucket: int = 256

    def __post_init__(self):
        super().__post_init__()
        self._prefill = jax.jit(self._prefill_impl, static_argnums=(5,))
        self._n_max = next_mod.max_image_tokens(self.cfg)

    @property
    def n_visual(self) -> int:
        return self._n_max

    def _prefill_impl(
        self, params, input_ids, tile_pixels, gather_idx, valid, image_pos
    ):
        """One image (B=1 rows; jit-specialized on n_tiles and S bucket)."""
        cfg = self.cfg
        B, S_text = input_ids.shape
        N = self._n_max

        packed = next_mod.pack_image_features(
            cfg, params, tile_pixels, gather_idx
        )  # [N, D]
        text_embeds = llama_mod.embed(
            params.lm, jnp.where(input_ids == cfg.image_token_index, 0, input_ids)
        )[0]
        merged, key_mask, real_len = next_mod.merge_with_text(
            text_embeds, packed, valid, int(image_pos)
        )
        S = merged.shape[0]
        positions = jnp.arange(S)[None]
        hidden, kv = llama_mod.prefill(
            params.lm,
            cfg.text,
            merged[None],
            positions,
            key_mask=key_mask[None],
        )

        img_hidden = jax.lax.dynamic_slice_in_dim(
            hidden[0], int(image_pos), N, axis=0
        )[None]
        img_logits = llama_mod.lm_head(params.lm, img_hidden)
        uncert = vision_uncertainty_auto(img_logits)
        _, topk_ids = jax.lax.top_k(img_logits, self.ens.topk)
        last_hidden = hidden[0, real_len - 1]
        last_logits = llama_mod.lm_head(params.lm, last_hidden[None])
        first_token = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

        cache = llama_mod.empty_cache(
            cfg.text, B, self.max_len, self.param_dtype, quantized=self.int8_kv
        )
        cache = llama_mod.cache_seed(cache, kv)
        return PrefillState(
            cache=cache,
            cur_len=jnp.full((B,), real_len, jnp.int32),
            last_logits=last_logits,
            first_token=first_token,
            epis=uncert["epis_uncert_per_token"],
            topk_ids=topk_ids,
            image_logits=img_logits,
            image_pos=jnp.full((B,), int(image_pos), jnp.int32),
            visual_mask=valid[None],
            probe_ids=extract_probe_ids(input_ids),
            rng_id=jnp.arange(B, dtype=jnp.int32),
            uncertainty=uncert,
        )

    def prefill(self, input_ids, tile_pixels, original_size):
        input_ids = np.asarray(input_ids)
        assert input_ids.shape[0] == 1, "LLaVA-NeXT engine is per-image (B=1)"
        geo = next_mod.image_geometry(original_size, self.cfg)
        gather_idx, valid = next_mod.packing_indices(self.cfg, geo, self._n_max)
        image_pos = int(
            np.argmax(input_ids[0] == self.cfg.image_token_index)
        )
        return self._prefill(
            self.params,
            jnp.asarray(input_ids),
            jnp.asarray(tile_pixels),
            jnp.asarray(gather_idx),
            jnp.asarray(valid),
            image_pos,
        )

    def generate(self, input_ids, tile_pixels, original_size):
        state = self.prefill(input_ids, tile_pixels, original_size)
        tokens, steps = self._decode(self.params, state)
        tokens = np.asarray(tokens)
        eos = self.gen.eos_token_id
        num = np.array(
            [
                (np.where(row == eos)[0][0] + 1) if (row == eos).any() else len(row)
                for row in tokens
            ]
        )
        return GenerationResult(tokens=tokens, num_tokens=num)
