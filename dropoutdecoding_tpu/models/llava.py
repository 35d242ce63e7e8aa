"""LLaVA-1.5 composition: CLIP tower + MLP projector + Llama LM, plus the
image/text merge.

Port target: reference models/llava.py:54-410 (CustomLlavaForConditional-
Generation).  The reference merge (_merge_input_ids_with_image_features,
llava.py:74-153) builds the final embedding with data-dependent torch
scatters; here it is a static-shape gather/select program: each output
position either copies a text embedding or an image feature, with the image
span located by the single <image> token.  Fully jit-compatible (dynamic
start position, static lengths).
"""
from __future__ import annotations

import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import clip_vit, llama, projector
from ..utils.config import LlavaConfig


class LlavaParams(NamedTuple):
    vision: dict
    projector: dict
    lm: dict


def init_params(cfg: LlavaConfig, key: jax.Array, dtype=jnp.bfloat16) -> LlavaParams:
    k1, k2, k3 = jax.random.split(key, 3)
    return LlavaParams(
        vision=clip_vit.init_params(cfg.vision, k1, dtype),
        projector=projector.init_params(
            cfg.vision.hidden_size, cfg.text.hidden_size, k2, dtype
        ),
        lm=llama.init_params(cfg.text, k3, dtype),
    )


def _normalize_hf_keys(sd: dict) -> dict:
    """Accept both pre-4.52 ('language_model.model.*') and post-4.52
    ('model.language_model.*') HF llava key layouts."""
    out = {}
    for k, v in sd.items():
        if k.startswith("model.language_model."):
            k = "language_model.model." + k[len("model.language_model.") :]
        elif k.startswith("model.vision_tower."):
            k = "vision_tower." + k[len("model.vision_tower.") :]
        elif k.startswith("model.multi_modal_projector."):
            k = "multi_modal_projector." + k[len("model.multi_modal_projector.") :]
        elif k == "lm_head.weight":
            k = "language_model.lm_head.weight"
        out[k] = v
    return out


def params_from_hf(cfg: LlavaConfig, sd: dict, dtype=jnp.bfloat16) -> LlavaParams:
    sd = _normalize_hf_keys(sd)
    return LlavaParams(
        vision=clip_vit.params_from_hf(
            cfg.vision, sd, dtype, prefix="vision_tower.vision_model."
        ),
        projector=projector.params_from_hf(sd, dtype),
        lm=llama.params_from_hf(cfg.text, sd, dtype, prefix="language_model."),
    )


def load(model_dir: str, dtype=jnp.bfloat16, cache: bool = True):
    """Load config + weights from an HF checkpoint directory (safetensors),
    with a converted-pytree cache (utils/cache.py) so repeat runs skip the
    torch->jax conversion."""
    from ..utils.cache import load_or_convert
    from ..utils.hf_io import load_state_dict

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = LlavaConfig.from_hf_dict(json.load(f))

    def convert():
        return params_from_hf(cfg, load_state_dict(model_dir), dtype)._asdict()

    tree = load_or_convert(model_dir, convert, dtype, enable=cache)
    return cfg, LlavaParams(**tree)


def image_features(cfg: LlavaConfig, params: LlavaParams, pixel_values: jax.Array):
    """Vision tower @ feature layer -2, drop CLS, project to LM width.

    Reference llava.py:233-246.
    Returns [B, N_img, D_lm].
    """
    hidden = clip_vit.apply(
        cfg.vision, params.vision, pixel_values, cfg.vision_feature_layer
    )
    if cfg.vision_feature_select_strategy == "default":
        hidden = hidden[:, 1:]
    return projector.apply(params.projector, hidden, cfg.projector_hidden_act)


def merge_image_features(
    inputs_embeds: jax.Array,
    image_feats: jax.Array,
    image_pos: jax.Array,
):
    """Replace the single <image> placeholder with N image features.

    Static-shape equivalent of reference llava.py:74-153 for the harness's
    actual regime (batch of un-padded rows, one image each).

    Args:
      inputs_embeds: [B, S, D] text-token embeddings (with a placeholder at
        the image token position).
      image_feats: [B, N, D].
      image_pos: [B] index of the <image> token in each row.
    Returns:
      merged [B, S + N - 1, D]
    """
    B, S, D = inputs_embeds.shape
    N = image_feats.shape[1]
    S_out = S + N - 1
    j = jnp.arange(S_out)[None, :]  # [1, S_out]
    p = image_pos[:, None]  # [B, 1]
    is_img = (j >= p) & (j < p + N)
    text_idx = jnp.where(j < p, j, jnp.clip(j - N + 1, 0, S - 1))
    img_idx = jnp.clip(j - p, 0, N - 1)
    text_part = jnp.take_along_axis(inputs_embeds, text_idx[..., None], axis=1)
    img_part = jnp.take_along_axis(image_feats, img_idx[..., None], axis=1)
    return jnp.where(is_img[..., None], img_part, text_part)


def find_image_pos(input_ids, image_token_index: int):
    """[B, S] -> [B] index of the (single) image token per row."""
    return jnp.argmax((input_ids == image_token_index).astype(jnp.int32), axis=-1)
