"""LLaVA-NeXT (v1.6): variable-resolution multi-tile visual tokens over a
Mistral-7B LM.

Port target: reference models/llavanext.py:311-600 (anyres tile handling
at :388-427 via HF image_size_to_num_patches / pack_image_features with
"spatial_unpad" + image_newline).  TPU design (SURVEY.md §7 hard part #3):

- Tile geometry (grid shape, unpad crop, token count) is computed on the
  HOST from the original image size — these are static per call, so the
  device program sees only static shapes.
- The packed feature sequence is padded to ``max_image_tokens`` with a
  validity mask; merge/prefill/mask policies consume the mask, so one
  compiled program covers every aspect ratio for a given tile count.
"""
from __future__ import annotations

import json
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import clip_vit, llama, projector
from ..utils.config import LlavaNextConfig


class LlavaNextParams(NamedTuple):
    vision: dict
    projector: dict
    image_newline: jax.Array  # [D]
    lm: dict


# ---------------------------------------------------------------------------
# host-side anyres geometry (pure python; mirrors HF semantics exactly)
# ---------------------------------------------------------------------------

def select_best_resolution(original_size, possible_resolutions):
    """Max effective resolution, then min waste (HF
    image_processing_utils.select_best_resolution)."""
    oh, ow = original_size
    best, max_eff, min_waste = None, 0, float("inf")
    for h, w in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (h, w)
    return best


def anyres_grid_shape(original_size, grid_pinpoints, tile_size):
    h, w = select_best_resolution(original_size, grid_pinpoints)
    return h // tile_size, w // tile_size  # (grid_h, grid_w) in tiles


def unpad_bounds(original_size, grid_cells_hw):
    """Crop offsets/sizes in feature cells (HF unpad_image semantics,
    modeling_llava_next.py:109-145)."""
    oh, ow = original_size
    ch, cw = grid_cells_hw
    if ow / oh > cw / ch:
        new_h = int(round(oh * (cw / ow), 7))
        pad = (ch - new_h) // 2
        return pad, 0, ch - 2 * pad, cw
    else:
        new_w = int(round(ow * (ch / oh), 7))
        pad = (cw - new_w) // 2
        return 0, pad, ch, cw - 2 * pad


def image_geometry(original_size, cfg: LlavaNextConfig):
    """All static geometry for one image: (n_tiles, grid_h, grid_w,
    top, left, uh, uw, n_tokens)."""
    cells = cfg.vision.image_size // cfg.vision.patch_size  # 24
    gh, gw = anyres_grid_shape(
        original_size, cfg.image_grid_pinpoints, cfg.vision.image_size
    )
    top, left, uh, uw = unpad_bounds(original_size, (gh * cells, gw * cells))
    n_tokens = cfg.vision.num_patches + uh * (uw + 1)  # base + unpadded+newline
    return {
        "n_tiles": gh * gw + 1,
        "grid": (gh, gw),
        "crop": (top, left, uh, uw),
        "n_tokens": n_tokens,
    }


def max_image_tokens(cfg: LlavaNextConfig) -> int:
    """Upper bound over all pinpoint grids and aspect ratios."""
    cells = cfg.vision.image_size // cfg.vision.patch_size
    best = 0
    for h, w in cfg.image_grid_pinpoints:
        gh, gw = h // cfg.vision.image_size, w // cfg.vision.image_size
        best = max(best, cfg.vision.num_patches + (gh * cells) * (gw * cells + 1))
    return best


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init_params(cfg: LlavaNextConfig, key: jax.Array, dtype=jnp.bfloat16):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return LlavaNextParams(
        vision=clip_vit.init_params(cfg.vision, k1, dtype),
        projector=projector.init_params(
            cfg.vision.hidden_size, cfg.text.hidden_size, k2, dtype
        ),
        image_newline=(
            0.02 * jax.random.normal(k3, (cfg.text.hidden_size,), jnp.float32)
        ).astype(dtype),
        lm=llama.init_params(cfg.text, k4, dtype),
    )


def params_from_hf(cfg: LlavaNextConfig, sd: dict, dtype=jnp.bfloat16):
    from .llava import _normalize_hf_keys

    sd = _normalize_hf_keys(sd)
    newline = sd["image_newline"] if "image_newline" in sd else sd["model.image_newline"]
    if hasattr(newline, "detach"):
        newline = newline.detach().to("cpu").float().numpy()
    return LlavaNextParams(
        vision=clip_vit.params_from_hf(
            cfg.vision, sd, dtype, prefix="vision_tower.vision_model."
        ),
        projector=projector.params_from_hf(sd, dtype),
        image_newline=jnp.asarray(np.asarray(newline), dtype),
        lm=llama.params_from_hf(cfg.text, sd, dtype, prefix="language_model."),
    )


def load(model_dir: str, dtype=jnp.bfloat16, cache: bool = True):
    from ..utils.cache import load_or_convert
    from ..utils.hf_io import load_state_dict

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = LlavaNextConfig.from_hf_dict(json.load(f))

    def convert():
        return params_from_hf(cfg, load_state_dict(model_dir), dtype)._asdict()

    tree = load_or_convert(model_dir, convert, dtype, enable=cache)
    return cfg, LlavaNextParams(**tree)


# ---------------------------------------------------------------------------
# device-side feature packing
# ---------------------------------------------------------------------------

def packing_indices(
    cfg: LlavaNextConfig, geometry: dict, out_len: int, pad_tiles: int | None = None
):
    """HOST-side gather plan for spatial_unpad packing.

    Returns (gather_idx [out_len] int32, valid [out_len] bool) where
    gather_idx indexes a flat source of n_tiles*num_patches projected tile
    features with index ``n_tiles*num_patches`` denoting the image_newline
    vector.  Equivalent of HF pack_image_features (modeling_llava_next.py:
    282-340: base tile features, then the unpadded spatial grid row-major
    with a newline feature per row) — but as DATA, so the device program's
    shape depends only on (n_tiles, out_len) and aspect-ratio variation
    never recompiles.

    ``pad_tiles``: when images are batched, every row's tile stack is
    padded to a common count; the newline vector then lives at
    ``pad_tiles * num_patches`` in each row's flat feature source.
    """
    gh, gw = geometry["grid"]
    top, left, uh, uw = geometry["crop"]
    cells = cfg.vision.image_size // cfg.vision.patch_size
    n_base = cfg.vision.num_patches
    n_tiles = geometry["n_tiles"]
    newline_idx = (pad_tiles if pad_tiles is not None else n_tiles) * n_base

    idx = list(range(n_base))  # base tile features (tile 0)
    for r in range(top, top + uh):
        g_row, cell_row = divmod(r, cells)
        for c in range(left, left + uw):
            g_col, cell_col = divmod(c, cells)
            tile = 1 + g_row * gw + g_col
            idx.append(tile * n_base + cell_row * cells + cell_col)
        idx.append(newline_idx)
    n_tokens = len(idx)
    assert n_tokens == geometry["n_tokens"], (n_tokens, geometry)
    gather = np.full(out_len, newline_idx, np.int32)
    gather[:n_tokens] = np.asarray(idx, np.int32)
    valid = np.arange(out_len) < n_tokens
    return gather, valid


def pack_image_features(
    cfg: LlavaNextConfig,
    params: LlavaNextParams,
    tile_pixels: jax.Array,
    gather_idx: jax.Array,
):
    """tiles + host gather plan -> packed visual-token features [out_len, D].

    Args:
      tile_pixels: [n_tiles, 3, T, T] (base tile first).
      gather_idx: [out_len] from packing_indices (device array ok).
    """
    from .llava import image_features as _clip_project

    feats = _clip_project(cfg, params, tile_pixels)  # [n_tiles, P, D]
    D = feats.shape[-1]
    flat = jnp.concatenate(
        [feats.reshape(-1, D), params.image_newline[None].astype(feats.dtype)], 0
    )
    return flat[gather_idx]


def pack_image_features_batched(
    cfg: LlavaNextConfig,
    params: LlavaNextParams,
    tile_pixels: jax.Array,
    gather_idx: jax.Array,
):
    """Batched tiles + per-row gather plans -> packed features [B, N, D].

    Args:
      tile_pixels: [B, T_pad, 3, S, S] — each row's tiles padded to a
        common T_pad (padded tiles are never referenced by gather_idx).
      gather_idx: [B, N] from packing_indices(..., pad_tiles=T_pad).
    """
    from .llava import image_features as _clip_project

    B, T = tile_pixels.shape[:2]
    feats = _clip_project(cfg, params, tile_pixels.reshape((B * T,) + tile_pixels.shape[2:]))
    D = feats.shape[-1]
    feats = feats.reshape(B, T * feats.shape[1], D)  # [B, T*P, D]
    newline = jnp.broadcast_to(
        params.image_newline[None, None].astype(feats.dtype), (B, 1, D)
    )
    flat = jnp.concatenate([feats, newline], axis=1)  # [B, T*P + 1, D]
    return jnp.take_along_axis(flat, gather_idx[..., None], axis=1)


def merge_with_text_batched(
    inputs_embeds: jax.Array,
    packed_features: jax.Array,
    valid: jax.Array,
    image_pos: jax.Array,
    text_lens: jax.Array | None = None,
):
    """Batched ``merge_with_text`` with per-row DYNAMIC image positions.

    Args:
      inputs_embeds: [B, S_text, D]; packed_features: [B, N_max, D];
      valid: [B, N_max]; image_pos: [B] int32.
      text_lens: optional [B] per-row REAL text length for right-padded
        variable-length batches; pad positions map past real_len and are
        zeroed/masked like the visual padding.
    Returns:
      (merged [B, S_out, D], key_mask [B, S_out], real_len [B]).
    Layout per row: [pre | packed_valid | post | pad...]; all index math
    is gather-based so one compiled program covers every (image position,
    token count) combination in the batch.
    """
    B, S_text, D = inputs_embeds.shape
    N_max = packed_features.shape[1]
    n_img = jnp.sum(valid, axis=1)  # [B]
    S_out = S_text - 1 + N_max
    t_len = S_text if text_lens is None else jnp.asarray(text_lens, jnp.int32)
    real_len = t_len - 1 + n_img  # [B]

    j = jnp.arange(S_out)[None, :]  # [1, S_out]
    ip = image_pos[:, None]
    ni = n_img[:, None]
    in_img = (j >= ip) & (j < ip + ni)
    beyond = j >= real_len[:, None]

    # text source index: j before the image span, j - n_img + 1 after
    text_idx = jnp.clip(jnp.where(j < ip, j, j - ni + 1), 0, S_text - 1)
    text_part = jnp.take_along_axis(inputs_embeds, text_idx[..., None], axis=1)
    img_idx = jnp.clip(j - ip, 0, N_max - 1)
    img_part = jnp.take_along_axis(
        packed_features.astype(inputs_embeds.dtype), img_idx[..., None], axis=1
    )
    out = jnp.where(in_img[..., None], img_part, text_part)
    out = jnp.where(beyond[..., None], 0.0, out)
    return out, ~beyond, real_len


def merge_with_text(
    inputs_embeds: jax.Array,
    packed_features: jax.Array,
    valid: jax.Array,
    image_pos: int,
):
    """Insert the packed (padded) visual features at the <image> position;
    padding slots go to the END of the merged sequence so real tokens stay
    contiguous.

    Args:
      inputs_embeds: [S_text, D] (single row).
      packed_features: [N_max, D]; valid: [N_max].
      image_pos: static index of the <image> token.
    Returns:
      (merged [S_text - 1 + N_max, D], key_mask [S_out], real_len int array)
    """
    S_text, D = inputs_embeds.shape
    N_max = packed_features.shape[0]
    n_img = jnp.sum(valid)
    S_out = S_text - 1 + N_max
    real_len = S_text - 1 + n_img

    j = jnp.arange(S_out)
    pre = inputs_embeds[:image_pos]  # [image_pos, D]
    post = inputs_embeds[image_pos + 1 :]  # [S_text-1-image_pos, D]

    # layout: [pre | packed_valid | post | pad...] via gather index math
    in_pre = j < image_pos
    in_img = (j >= image_pos) & (j < image_pos + n_img)
    in_post = (j >= image_pos + n_img) & (j < real_len)

    pre_idx = jnp.clip(j, 0, max(image_pos - 1, 0))
    img_idx = jnp.clip(j - image_pos, 0, N_max - 1)
    post_idx = jnp.clip(j - image_pos - n_img, 0, max(S_text - 2 - image_pos, 0))

    out = jnp.zeros((S_out, D), inputs_embeds.dtype)
    if image_pos > 0:
        out = jnp.where(in_pre[:, None], pre[pre_idx], out)
    out = jnp.where(in_img[:, None], packed_features[img_idx].astype(out.dtype), out)
    if S_text - 1 - image_pos > 0:
        out = jnp.where(in_post[:, None], post[post_idx], out)
    key_mask = j < real_len
    return out, key_mask, real_len
