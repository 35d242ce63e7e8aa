"""InstructBLIP composition: EVA-ViT -> Q-Former (instruction-aware) ->
linear projection -> Vicuna LM.

Port target: the reference's generate override
(instructblip.py:588-697): vision tower (:608-612), q-former with 32 query
tokens (:617-631), language projection (:633), inputs_embeds =
[projected queries ‖ text embeds] (:661-664), with the dropout-decoding
method living inside the LM (CustomLlamaForCausalLM, :28-165) because the
visual span is positions [0, 32) of the embedded sequence.
"""
from __future__ import annotations

import json
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import blip_vit, llama, qformer
from ..utils.config import InstructBlipConfig


class InstructBlipParams(NamedTuple):
    vision: dict
    qformer: dict
    projection: dict  # {'w': [Dq, Dlm], 'b': [Dlm]}
    lm: dict


def init_params(
    cfg: InstructBlipConfig, key: jax.Array, dtype=jnp.bfloat16
) -> InstructBlipParams:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dq, dl = cfg.qformer.hidden_size, cfg.text.hidden_size
    return InstructBlipParams(
        vision=blip_vit.init_params(cfg.vision, k1, dtype),
        qformer=qformer.init_params(cfg.qformer, k2, dtype),
        projection={
            "w": (0.02 * jax.random.normal(k3, (dq, dl), jnp.float32)).astype(dtype),
            "b": jnp.zeros((dl,), dtype),
        },
        lm=llama.init_params(cfg.text, k4, dtype),
    )


def params_from_hf(
    cfg: InstructBlipConfig, sd: dict, dtype=jnp.bfloat16
) -> InstructBlipParams:
    def g(name):
        t = sd[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    return InstructBlipParams(
        vision=blip_vit.params_from_hf(cfg.vision, sd, dtype),
        qformer=qformer.params_from_hf(cfg.qformer, sd, dtype),
        projection=jax.tree.map(
            lambda a: jnp.asarray(a, dtype),
            {
                "w": np.transpose(g("language_projection.weight")),
                "b": g("language_projection.bias"),
            },
        ),
        lm=llama.params_from_hf(cfg.text, sd, dtype, prefix="language_model."),
    )


def load(model_dir: str, dtype=jnp.bfloat16, cache: bool = True):
    from ..utils.cache import load_or_convert
    from ..utils.hf_io import load_state_dict

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = InstructBlipConfig.from_hf_dict(json.load(f))

    def convert():
        return params_from_hf(cfg, load_state_dict(model_dir), dtype)._asdict()

    tree = load_or_convert(model_dir, convert, dtype, enable=cache)
    return cfg, InstructBlipParams(**tree)


def visual_tokens(
    cfg: InstructBlipConfig,
    params: InstructBlipParams,
    pixel_values: jax.Array,
    qformer_input_ids: jax.Array,
    qformer_attention_mask: jax.Array | None = None,
    image_index: jax.Array | None = None,
) -> jax.Array:
    """pixels + instruction -> [B, 32, D_lm] projected query outputs
    (reference instructblip.py:608-633).

    ``image_index`` ([B] int32, optional): ``pixel_values`` holds only the
    batch's unique images; the ViT runs once per image and rows gather its
    embeddings.  The Q-Former still runs per row — it reads the
    (row-specific) instruction text."""
    image_embeds = blip_vit.apply(cfg.vision, params.vision, pixel_values)
    if image_index is not None:
        image_embeds = image_embeds[image_index]
    query_out = qformer.apply(
        cfg.qformer,
        params.qformer,
        qformer_input_ids,
        image_embeds,
        qformer_attention_mask,
    )
    return (
        jnp.einsum("bqd,de->bqe", query_out, params.projection["w"])
        + params.projection["b"]
    )
