"""CLIP vision tower + projector + merge parity vs HF tiny models
(reference llava.py:233-250 pipeline)."""
import pytest

import numpy as np
import torch

import jax.numpy as jnp

from dropoutdecoding_tpu.models import clip_vit, llava, projector
from dropoutdecoding_tpu.utils.config import ClipVisionConfig, LlamaConfig, LlavaConfig
from dropoutdecoding_tpu.utils.hf_io import state_dict_from_torch_module

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def make_tiny_hf_clip(seed=0):
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel

    torch.manual_seed(seed)
    hf_cfg = HFCfg(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        image_size=28,
        patch_size=7,
        attn_implementation="eager",
    )
    model = CLIPVisionModel(hf_cfg).eval().float()
    cfg = ClipVisionConfig.from_hf_dict(hf_cfg.to_dict())
    params = clip_vit.params_from_hf(
        cfg, state_dict_from_torch_module(model), jnp.float32
    )
    return model, cfg, params


def test_clip_hidden_states_match_hf(rng):
    model, cfg, params = make_tiny_hf_clip()
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(pixels), output_hidden_states=True)
    for fl in (-2, -1):
        ours = np.asarray(clip_vit.apply(cfg, params, jnp.asarray(pixels), fl))
        ref = out.hidden_states[fl].numpy()
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_full_tiny_llava_prefill_matches_hf(rng):
    """End-to-end: vision -> projector -> merge -> LM logits vs HF
    LlavaForConditionalGeneration (the reference's prefill call stack,
    SURVEY.md §3.1)."""
    from transformers import (
        CLIPVisionConfig as HFVCfg,
        LlamaConfig as HFLCfg,
        LlavaConfig as HFLlavaCfg,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(7)
    hf_cfg = HFLlavaCfg(
        vision_config=HFVCfg(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=4,
            num_attention_heads=4,
            image_size=28,
            patch_size=7,
        ).to_dict(),
        text_config=HFLCfg(
            vocab_size=64,
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=128,
        ).to_dict(),
        image_token_index=32,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        attn_implementation="eager",
    )
    model = LlavaForConditionalGeneration(hf_cfg).eval().float()
    cfg = LlavaConfig.from_hf_dict(hf_cfg.to_dict())
    params = llava.params_from_hf(cfg, state_dict_from_torch_module(model), jnp.float32)

    # prompt: [bos text text <image> text text].  transformers >= 4.47
    # requires the image token pre-expanded to one-per-patch; the reference
    # (4.44) and our merge expand a single token internally — both produce
    # the same final sequence.
    input_ids = np.array([[1, 5, 9, 32, 11, 13]])
    expanded_ids = np.array([[1, 5, 9] + [32] * 16 + [11, 13]])
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(expanded_ids),
            pixel_values=torch.from_numpy(pixels),
            attention_mask=torch.ones_like(torch.from_numpy(expanded_ids)),
        ).logits.numpy()

    from dropoutdecoding_tpu.models import llama as llama_mod

    image_pos = llava.find_image_pos(jnp.asarray(input_ids), cfg.image_token_index)
    feats = llava.image_features(cfg, params, jnp.asarray(pixels))
    text_embeds = llama_mod.embed(
        params.lm,
        jnp.where(jnp.asarray(input_ids) == cfg.image_token_index, 0, jnp.asarray(input_ids)),
    )
    merged = llava.merge_image_features(text_embeds, feats, image_pos)
    S = merged.shape[1]
    assert S == 6 + 16 - 1  # 16 patches replace 1 token
    positions = jnp.broadcast_to(jnp.arange(S)[None], (1, S))
    hidden, _ = llama_mod.prefill(params.lm, cfg.text, merged, positions)
    ours = np.asarray(llama_mod.lm_head(params.lm, hidden))
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-4)
