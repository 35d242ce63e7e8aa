"""Programmatic quickstart for dropoutdecoding_tpu.

Run with a real checkpoint:
    python examples/quickstart.py --model-path /ckpts/llava-1.5-7b-hf \
        --image /data/coco/val2014/COCO_val2014_000000391895.jpg

Without arguments it runs a synthetic-weights demo (no downloads needed):
    python examples/quickstart.py
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# allow running from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def demo_synthetic():
    """Tiny random-weight LLaVA: shows the engine + serving APIs."""
    import jax
    import jax.numpy as jnp

    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.engine.serving import DecodeServer
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.utils.config import (
        ClipVisionConfig,
        EnsembleConfig,
        GenerationConfig,
        LlamaConfig,
        LlavaConfig,
    )

    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=256, hidden_size=256, intermediate_size=512,
            num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
            head_dim=32,
        ),
        vision=ClipVisionConfig(
            hidden_size=128, intermediate_size=256, num_hidden_layers=3,
            num_attention_heads=4, image_size=56, patch_size=14,
        ),
        image_token_index=254,
        pad_token_id=255,
    )
    params = llava_mod.init_params(cfg, jax.random.key(0), jnp.bfloat16)

    engine = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(voting_probs=(0.3, 0.5, 0.7), fused_step=True),
        gen=GenerationConfig(max_new_tokens=16, eos_token_id=2, pad_token_id=2),
        max_len=96,
        ensemble=True,
    )

    input_ids = np.array([[1, 7, 9, cfg.image_token_index, 11, 13]], np.int32)
    pixels = np.random.default_rng(0).normal(size=(1, 3, 56, 56)).astype(np.float32)

    # single request
    out = engine.generate(input_ids, pixels)
    print("tokens:", out.tokens[0][: out.num_tokens[0]])

    # uncertainty introspection
    state = engine.prefill(input_ids, pixels)
    print("image-level epistemic uncertainty:", float(state.uncertainty["epis_uncert"][0]))

    # continuous-batching server
    server = DecodeServer(engine=engine, n_slots=2)
    results = server.run(
        ["a", "b", "c"], lambda rid: (input_ids, pixels)
    )
    print("served:", {k: v[:4].tolist() for k, v in results.items()})


def demo_checkpoint(model_path: str, image_path: str):
    import jax.numpy as jnp
    from PIL import Image

    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models import llava as llava_mod
    from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig
    from dropoutdecoding_tpu.utils.processor import VlmProcessor

    cfg, params = llava_mod.load(model_path, jnp.bfloat16)
    processor = VlmProcessor.from_checkpoint(model_path)
    eos = processor.tokenizer.eos_token_id
    engine = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(),  # K=3 dropout decoding
        gen=GenerationConfig(max_new_tokens=512, eos_token_id=eos, pad_token_id=eos),
        max_len=cfg.vision.num_patches + 64 + 512,
    )
    prompt = "USER: <image>\nDescribe the image. ASSISTANT:"
    image = Image.open(image_path).convert("RGB")
    inputs = processor(prompt, image)
    out = engine.generate(inputs["input_ids"], inputs["pixel_values"])
    print(processor.decode(out.tokens[0][: out.num_tokens[0]]))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", default=None)
    p.add_argument("--image", default=None)
    a = p.parse_args()
    if a.model_path and a.image:
        demo_checkpoint(a.model_path, a.image)
    else:
        demo_synthetic()
