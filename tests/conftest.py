import os

# Tests run on a virtual 8-device CPU mesh (SURVEY.md §4): multi-chip
# sharding paths compile and execute without TPU hardware.  NOTE: in this
# container a sitecustomize force-registers a TPU plugin and pins
# JAX_PLATFORMS in the env, so the env-var route is not enough — the config
# must be updated post-import, before first backend use.
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older flag spelling already covered by XLA_FLAGS

# fp32 parity tests need true fp32 matmuls: JAX's "default" matmul precision
# is bf16-grade on both CPU (oneDNN) and TPU (MXU passes).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_llava():
    """Tiny random HF LLaVA + converted params, shared across test modules."""
    import torch

    import jax.numpy as jnp

    from transformers import (
        CLIPVisionConfig as HFVCfg,
        LlamaConfig as HFLCfg,
        LlavaConfig as HFLlavaCfg,
        LlavaForConditionalGeneration,
    )

    from dropoutdecoding_tpu.models import llava
    from dropoutdecoding_tpu.utils.config import LlavaConfig
    from dropoutdecoding_tpu.utils.hf_io import state_dict_from_torch_module

    torch.manual_seed(11)
    hf_cfg = HFLlavaCfg(
        vision_config=HFVCfg(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
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
    r = np.random.default_rng(3)
    input_ids = np.array([[1, 5, 9, 32, 11, 13, 17]])
    expanded_ids = np.array([[1, 5, 9] + [32] * 16 + [11, 13, 17]])
    pixels = r.normal(size=(1, 3, 28, 28)).astype(np.float32)
    return model, cfg, params, input_ids, expanded_ids, pixels
