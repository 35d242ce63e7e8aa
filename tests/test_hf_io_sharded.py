"""Sharded multi-file safetensors loading (round-4 verdict item 4): the
real llava-1.5-7b checkpoint ships as bf16 shards + a
model.safetensors.index.json weight_map; utils/hf_io.load_state_dict must
resolve the index, stitch the shards, and fail loudly on a partial
checkpoint.  Exercised end-to-end: sharded dir -> llava.load -> greedy
generate matches the in-memory conversion."""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


@pytest.fixture
def sharded_ckpt(tmp_path, tiny_llava):
    """tiny HF LLaVA written as a 3-shard bf16 safetensors checkpoint with
    the HF index layout (vision shard / language shards split mid-tower,
    like the real 7B's 3-file split)."""
    import torch
    from safetensors.torch import save_file

    model, cfg, params, input_ids, expanded_ids, pixels = tiny_llava
    sd = {k: v.to(torch.bfloat16) for k, v in model.state_dict().items()}
    names = sorted(sd)
    # deterministic 3-way split that cuts through the language tower
    shards = {
        "model-00001-of-00003.safetensors": names[: len(names) // 3],
        "model-00002-of-00003.safetensors": names[len(names) // 3 : 2 * len(names) // 3],
        "model-00003-of-00003.safetensors": names[2 * len(names) // 3 :],
    }
    weight_map = {}
    for shard, keys in shards.items():
        save_file({k: sd[k] for k in keys}, str(tmp_path / shard))
        weight_map.update({k: shard for k in keys})
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps({"metadata": {"total_size": 0}, "weight_map": weight_map})
    )
    (tmp_path / "config.json").write_text(json.dumps(model.config.to_dict()))
    return tmp_path, model, cfg, input_ids, pixels


def test_index_resolved_and_bf16_decoded(sharded_ckpt):
    import torch

    from dropoutdecoding_tpu.utils.hf_io import load_state_dict

    ckpt_dir, model, cfg, _, _ = sharded_ckpt
    sd = load_state_dict(str(ckpt_dir))
    ref = model.state_dict()
    assert set(sd) == set(ref)
    for k in list(ref)[:5]:
        np.testing.assert_allclose(
            np.asarray(sd[k], np.float32),
            ref[k].to(torch.bfloat16).float().numpy(),
            rtol=0, atol=0,
        )


def test_sharded_load_end_to_end_generate(sharded_ckpt):
    """llava.load on the sharded dir produces an engine whose greedy
    tokens equal the in-memory conversion's (the loader path is proven
    before real weights arrive)."""
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.models import llava
    from dropoutdecoding_tpu.utils.config import GenerationConfig
    from dropoutdecoding_tpu.utils.hf_io import state_dict_from_torch_module

    ckpt_dir, model, _, input_ids, pixels = sharded_ckpt
    cfg, params = llava.load(str(ckpt_dir), jnp.float32, cache=False)

    params_mem = llava.params_from_hf(
        cfg, state_dict_from_torch_module(model), jnp.float32
    )

    def mk(p):
        return LlavaEngine(
            cfg=cfg,
            params=p,
            gen=GenerationConfig(
                max_new_tokens=4, eos_token_id=-1, pad_token_id=0
            ),
            max_len=40,
            ensemble=False,
        )

    out_disk = mk(params).generate(input_ids, pixels)
    out_mem = mk(params_mem).generate(input_ids, pixels)
    # disk round-trip is bf16-quantized; the decoded tokens must agree
    # (tiny random model, distinct logits)
    np.testing.assert_array_equal(out_disk.tokens, out_mem.tokens)


def test_missing_shard_fails_loudly(sharded_ckpt):
    from dropoutdecoding_tpu.utils.hf_io import load_state_dict

    ckpt_dir, *_ = sharded_ckpt
    os.remove(ckpt_dir / "model-00002-of-00003.safetensors")
    with pytest.raises(FileNotFoundError, match="00002"):
        load_state_dict(str(ckpt_dir))


def test_index_with_missing_tensor_fails_loudly(tmp_path):
    import torch
    from safetensors.torch import save_file

    save_file(
        {"a.weight": torch.zeros(2, 2)},
        str(tmp_path / "model-00001-of-00001.safetensors"),
    )
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps(
            {
                "weight_map": {
                    "a.weight": "model-00001-of-00001.safetensors",
                    "b.weight": "model-00001-of-00001.safetensors",
                }
            }
        )
    )
    from dropoutdecoding_tpu.utils.hf_io import load_state_dict

    with pytest.raises(ValueError, match="absent"):
        load_state_dict(str(tmp_path))
