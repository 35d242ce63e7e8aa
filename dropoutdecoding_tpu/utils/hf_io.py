"""HF checkpoint IO: safetensors / pytorch_model.bin directories -> flat
state dicts of numpy arrays (replaces the reference's reliance on
``from_pretrained(device_map="auto")``, chair_test.py:188-214)."""
from __future__ import annotations

import glob
import os

import numpy as np


def load_state_dict(model_dir: str) -> dict:
    """Load all weights in a checkpoint directory into {name: np.ndarray}.

    Multi-file checkpoints: when HF's ``model.safetensors.index.json`` is
    present (the real llava-1.5-7b layout: weight_map -> 3 shards), the
    shards named there are loaded and the result is checked against the
    full weight_map — a missing shard or tensor fails loudly instead of
    producing a silently partial tree.  bf16 tensors come back as
    ml_dtypes.bfloat16 (safetensors' numpy framework), which jnp.asarray
    consumes zero-copy."""
    sd = {}
    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        import json

        from safetensors import safe_open

        with open(index_path) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            path = os.path.join(model_dir, shard)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"index names shard {shard!r} but it is missing from "
                    f"{model_dir}"
                )
            with safe_open(path, framework="np") as f:
                for name in f.keys():
                    sd[name] = f.get_tensor(name)
        missing = set(weight_map) - set(sd)
        if missing:
            raise ValueError(
                f"{len(missing)} tensors named in the index are absent "
                f"from their shards, e.g. {sorted(missing)[:3]}"
            )
        return sd
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for path in st_files:
            with safe_open(path, framework="np") as f:
                for name in f.keys():
                    sd[name] = f.get_tensor(name)
        return sd
    bin_files = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no safetensors/bin weights in {model_dir}")
    import torch

    for path in bin_files:
        part = torch.load(path, map_location="cpu", weights_only=True)
        for k, v in part.items():
            sd[k] = v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
    return sd


def state_dict_from_torch_module(module) -> dict:
    """Convert a live torch nn.Module's state dict (used by parity tests that
    build tiny random HF models in-process)."""
    return {
        k: v.detach().to("cpu").float().numpy() for k, v in module.state_dict().items()
    }
