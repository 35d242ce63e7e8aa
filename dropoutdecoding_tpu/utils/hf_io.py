"""HF checkpoint IO: safetensors / pytorch_model.bin directories -> flat
state dicts of numpy arrays (replaces the reference's reliance on
``from_pretrained(device_map="auto")``, chair_test.py:188-214)."""
from __future__ import annotations

import glob
import os

import numpy as np


def load_state_dict(model_dir: str) -> dict:
    """Load all weights in a checkpoint directory into {name: np.ndarray}."""
    sd = {}
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
