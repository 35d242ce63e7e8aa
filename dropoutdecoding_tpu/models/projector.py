"""Multi-modal projector: 2-layer GELU MLP mapping vision hidden size to LM
hidden size (reference llava.py:246, HF LlavaMultiModalProjector)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import act_fn


def init_params(d_in: int, d_out: int, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "fc1_w": (0.02 * jax.random.normal(k1, (d_in, d_out), jnp.float32)).astype(dtype),
        "fc1_b": jnp.zeros((d_out,), dtype),
        "fc2_w": (0.02 * jax.random.normal(k2, (d_out, d_out), jnp.float32)).astype(dtype),
        "fc2_b": jnp.zeros((d_out,), dtype),
    }


def params_from_hf(sd: dict, dtype=jnp.bfloat16, prefix="multi_modal_projector.") -> dict:
    def g(name):
        t = sd[prefix + name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    params = {
        "fc1_w": np.transpose(g("linear_1.weight")),
        "fc1_b": g("linear_1.bias"),
        "fc2_w": np.transpose(g("linear_2.weight")),
        "fc2_b": g("linear_2.bias"),
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def apply(params: dict, x: jax.Array, act: str = "gelu") -> jax.Array:
    h = act_fn(act)(jnp.einsum("...d,de->...e", x, params["fc1_w"]) + params["fc1_b"])
    return jnp.einsum("...d,de->...e", h, params["fc2_w"]) + params["fc2_b"]
