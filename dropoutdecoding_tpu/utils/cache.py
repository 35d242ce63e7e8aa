"""Converted-parameter caching.

The reference reloads HF checkpoints via from_pretrained every run
(chair_test.py:188-214).  Torch-bin -> jax pytree conversion of a 7B
model is minutes of host work; cache the converted pytree with orbax so
subsequent runs stream it straight to device (SURVEY.md §5
checkpoint/resume row)."""
from __future__ import annotations

import hashlib
import os


def _cache_dir(model_dir: str, dtype_name: str) -> str:
    tag = hashlib.sha1(
        f"{os.path.abspath(model_dir)}:{dtype_name}".encode()
    ).hexdigest()[:16]
    base = os.environ.get(
        "DROPOUTDECODING_CACHE", os.path.expanduser("~/.cache/dropoutdecoding_tpu")
    )
    return os.path.join(base, tag)


def load_or_convert(model_dir: str, convert_fn, dtype, enable: bool = True):
    """convert_fn() -> pytree; cached per (model_dir, dtype)."""
    import jax.numpy as jnp

    import jax

    dtype_name = jnp.dtype(dtype).name
    path = _cache_dir(model_dir, dtype_name)
    if enable and os.path.isdir(path):
        try:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                tree = ckptr.restore(path)
            return jax.tree.map(jnp.asarray, tree)
        except Exception:
            pass  # fall through to reconversion
    tree = convert_fn()
    if enable:
        try:
            import orbax.checkpoint as ocp

            os.makedirs(os.path.dirname(path), exist_ok=True)
            with ocp.StandardCheckpointer() as ckptr:
                ckptr.save(path, tree)
                ckptr.wait_until_finished()
        except Exception:
            pass
    return tree
