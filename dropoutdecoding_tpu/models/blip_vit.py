"""InstructBLIP vision tower (EVA ViT-g/14 as shipped in HF
InstructBlipVisionModel): pre-norm transformer with a fused qkv projection,
learned position embeddings, and a final post-layernorm.  Used by the
InstructBLIP path of the reference (instructblip.py:608-612: the full
tower's last_hidden_state feeds the Q-Former)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import act_fn, layer_norm
from ..utils.config import BlipVisionConfig


def init_params(cfg: BlipVisionConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    ks = jax.random.split(key, 8)
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    P = cfg.patch_size

    def nrm(k, shape, scale=0.02):
        return (scale * jax.random.normal(k, shape, jnp.float32)).astype(dtype)

    patch_bias = jnp.zeros((D,), dtype)
    layers = {
        "ln1_w": jnp.ones((L, D), dtype),
        "ln1_b": jnp.zeros((L, D), dtype),
        "ln2_w": jnp.ones((L, D), dtype),
        "ln2_b": jnp.zeros((L, D), dtype),
        "qkv_w": nrm(ks[0], (L, D, 3 * D)),
        "q_b": jnp.zeros((L, D), dtype),
        "v_b": jnp.zeros((L, D), dtype),
        "proj_w": nrm(ks[1], (L, D, D)),
        "proj_b": jnp.zeros((L, D), dtype),
        "fc1_w": nrm(ks[2], (L, D, I)),
        "fc1_b": jnp.zeros((L, I), dtype),
        "fc2_w": nrm(ks[3], (L, I, D)),
        "fc2_b": jnp.zeros((L, D), dtype),
    }
    return {
        "class_embedding": nrm(ks[4], (D,)),
        "patch_embedding": nrm(ks[5], (3 * P * P, D)),
        "patch_bias": patch_bias,
        "position_embedding": nrm(ks[6], (cfg.num_positions, D)),
        "post_ln_w": jnp.ones((D,), dtype),
        "post_ln_b": jnp.zeros((D,), dtype),
        "layers": layers,
    }


def params_from_hf(
    cfg: BlipVisionConfig, sd: dict, dtype=jnp.bfloat16, prefix="vision_model."
) -> dict:
    def g(name):
        t = sd[prefix + name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def lin(name):
        return np.transpose(g(name))

    L = cfg.num_hidden_layers
    D = cfg.hidden_size

    def stack(fmt, f=g):
        return np.stack([f(fmt.format(i)) for i in range(L)])

    conv = g("embeddings.patch_embedding.weight")  # [D, 3, P, P]
    patch_w = conv.reshape(conv.shape[0], -1).T

    # HF InstructBlipVisionAttention: fused qkv with bias only on q and v
    qkv_b = np.stack(
        [g(f"encoder.layers.{i}.self_attn.qkv.bias") for i in range(L)]
    )  # [L, 3D]
    layers = {
        "ln1_w": stack("encoder.layers.{}.layer_norm1.weight"),
        "ln1_b": stack("encoder.layers.{}.layer_norm1.bias"),
        "ln2_w": stack("encoder.layers.{}.layer_norm2.weight"),
        "ln2_b": stack("encoder.layers.{}.layer_norm2.bias"),
        "qkv_w": stack("encoder.layers.{}.self_attn.qkv.weight", lin),
        "q_b": qkv_b[:, :D],
        "v_b": qkv_b[:, 2 * D :],
        "proj_w": stack("encoder.layers.{}.self_attn.projection.weight", lin),
        "proj_b": stack("encoder.layers.{}.self_attn.projection.bias"),
        "fc1_w": stack("encoder.layers.{}.mlp.fc1.weight", lin),
        "fc1_b": stack("encoder.layers.{}.mlp.fc1.bias"),
        "fc2_w": stack("encoder.layers.{}.mlp.fc2.weight", lin),
        "fc2_b": stack("encoder.layers.{}.mlp.fc2.bias"),
    }
    params = {
        "class_embedding": g("embeddings.class_embedding").reshape(-1),
        "patch_embedding": patch_w,
        "patch_bias": g("embeddings.patch_embedding.bias"),
        "position_embedding": g("embeddings.position_embedding").reshape(
            cfg.num_positions, -1
        ),
        "post_ln_w": g("post_layernorm.weight"),
        "post_ln_b": g("post_layernorm.bias"),
        "layers": layers,
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def apply(cfg: BlipVisionConfig, params: dict, pixel_values: jax.Array) -> jax.Array:
    """Full tower -> post-layernormed last hidden state [B, 1+P, D]."""
    from .clip_vit import patchify

    dtype = params["patch_embedding"].dtype
    B = pixel_values.shape[0]
    D = cfg.hidden_size
    patches = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = jnp.einsum("bnp,pd->bnd", patches, params["patch_embedding"]) + params["patch_bias"]
    cls = jnp.broadcast_to(params["class_embedding"][None, None, :], (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None, : x.shape[1]]

    H = cfg.num_attention_heads
    Dh = D // H
    act = act_fn(cfg.hidden_act)

    def layer(h, lp):
        S = h.shape[1]
        r = layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        qkv = jnp.einsum("bsd,de->bse", r, lp["qkv_w"])  # [B, S, 3D]
        q = (qkv[..., :D] + lp["q_b"]).reshape(B, S, H, Dh)
        k = qkv[..., D : 2 * D].reshape(B, S, H, Dh)
        v = (qkv[..., 2 * D :] + lp["v_b"]).reshape(B, S, H, Dh)
        scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
        scores = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            * scale
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(h.dtype).reshape(B, S, D)
        h = h + jnp.einsum("bse,ed->bsd", attn, lp["proj_w"]) + lp["proj_b"]
        r = layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        r = act(jnp.einsum("bsd,di->bsi", r, lp["fc1_w"]) + lp["fc1_b"])
        h = h + jnp.einsum("bsi,id->bsd", r, lp["fc2_w"]) + lp["fc2_b"]
        return h, None

    x, _ = jax.lax.scan(layer, x, params["layers"])
    return layer_norm(x, params["post_ln_w"], params["post_ln_b"], cfg.layer_norm_eps)
