"""CLIP ViT vision tower (LLaVA's ViT-L/14-336).

Functional port of the HF CLIPVisionModel compute graph used by LLaVA
(reference llava.py:233-246): patchify -> pre-layernorm -> N transformer
layers, returning the hidden state at ``vision_feature_layer`` (default -2,
i.e. the output of layer N-1) with the CLS token dropped by the caller.

TPU notes: the stride-14 patch conv is lowered to an unfold + single matmul
(one big MXU op instead of a convolution); layers are stacked and scanned.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import act_fn, layer_norm
from ..utils.config import ClipVisionConfig


def init_params(cfg: ClipVisionConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    ks = jax.random.split(key, 8)
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    P = cfg.patch_size

    def nrm(k, shape, scale=0.02):
        return (scale * jax.random.normal(k, shape, jnp.float32)).astype(dtype)

    layers = {
        "ln1_w": jnp.ones((L, D), dtype),
        "ln1_b": jnp.zeros((L, D), dtype),
        "ln2_w": jnp.ones((L, D), dtype),
        "ln2_b": jnp.zeros((L, D), dtype),
        "q_w": nrm(ks[0], (L, D, D)),
        "q_b": jnp.zeros((L, D), dtype),
        "k_w": nrm(ks[1], (L, D, D)),
        "k_b": jnp.zeros((L, D), dtype),
        "v_w": nrm(ks[2], (L, D, D)),
        "v_b": jnp.zeros((L, D), dtype),
        "out_w": nrm(ks[3], (L, D, D)),
        "out_b": jnp.zeros((L, D), dtype),
        "fc1_w": nrm(ks[4], (L, D, I)),
        "fc1_b": jnp.zeros((L, I), dtype),
        "fc2_w": nrm(ks[5], (L, I, D)),
        "fc2_b": jnp.zeros((L, D), dtype),
    }
    return {
        "class_embedding": nrm(ks[6], (D,)),
        "patch_embedding": nrm(ks[7], (3 * P * P, D)),
        "position_embedding": nrm(jax.random.fold_in(ks[6], 1), (cfg.num_positions, D)),
        "pre_ln_w": jnp.ones((D,), dtype),
        "pre_ln_b": jnp.zeros((D,), dtype),
        "layers": layers,
    }


def params_from_hf(
    cfg: ClipVisionConfig, sd: dict, dtype=jnp.bfloat16, prefix="vision_model."
) -> dict:
    def g(name):
        t = sd[prefix + name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def lin(name):
        return np.transpose(g(name))

    L = cfg.num_hidden_layers

    def stack(fmt, f=g):
        return np.stack([f(fmt.format(i)) for i in range(L)])

    # HF conv weight [D, 3, P, P] -> unfold layout [3*P*P, D] matching
    # x reshaped as [.., C, P, P] flattened (channel-major).
    conv = g("embeddings.patch_embedding.weight")
    D = conv.shape[0]
    patch_w = conv.reshape(D, -1).T

    layers = {
        "ln1_w": stack("encoder.layers.{}.layer_norm1.weight"),
        "ln1_b": stack("encoder.layers.{}.layer_norm1.bias"),
        "ln2_w": stack("encoder.layers.{}.layer_norm2.weight"),
        "ln2_b": stack("encoder.layers.{}.layer_norm2.bias"),
        "q_w": stack("encoder.layers.{}.self_attn.q_proj.weight", lin),
        "q_b": stack("encoder.layers.{}.self_attn.q_proj.bias"),
        "k_w": stack("encoder.layers.{}.self_attn.k_proj.weight", lin),
        "k_b": stack("encoder.layers.{}.self_attn.k_proj.bias"),
        "v_w": stack("encoder.layers.{}.self_attn.v_proj.weight", lin),
        "v_b": stack("encoder.layers.{}.self_attn.v_proj.bias"),
        "out_w": stack("encoder.layers.{}.self_attn.out_proj.weight", lin),
        "out_b": stack("encoder.layers.{}.self_attn.out_proj.bias"),
        "fc1_w": stack("encoder.layers.{}.mlp.fc1.weight", lin),
        "fc1_b": stack("encoder.layers.{}.mlp.fc1.bias"),
        "fc2_w": stack("encoder.layers.{}.mlp.fc2.weight", lin),
        "fc2_b": stack("encoder.layers.{}.mlp.fc2.bias"),
    }
    params = {
        "class_embedding": g("embeddings.class_embedding"),
        "patch_embedding": patch_w,
        "position_embedding": g("embeddings.position_embedding.weight"),
        "pre_ln_w": g("pre_layrnorm.weight"),
        "pre_ln_b": g("pre_layrnorm.bias"),
        "layers": layers,
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """[B, 3, H, W] -> [B, (H/P)*(W/P), 3*P*P] in conv-weight-compatible
    (channel, py, px) order."""
    B, C, H, W = pixel_values.shape
    P = patch_size
    x = pixel_values.reshape(B, C, H // P, P, W // P, P)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, P, P]
    return x.reshape(B, (H // P) * (W // P), C * P * P)


def apply(
    cfg: ClipVisionConfig,
    params: dict,
    pixel_values: jax.Array,
    feature_layer: int = -2,
) -> jax.Array:
    """Run the tower up to ``feature_layer``.

    hidden_states in HF indexing: index 0 is the pre-layernorm embedding
    output, index i the output of layer i; feature_layer=-2 therefore means
    running (num_layers - 1) layers.

    Args:
      pixel_values: [B, 3, H, W] normalized pixels.
    Returns:
      [B, 1 + num_patches, D] hidden states (CLS first).
    """
    dtype = params["patch_embedding"].dtype
    B = pixel_values.shape[0]
    patches = patchify(pixel_values.astype(dtype), cfg.patch_size)
    x = jnp.einsum("bnp,pd->bnd", patches, params["patch_embedding"])
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (B, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None, : x.shape[1]]
    x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)

    n_run = cfg.num_hidden_layers + 1 + feature_layer if feature_layer < 0 else feature_layer
    H = cfg.num_attention_heads
    D = cfg.hidden_size
    Dh = D // H
    act = act_fn(cfg.hidden_act)

    def layer(h, lp):
        S = h.shape[1]
        r = layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = (jnp.einsum("bsd,de->bse", r, lp["q_w"]) + lp["q_b"]).reshape(B, S, H, Dh)
        k = (jnp.einsum("bsd,de->bse", r, lp["k_w"]) + lp["k_b"]).reshape(B, S, H, Dh)
        v = (jnp.einsum("bsd,de->bse", r, lp["v_w"]) + lp["v_b"]).reshape(B, S, H, Dh)
        scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
        scores = (
            jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            * scale
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(h.dtype)
        attn = attn.reshape(B, S, D)
        h = h + jnp.einsum("bse,ed->bsd", attn, lp["out_w"]) + lp["out_b"]
        r = layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        r = act(jnp.einsum("bsd,di->bsi", r, lp["fc1_w"]) + lp["fc1_b"])
        h = h + jnp.einsum("bsi,id->bsd", r, lp["fc2_w"]) + lp["fc2_b"]
        return h, None

    sliced = jax.tree.map(lambda a: a[:n_run], params["layers"])
    x, _ = jax.lax.scan(layer, x, sliced)
    return x
