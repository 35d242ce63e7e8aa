"""CLIP text tower + zero-shot classification head.

The im-consistency analysis (reference chair_metrics/im_consistency.py:
24-44) scores hallucinated objects against an image classifier's
predictions; the reference ships neither the classifier nor its outputs
(dormant .npy inputs).  This module supplies a real classifier: CLIP
zero-shot over the 80 COCO classes — text tower here, vision tower
reused from models/clip_vit.py plus the checkpoint's post-layernorm and
projection heads.

Functional port of the HF CLIPTextModel compute graph: token + position
embeddings -> causal transformer (same pre-LN block as the vision
tower) -> final layer norm -> pooled at each sequence's EOS position ->
text_projection.  Weights come from a FULL CLIP checkpoint (e.g.
openai/clip-vit-large-patch14-336); LLaVA checkpoints embed only the
vision encoder, which is why the engine-native projection classifier
(evalsuite/im_classifier.py) is the default and this is the opt-in.

TPU notes: layers stacked and scanned like the vision tower; the causal
mask is a static triangular bias (prompts are padded to one static
length per class batch), so one compiled program classifies any class
set.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import act_fn, layer_norm
from ..utils.config import ClipTextConfig


def init_params(cfg: ClipTextConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    ks = jax.random.split(key, 8)
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers

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
        "token_embedding": nrm(ks[6], (cfg.vocab_size, D)),
        "position_embedding": nrm(ks[7], (cfg.max_position_embeddings, D)),
        "final_ln_w": jnp.ones((D,), dtype),
        "final_ln_b": jnp.zeros((D,), dtype),
        "text_projection": nrm(
            jax.random.fold_in(ks[6], 1), (D, cfg.projection_dim)
        ),
        "layers": layers,
    }


def params_from_hf(cfg: ClipTextConfig, sd: dict, dtype=jnp.bfloat16) -> dict:
    """From a full CLIP checkpoint state dict (HF CLIPModel naming:
    ``text_model.*`` + top-level ``text_projection.weight``)."""

    def g(name):
        t = sd[name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def lin(name):
        return np.transpose(g(name))

    L = cfg.num_hidden_layers
    p = "text_model."

    def stack(fmt, f=g):
        return np.stack([f(p + fmt.format(i)) for i in range(L)])

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
        "token_embedding": g(p + "embeddings.token_embedding.weight"),
        "position_embedding": g(p + "embeddings.position_embedding.weight"),
        "final_ln_w": g(p + "final_layer_norm.weight"),
        "final_ln_b": g(p + "final_layer_norm.bias"),
        "text_projection": lin("text_projection.weight"),
        "layers": layers,
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def apply(
    cfg: ClipTextConfig,
    params: dict,
    input_ids: jax.Array,
    eos_positions: jax.Array,
) -> jax.Array:
    """[B, S] token ids -> [B, projection_dim] projected pooled embeds.

    ``eos_positions`` [B] — index of each row's EOS token (HF pools the
    final-LN hidden state there before text_projection).
    """
    B, S = input_ids.shape
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    Dh = D // H
    act = act_fn(cfg.hidden_act)

    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][None, :S]
    causal = jnp.where(
        jnp.arange(S)[None, :] <= jnp.arange(S)[:, None], 0.0, -jnp.inf
    ).astype(jnp.float32)

    def layer(h, lp):
        r = layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        q = (jnp.einsum("bsd,de->bse", r, lp["q_w"]) + lp["q_b"]).reshape(
            B, S, H, Dh
        )
        k = (jnp.einsum("bsd,de->bse", r, lp["k_w"]) + lp["k_b"]).reshape(
            B, S, H, Dh
        )
        v = (jnp.einsum("bsd,de->bse", r, lp["v_w"]) + lp["v_b"]).reshape(
            B, S, H, Dh
        )
        scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
        scores = (
            jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            * scale
            + causal[None, None]
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

    x, _ = jax.lax.scan(layer, x, params["layers"])
    x = layer_norm(x, params["final_ln_w"], params["final_ln_b"],
                   cfg.layer_norm_eps)
    pooled = x[jnp.arange(B), eos_positions]
    return jnp.einsum("bd,dp->bp", pooled, params["text_projection"])
