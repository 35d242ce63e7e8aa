"""InstructBLIP Q-Former: BERT-style encoder over [32 query tokens ‖
instruction tokens] with cross-attention from the query slice to the vision
encoder every ``cross_attention_frequency`` layers, and separate query/text
feed-forward branches.

Port target: the reference drives HF InstructBlipQFormerModel inside its
generate override (instructblip.py:617-631) and keeps the first 32 output
positions as visual tokens (instructblip.py:631).  Layers are heterogeneous
(cross-attention on even indices only), so this tower unrolls a Python loop
over per-layer parameter dicts (it runs once per image at prefill — not a
hot path)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.basic import act_fn, layer_norm
from ..utils.config import QFormerConfig


def _mha(q_in, kv_in, lp, prefix, num_heads, mask=None):
    """BERT-style MHA: scores/sqrt(dh) + additive mask, softmax fp32."""
    B, Sq, D = q_in.shape
    Dh = lp[f"{prefix}_q_w"].shape[-1] // num_heads
    q = (jnp.einsum("bsd,de->bse", q_in, lp[f"{prefix}_q_w"]) + lp[f"{prefix}_q_b"])
    k = (jnp.einsum("bsd,de->bse", kv_in, lp[f"{prefix}_k_w"]) + lp[f"{prefix}_k_b"])
    v = (jnp.einsum("bsd,de->bse", kv_in, lp[f"{prefix}_v_w"]) + lp[f"{prefix}_v_b"])
    Sk = kv_in.shape[1]
    q = q.reshape(B, Sq, num_heads, Dh)
    k = k.reshape(B, Sk, num_heads, Dh)
    v = v.reshape(B, Sk, num_heads, Dh)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(Dh).astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :].astype(bool), scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q_in.dtype).reshape(B, Sq, num_heads * Dh)


def apply(
    cfg: QFormerConfig,
    params: dict,
    input_ids: jax.Array,
    image_embeds: jax.Array,
    attention_mask: jax.Array | None = None,
) -> jax.Array:
    """Run the Q-Former.

    Args:
      input_ids: [B, T] instruction token ids (q-former tokenizer space).
      image_embeds: [B, P, D_enc] vision-tower last hidden state.
      attention_mask: optional [B, T] instruction mask.
    Returns:
      [B, num_query_tokens, D] query outputs (the visual tokens).
    """
    B, T = input_ids.shape
    Q = cfg.num_query_tokens
    eps = cfg.layer_norm_eps
    act = act_fn("gelu")

    text = params["word_embeddings"][input_ids]
    text = text + params["position_embeddings"][None, :T]
    queries = jnp.broadcast_to(params["query_tokens"][None], (B, Q, text.shape[-1]))
    x = jnp.concatenate([queries, text], axis=1)
    x = layer_norm(x, params["emb_ln_w"], params["emb_ln_b"], eps)

    self_mask = jnp.concatenate(
        [
            jnp.ones((B, Q), bool),
            attention_mask.astype(bool)
            if attention_mask is not None
            else jnp.ones((B, T), bool),
        ],
        axis=1,
    )

    H = cfg.num_attention_heads
    for i, lp in enumerate(params["layers"]):
        a = _mha(x, x, lp, "self", H, mask=self_mask)
        x = layer_norm(
            jnp.einsum("bsd,de->bse", a, lp["self_out_w"]) + lp["self_out_b"] + x,
            lp["self_ln_w"],
            lp["self_ln_b"],
            eps,
        )
        q_part, t_part = x[:, :Q], x[:, Q:]
        if i % cfg.cross_attention_frequency == 0:
            c = _mha(q_part, image_embeds, lp, "cross", H)
            q_part = layer_norm(
                jnp.einsum("bsd,de->bse", c, lp["cross_out_w"])
                + lp["cross_out_b"]
                + q_part,
                lp["cross_ln_w"],
                lp["cross_ln_b"],
                eps,
            )
        fq = act(jnp.einsum("bsd,di->bsi", q_part, lp["interq_w"]) + lp["interq_b"])
        fq = jnp.einsum("bsi,id->bsd", fq, lp["outq_w"]) + lp["outq_b"]
        q_part = layer_norm(fq + q_part, lp["outq_ln_w"], lp["outq_ln_b"], eps)
        if T > 0:
            ft = act(jnp.einsum("bsd,di->bsi", t_part, lp["inter_w"]) + lp["inter_b"])
            ft = jnp.einsum("bsi,id->bsd", ft, lp["out_w"]) + lp["out_b"]
            t_part = layer_norm(ft + t_part, lp["out_ln_w"], lp["out_ln_b"], eps)
        x = jnp.concatenate([q_part, t_part], axis=1)
    return x[:, :Q]


def params_from_hf(
    cfg: QFormerConfig, sd: dict, dtype=jnp.bfloat16, prefix="qformer."
) -> dict:
    def g(name):
        t = sd[prefix + name]
        if hasattr(t, "detach"):
            t = t.detach().to("cpu").float().numpy()
        return np.asarray(t)

    def lin(name):
        return np.transpose(g(name))

    layers = []
    for i in range(cfg.num_hidden_layers):
        base = f"encoder.layer.{i}."
        lp = {
            "self_q_w": lin(base + "attention.attention.query.weight"),
            "self_q_b": g(base + "attention.attention.query.bias"),
            "self_k_w": lin(base + "attention.attention.key.weight"),
            "self_k_b": g(base + "attention.attention.key.bias"),
            "self_v_w": lin(base + "attention.attention.value.weight"),
            "self_v_b": g(base + "attention.attention.value.bias"),
            "self_out_w": lin(base + "attention.output.dense.weight"),
            "self_out_b": g(base + "attention.output.dense.bias"),
            "self_ln_w": g(base + "attention.output.LayerNorm.weight"),
            "self_ln_b": g(base + "attention.output.LayerNorm.bias"),
            "interq_w": lin(base + "intermediate_query.dense.weight"),
            "interq_b": g(base + "intermediate_query.dense.bias"),
            "outq_w": lin(base + "output_query.dense.weight"),
            "outq_b": g(base + "output_query.dense.bias"),
            "outq_ln_w": g(base + "output_query.LayerNorm.weight"),
            "outq_ln_b": g(base + "output_query.LayerNorm.bias"),
            "inter_w": lin(base + "intermediate.dense.weight"),
            "inter_b": g(base + "intermediate.dense.bias"),
            "out_w": lin(base + "output.dense.weight"),
            "out_b": g(base + "output.dense.bias"),
            "out_ln_w": g(base + "output.LayerNorm.weight"),
            "out_ln_b": g(base + "output.LayerNorm.bias"),
        }
        if i % cfg.cross_attention_frequency == 0:
            lp.update(
                {
                    "cross_q_w": lin(base + "crossattention.attention.query.weight"),
                    "cross_q_b": g(base + "crossattention.attention.query.bias"),
                    "cross_k_w": lin(base + "crossattention.attention.key.weight"),
                    "cross_k_b": g(base + "crossattention.attention.key.bias"),
                    "cross_v_w": lin(base + "crossattention.attention.value.weight"),
                    "cross_v_b": g(base + "crossattention.attention.value.bias"),
                    "cross_out_w": lin(base + "crossattention.output.dense.weight"),
                    "cross_out_b": g(base + "crossattention.output.dense.bias"),
                    "cross_ln_w": g(base + "crossattention.output.LayerNorm.weight"),
                    "cross_ln_b": g(base + "crossattention.output.LayerNorm.bias"),
                }
            )
        layers.append(lp)
    params = {
        "word_embeddings": g("embeddings.word_embeddings.weight"),
        "position_embeddings": g("embeddings.position_embeddings.weight"),
        "emb_ln_w": g("embeddings.layernorm.weight"),
        "emb_ln_b": g("embeddings.layernorm.bias"),
        "query_tokens": np.asarray(sd["query_tokens"]).reshape(
            cfg.num_query_tokens, -1
        ),
        "layers": layers,
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def init_params(cfg: QFormerConfig, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random init mirroring the HF layout (for tests)."""
    D, I = cfg.hidden_size, cfg.intermediate_size
    E = cfg.encoder_hidden_size
    kiter = iter(jax.random.split(key, 24 * cfg.num_hidden_layers + 8))

    def nrm(shape, scale=0.02):
        return (scale * jax.random.normal(next(kiter), shape, jnp.float32)).astype(dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = {
            "self_q_w": nrm((D, D)), "self_q_b": jnp.zeros((D,), dtype),
            "self_k_w": nrm((D, D)), "self_k_b": jnp.zeros((D,), dtype),
            "self_v_w": nrm((D, D)), "self_v_b": jnp.zeros((D,), dtype),
            "self_out_w": nrm((D, D)), "self_out_b": jnp.zeros((D,), dtype),
            "self_ln_w": jnp.ones((D,), dtype), "self_ln_b": jnp.zeros((D,), dtype),
            "interq_w": nrm((D, I)), "interq_b": jnp.zeros((I,), dtype),
            "outq_w": nrm((I, D)), "outq_b": jnp.zeros((D,), dtype),
            "outq_ln_w": jnp.ones((D,), dtype), "outq_ln_b": jnp.zeros((D,), dtype),
            "inter_w": nrm((D, I)), "inter_b": jnp.zeros((I,), dtype),
            "out_w": nrm((I, D)), "out_b": jnp.zeros((D,), dtype),
            "out_ln_w": jnp.ones((D,), dtype), "out_ln_b": jnp.zeros((D,), dtype),
        }
        if i % cfg.cross_attention_frequency == 0:
            lp.update(
                {
                    "cross_q_w": nrm((D, D)), "cross_q_b": jnp.zeros((D,), dtype),
                    "cross_k_w": nrm((E, D)), "cross_k_b": jnp.zeros((D,), dtype),
                    "cross_v_w": nrm((E, D)), "cross_v_b": jnp.zeros((D,), dtype),
                    "cross_out_w": nrm((D, D)), "cross_out_b": jnp.zeros((D,), dtype),
                    "cross_ln_w": jnp.ones((D,), dtype),
                    "cross_ln_b": jnp.zeros((D,), dtype),
                }
            )
        layers.append(lp)
    return {
        "word_embeddings": nrm((cfg.vocab_size, D)),
        "position_embeddings": nrm((cfg.max_position_embeddings, D)),
        "emb_ln_w": jnp.ones((D,), dtype),
        "emb_ln_b": jnp.zeros((D,), dtype),
        "query_tokens": nrm((cfg.num_query_tokens, D)),
        "layers": layers,
    }
