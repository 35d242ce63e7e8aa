"""Synthetic production-shape parameters for benchmarks and studies.

No checkpoints exist in this environment, so performance and semantic-gap
measurements at the REAL 7B shape (bench.py, cli/fused_gap.py --shape 7b)
run on randomly generated weights at exact production dimensions.  The
int8 tower is generated directly in the utils/quantize layout so the bf16
7B tower (13.5 GB) never materializes on a 16 GB chip.
"""
from __future__ import annotations


def synthetic_int8_lm(cfg, key, fused: bool = False):
    """Llama params with the projections + lm_head generated DIRECTLY in
    int8 ({"q", "s"} utils/quantize layout).  Scales put the dequantized
    std at a realistic ~0.02.  ``fused=True`` emits the qkv_proj /
    gate_up_proj fused leaves (utils/quantize.fuse_projections layout)
    directly, avoiding the concat transient on a full chip.

    The whole tower is emitted by ONE jitted program built on
    ``jax.random.bits`` (bitcast to int8): at the 7B shape the round-3
    generator's 16 op-by-op ``randint`` dispatches cost ~113 s of
    compile+dispatch over the axon tunnel, vs ~5 s compile + <1 s run for
    the single bits program (round-4 verdict item 1)."""
    import jax
    import jax.numpy as jnp

    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, KH, Dh, L = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.num_hidden_layers,
    )

    @jax.jit
    def gen(key):
        ks = iter(jax.random.split(key, 16))

        def qmat(shape):
            q = jax.lax.bitcast_convert_type(
                jax.random.bits(next(ks), shape, jnp.uint8), jnp.int8
            )
            # uniform int8 std ~73.9; scale for weight std ~0.02
            s = jnp.full(shape[:-2] + (1, shape[-1]), 0.02 / 73.9, jnp.float32)
            return {"q": q, "s": s}

        layers = {
            "input_ln": jnp.ones((L, D), jnp.bfloat16),
            "post_attn_ln": jnp.ones((L, D), jnp.bfloat16),
            "o_proj": qmat((L, H * Dh, D)),
            "down_proj": qmat((L, I, D)),
        }
        if fused:
            layers["qkv_proj"] = qmat((L, D, (H + 2 * KH) * Dh))
            layers["gate_up_proj"] = qmat((L, D, 2 * I))
        else:
            layers["q_proj"] = qmat((L, D, H * Dh))
            layers["k_proj"] = qmat((L, D, KH * Dh))
            layers["v_proj"] = qmat((L, D, KH * Dh))
            layers["gate_proj"] = qmat((L, D, I))
            layers["up_proj"] = qmat((L, D, I))
        emb = (
            0.02 * jax.random.normal(next(ks), (V, D), jnp.float32)
        ).astype(jnp.bfloat16)
        return {
            "embed_tokens": emb,
            "layers": layers,
            "norm": jnp.ones((D,), jnp.bfloat16),
            "lm_head": qmat((D, V)),
        }

    return gen(key)


def synthetic_int4_lm(cfg, key, fused: bool = False):
    """Llama params with projections + lm_head generated DIRECTLY in the
    packed int4 layout ({"q4", "s4"}, utils/quantize.quantize_matrix_int4):
    ~3.5 GB at 7B shape, the half-of-int8 decode weight stream.

    ``fused=True`` emits the qkv_proj / gate_up_proj fused leaves
    (utils/quantize.fuse_projections layout) directly — generating fused
    avoids the ~3.5 GB concat transient fuse_projections would allocate
    next to a live tower on a 16 GB chip."""
    import jax
    import jax.numpy as jnp

    from .quantize import INT4_GROUP

    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, KH, Dh, L = (
        cfg.num_attention_heads,
        cfg.num_key_value_heads,
        cfg.head_dim,
        cfg.num_hidden_layers,
    )

    @jax.jit
    def gen(key):
        ks = iter(jax.random.split(key, 16))

        def qmat(shape):
            d, e = shape[-2], shape[-1]
            packed = jax.lax.bitcast_convert_type(
                jax.random.bits(next(ks), shape[:-2] + (d // 2, e), jnp.uint8),
                jnp.int8,
            )
            # uniform nibbles in [-8, 7]: std ~4.6; scale for weight
            # std ~0.02
            s = jnp.full(
                shape[:-2] + (d // INT4_GROUP, e), 0.02 / 4.6, jnp.float32
            )
            return {"q4": packed, "s4": s}

        def qmat8(shape):
            # deployment int4 config keeps the lm_head at int8
            # (utils/quantize.quantize_llama_params_int4 lm_head="int8")
            q = jax.lax.bitcast_convert_type(
                jax.random.bits(next(ks), shape, jnp.uint8), jnp.int8
            )
            s = jnp.full(
                shape[:-2] + (1, shape[-1]), 0.02 / 73.9, jnp.float32
            )
            return {"q": q, "s": s}

        layers = {
            "input_ln": jnp.ones((L, D), jnp.bfloat16),
            "post_attn_ln": jnp.ones((L, D), jnp.bfloat16),
            "o_proj": qmat((L, H * Dh, D)),
            "down_proj": qmat((L, I, D)),
        }
        if fused:
            layers["qkv_proj"] = qmat((L, D, (H + 2 * KH) * Dh))
            layers["gate_up_proj"] = qmat((L, D, 2 * I))
        else:
            layers["q_proj"] = qmat((L, D, H * Dh))
            layers["k_proj"] = qmat((L, D, KH * Dh))
            layers["v_proj"] = qmat((L, D, KH * Dh))
            layers["gate_proj"] = qmat((L, D, I))
            layers["up_proj"] = qmat((L, D, I))
        emb = (
            0.02 * jax.random.normal(next(ks), (V, D), jnp.float32)
        ).astype(jnp.bfloat16)
        return {
            "embed_tokens": emb,
            "layers": layers,
            "norm": jnp.ones((D,), jnp.bfloat16),
            "lm_head": qmat8((D, V)),
        }

    return gen(key)


def synthetic_llava_7b(key, n_layers=None, weights="int8"):
    """Full synthetic LLaVA-1.5-7B: int8 (or packed-int4) LM tower + bf16
    ViT-L/336 vision and projector at exact production shapes."""
    import jax
    import jax.numpy as jnp

    from ..models import llava as llava_mod
    from ..models.llava import LlavaParams
    from ..utils.config import ClipVisionConfig, LlavaConfig

    cfg = LlavaConfig(
        text=(
            LlavaConfig().text
            if n_layers is None
            else LlavaConfig().text.__class__(num_hidden_layers=n_layers)
        ),
        vision=ClipVisionConfig(),
    )
    k_lm, k_vis = jax.random.split(jax.random.key(0) if key is None else key)
    make_lm = {"int8": synthetic_int8_lm, "int4": synthetic_int4_lm}[weights]
    lm = make_lm(cfg.text, k_lm)
    # vision + projector stay bf16 (one prefill pass; tiny next to the LM)
    proto = llava_mod.init_params(
        LlavaConfig(
            text=cfg.text.__class__(num_hidden_layers=1), vision=cfg.vision
        ),
        k_vis,
        jnp.bfloat16,
    )
    params = LlavaParams(vision=proto.vision, projector=proto.projector, lm=lm)
    return cfg, params


def synthetic_llava_7b_dual(key, n_layers=None):
    """(cfg, params_int8, params_int4) with both LM towers quantized from
    the SAME synthetic bf16 base — the paired-arm input for
    production-shape quantization drift studies (cli/fused_gap.py
    --study int4prod).  The base is generated and quantized LAYER-BY-LAYER
    on device (one [D, E] fp32 matrix transient at a time), so the 13.5 GB
    bf16 7B tower is never resident; both quantized towers (~6.7 + ~3.5 GB)
    plus the shared bf16 vision/projector/embeddings fit a 16 GB chip."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..models import llava as llava_mod
    from ..models.llava import LlavaParams
    from ..utils.config import ClipVisionConfig, LlavaConfig
    from .quantize import quantize_matrix, quantize_matrix_int4

    cfg = LlavaConfig(
        text=(
            LlavaConfig().text
            if n_layers is None
            else LlavaConfig().text.__class__(num_hidden_layers=n_layers)
        ),
        vision=ClipVisionConfig(),
    )
    t = cfg.text
    D, I, V = t.hidden_size, t.intermediate_size, t.vocab_size
    H, KH, Dh, L = (
        t.num_attention_heads,
        t.num_key_value_heads,
        t.head_dim,
        t.num_hidden_layers,
    )

    @functools.partial(jax.jit, static_argnames=("d", "e"))
    def _dual_one(k, d, e):
        w = jax.random.normal(k, (d, e), jnp.float32) * 0.02
        return quantize_matrix(w), quantize_matrix_int4(w)

    k_lm, k_vis, k_emb = jax.random.split(
        jax.random.key(0) if key is None else key, 3
    )
    names = {
        "q_proj": (D, H * Dh),
        "k_proj": (D, KH * Dh),
        "v_proj": (D, KH * Dh),
        "o_proj": (H * Dh, D),
        "gate_proj": (D, I),
        "up_proj": (D, I),
        "down_proj": (I, D),
    }
    keys = jax.random.split(k_lm, len(names) * L + 1)
    l8, l4 = {}, {}
    for i, (name, (d, e)) in enumerate(names.items()):
        q8s, q4s = [], []
        for li in range(L):
            q8, q4 = _dual_one(keys[i * L + li], d, e)
            q8s.append(q8)
            q4s.append(q4)
        l8[name] = {n: jnp.stack([x[n] for x in q8s]) for n in q8s[0]}
        l4[name] = {n: jnp.stack([x[n] for x in q4s]) for n in q4s[0]}
    head8, _ = _dual_one(keys[-1], D, V)
    head4 = head8  # deployment int4 config: lm_head stays int8 (shared)

    emb = (0.02 * jax.random.normal(k_emb, (V, D), jnp.float32)).astype(
        jnp.bfloat16
    )
    norms = {
        "input_ln": jnp.ones((L, D), jnp.bfloat16),
        "post_attn_ln": jnp.ones((L, D), jnp.bfloat16),
    }
    proto = llava_mod.init_params(
        LlavaConfig(
            text=t.__class__(num_hidden_layers=1), vision=cfg.vision
        ),
        k_vis,
        jnp.bfloat16,
    )

    def pack(layers_q, head):
        return {
            "embed_tokens": emb,
            "layers": {**norms, **layers_q},
            "norm": jnp.ones((D,), jnp.bfloat16),
            "lm_head": head,
        }

    return (
        cfg,
        LlavaParams(vision=proto.vision, projector=proto.projector,
                    lm=pack(l8, head8)),
        LlavaParams(vision=proto.vision, projector=proto.projector,
                    lm=pack(l4, head4)),
    )
