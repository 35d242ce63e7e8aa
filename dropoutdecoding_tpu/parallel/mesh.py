"""Device mesh + sharding rules.

The reference has no real parallelism (SURVEY.md §2.5: SLURM job fan-out
plus accelerate's sequential layer placement).  The TPU-native design uses
a 2-D mesh:

  ("data", "model")

- "data": batch of images (the reference's per-job loop, SURVEY.md §2.5
  'data parallel' row) — pure data parallelism over ICI.
- "model": megatron-style tensor parallelism inside each Llama layer:
  attention heads and MLP intermediate dim sharded on "model"; the ensemble
  member axis stays local to each shard (it multiplies the batch of the
  per-step matvecs, which is exactly what keeps the MXU fed at batch 1).

With x = activations sharded [data, None, None]:
  q/k/v_proj: [None, "model"]  (column parallel -> heads split)
  o_proj:     ["model", None]  (row parallel -> psum by XLA)
  gate/up:    [None, "model"]
  down:       ["model", None]
  embed/lm_head: replicated (vocab small at 32k relative to HBM; logits
  computed on the full vocab per shard — XLA all-gathers hidden instead)
KV cache: [L, B(data), S, KH("model"), D].

XLA inserts the collectives (all-reduce after o_proj/down) from these
annotations alone — no hand-written comms.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import KVCache


def make_mesh(n_data: int | None = None, n_model: int | None = None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None and n_model is None:
        n_model = 1
        n_data = n
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def _llama_layer_specs():
    return {
        "input_ln": P(),
        "post_attn_ln": P(),
        "q_proj": P(None, None, "model"),
        "k_proj": P(None, None, "model"),
        "v_proj": P(None, None, "model"),
        "o_proj": P(None, "model", None),
        "gate_proj": P(None, None, "model"),
        "up_proj": P(None, None, "model"),
        "down_proj": P(None, "model", None),
    }


def llama_param_specs():
    return {
        "embed_tokens": P(),
        "layers": _llama_layer_specs(),
        "norm": P(),
        "lm_head": P(None, "model"),
    }


def clip_param_specs():
    layer = {
        "ln1_w": P(), "ln1_b": P(), "ln2_w": P(), "ln2_b": P(),
        "q_w": P(None, None, "model"), "q_b": P(None, "model"),
        "k_w": P(None, None, "model"), "k_b": P(None, "model"),
        "v_w": P(None, None, "model"), "v_b": P(None, "model"),
        "out_w": P(None, "model", None), "out_b": P(),
        "fc1_w": P(None, None, "model"), "fc1_b": P(None, "model"),
        "fc2_w": P(None, "model", None), "fc2_b": P(),
    }
    return {
        "class_embedding": P(),
        "patch_embedding": P(),
        "position_embedding": P(),
        "pre_ln_w": P(),
        "pre_ln_b": P(),
        "layers": layer,
    }


def projector_param_specs():
    return {
        "fc1_w": P(None, "model"),
        "fc1_b": P("model"),
        "fc2_w": P("model", None),
        "fc2_b": P(),
    }


def _apply_specs(tree, specs, mesh):
    def put(a, s):
        if isinstance(a, dict) and set(a) == {"q", "s"}:
            # int8-quantized weight (utils/quantize layout): the int8
            # matrix shards like the dense weight; the per-output-channel
            # scale [..., 1, E] shards with the OUTPUT axis — sharded for
            # column-parallel (spec ends in "model"), replicated for
            # row-parallel (the output axis is unsharded there).
            s_spec = (
                P(*([None] * (a["s"].ndim - 1) + ["model"]))
                if s and s[-1] == "model"
                else P()
            )
            return {
                "q": jax.device_put(a["q"], NamedSharding(mesh, s)),
                "s": jax.device_put(a["s"], NamedSharding(mesh, s_spec)),
            }
        if isinstance(a, dict) and set(a) == {"q4", "s4"}:
            # int4-packed weight: byte d of q4 packs contraction rows d and
            # d + D/2 (utils/quantize.quantize_matrix_int4), so sharding the
            # packed row axis (row-parallel o_proj/down_proj) would split
            # group/scale correspondence incoherently.  Column-parallel
            # (spec ends in "model") shards the OUTPUT axis of both q4 and
            # s4 — the packing is untouched; row-parallel int4 weights stay
            # replicated (int4 is primarily the single-chip deployment
            # tier; replication costs ~1 GB at 7B and only redundant
            # compute under TP).
            if s and s[-1] == "model":
                col = NamedSharding(mesh, s)
                s4_spec = NamedSharding(
                    mesh, P(*([None] * (a["s4"].ndim - 1) + ["model"]))
                )
                return {
                    "q4": jax.device_put(a["q4"], col),
                    "s4": jax.device_put(a["s4"], s4_spec),
                }
            rep = NamedSharding(mesh, P())
            return {
                "q4": jax.device_put(a["q4"], rep),
                "s4": jax.device_put(a["s4"], rep),
            }
        return jax.device_put(a, NamedSharding(mesh, s))

    return jax.tree.map(
        put,
        tree,
        specs,
        is_leaf=lambda x: (
            isinstance(x, jax.Array)
            or (isinstance(x, dict) and set(x) in ({"q", "s"}, {"q4", "s4"}))
            or hasattr(x, "shape")
        ),
    )


def _reject_fused(lm: dict):
    if "qkv_proj" in lm.get("layers", {}):
        raise ValueError(
            "params carry fused qkv/gate_up leaves "
            "(utils/quantize.fuse_projections) — a single-device layout. "
            "TP shard specs are keyed on the split leaf names; shard the "
            "split params and skip fuse_projections on mesh runs."
        )


def shard_llava_params(params, mesh: Mesh):
    """Place LlavaParams on the mesh with TP shardings."""
    from ..models.llava import LlavaParams

    _reject_fused(params.lm)
    return LlavaParams(
        vision=_apply_specs(params.vision, clip_param_specs(), mesh),
        projector=_apply_specs(params.projector, projector_param_specs(), mesh),
        lm=_apply_specs(params.lm, llama_param_specs(), mesh),
    )


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    spec = P(None, "data", None, "model", None)  # [L, B, S, KH, D]
    sharding = NamedSharding(mesh, spec)
    # int8 leaves (models/llama.KVCache decode-reader layouts):
    # "q" [L, B, S, KH*D] — sharding the head-FLATTENED minor axis on
    # "model" splits it into contiguous (KH/n_model)*D chunks, i.e. whole
    # head panels, identical data placement to sharding the KH axis of
    # the 5-D layout; "s" [L, B, KH, S] carries KH at dim 2.
    q_sharding = NamedSharding(mesh, P(None, "data", None, "model"))
    s_sharding = NamedSharding(mesh, P(None, "data", "model", None))

    def put(leaf):
        if isinstance(leaf, dict):
            return {
                "q": jax.device_put(leaf["q"], q_sharding),
                "s": jax.device_put(leaf["s"], s_sharding),
            }
        return jax.device_put(leaf, sharding)

    return KVCache(put(cache.k), put(cache.v))


def data_sharding(mesh: Mesh, *batch_axis_first_shapes):
    """NamedSharding for batch-leading arrays: shard axis 0 on "data"."""
    return NamedSharding(mesh, P("data"))


def mesh_of(params) -> Mesh | None:
    """The ("data", "model") Mesh a parameter tree is placed on, or None.

    Engines auto-detect this at construction (params are sharded BEFORE
    the engine is built — shard_llava_params) and pass it to
    models/llama.decode_step so the fused Pallas attention stays eligible
    under TP via its shard_map wrapper.  Single-device placements return
    None: the bare-pallas_call fast path needs no wrapper there."""
    for leaf in jax.tree.leaves(params):
        sh = getattr(leaf, "sharding", None)
        mesh = getattr(sh, "mesh", None)
        if mesh is None:
            continue
        names = getattr(mesh, "axis_names", ())
        devs = getattr(mesh, "devices", None)
        if (
            "data" in names
            and "model" in names
            and devs is not None
            and devs.size > 1
        ):
            return mesh
    return None


def shard_llavanext_params(params, mesh: Mesh):
    """LlavaNextParams on the mesh: CLIP tower + projector and the Mistral
    LM use the same megatron specs as LLaVA (identical module layouts);
    image_newline is a [D] vector, replicated."""
    from ..models.llavanext import LlavaNextParams

    _reject_fused(params.lm)
    return LlavaNextParams(
        vision=_apply_specs(params.vision, clip_param_specs(), mesh),
        projector=_apply_specs(params.projector, projector_param_specs(), mesh),
        image_newline=jax.device_put(
            params.image_newline, NamedSharding(mesh, P())
        ),
        lm=_apply_specs(params.lm, llama_param_specs(), mesh),
    )


def shard_instructblip_params(params, mesh: Mesh):
    """InstructBlipParams on the mesh: the Vicuna LM (the decode path —
    where TP pays) gets the megatron specs; EVA-ViT-g + Q-Former +
    projection run exactly once per request at prefill and are replicated
    (their per-request compute is tiny next to the LM tower)."""
    from ..models.instructblip import InstructBlipParams

    _reject_fused(params.lm)
    rep = NamedSharding(mesh, P())

    def put_rep(tree):
        return jax.tree.map(lambda a: jax.device_put(a, rep), tree)

    return InstructBlipParams(
        vision=put_rep(params.vision),
        qformer=put_rep(params.qformer),
        projection=put_rep(params.projection),
        lm=_apply_specs(params.lm, llama_param_specs(), mesh),
    )
