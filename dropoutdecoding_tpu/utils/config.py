"""Frozen configuration dataclasses.

Replaces the reference's two-tier config (argparse + the mutable global
``settings`` dict, reference models/config.py:1-4 and chair_test.py:163-175)
with explicit, hashable dataclasses that can be closed over by jitted
programs.  ``from_hf_dict`` constructors ingest HuggingFace ``config.json``
contents so real checkpoints configure themselves.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class LlamaConfig:
    """Llama-family decoder config (covers Llama-7B, Vicuna-7B, Mistral-7B)."""

    vocab_size: int = 32064
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32  # < num_attention_heads => GQA (Mistral: 8)
    head_dim: int = 128
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    # activation is silu for the whole family

    @classmethod
    def from_hf_dict(cls, d: dict) -> "LlamaConfig":
        heads = d["num_attention_heads"]
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=heads,
            num_key_value_heads=d.get("num_key_value_heads", heads),
            head_dim=d.get("head_dim") or d["hidden_size"] // heads,
            max_position_embeddings=d.get("max_position_embeddings", 4096),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
            rope_theta=d.get("rope_theta", 10000.0),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            attention_bias=d.get("attention_bias", False),
            mlp_bias=d.get("mlp_bias", False),
        )


@dataclass(frozen=True)
class ClipVisionConfig:
    """CLIP ViT vision tower (LLaVA uses ViT-L/14 @ 336px)."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    projection_dim: int = 768

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1  # + CLS

    @classmethod
    def from_hf_dict(cls, d: dict) -> "ClipVisionConfig":
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            image_size=d["image_size"],
            patch_size=d["patch_size"],
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            hidden_act=d.get("hidden_act", "quick_gelu"),
            projection_dim=d.get("projection_dim", 768),
        )


@dataclass(frozen=True)
class ClipTextConfig:
    """CLIP text tower (full-CLIP checkpoints only; used by the optional
    zero-shot im-consistency classifier — models/clip_text.py.  Defaults
    are CLIP ViT-L/14's text side)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    projection_dim: int = 768


@dataclass(frozen=True)
class QFormerConfig:
    """InstructBLIP Q-Former (BERT encoder with periodic cross-attention)."""

    vocab_size: int = 30523
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_frequency: int = 2
    encoder_hidden_size: int = 1408  # InstructBLIP EVA-ViT hidden size
    layer_norm_eps: float = 1e-12
    max_position_embeddings: int = 512
    num_query_tokens: int = 32

    @classmethod
    def from_hf_dict(cls, d: dict, num_query_tokens: int = 32) -> "QFormerConfig":
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            intermediate_size=d["intermediate_size"],
            cross_attention_frequency=d.get("cross_attention_frequency", 2),
            encoder_hidden_size=d.get("encoder_hidden_size", 1408),
            layer_norm_eps=d.get("layer_norm_eps", 1e-12),
            max_position_embeddings=d.get("max_position_embeddings", 512),
            num_query_tokens=num_query_tokens,
        )


@dataclass(frozen=True)
class BlipVisionConfig:
    """InstructBLIP vision tower (EVA ViT-g/14): post-layernorm ViT with
    learned position embeddings and qkv bias."""

    hidden_size: int = 1408
    intermediate_size: int = 6144
    num_hidden_layers: int = 39
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu"
    qkv_bias: bool = True

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @classmethod
    def from_hf_dict(cls, d: dict) -> "BlipVisionConfig":
        return cls(
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            image_size=d["image_size"],
            patch_size=d["patch_size"],
            layer_norm_eps=d.get("layer_norm_eps", 1e-6),
            hidden_act=d.get("hidden_act", "gelu"),
            qkv_bias=d.get("qkv_bias", True),
        )


@dataclass(frozen=True)
class LlavaConfig:
    """LLaVA-1.5 composition (reference models/llava.py:54)."""

    text: LlamaConfig = LlamaConfig()
    vision: ClipVisionConfig = ClipVisionConfig()
    image_token_index: int = 32000
    pad_token_id: int = 32001
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"  # drop CLS
    projector_hidden_act: str = "gelu"

    @classmethod
    def from_hf_dict(cls, d: dict) -> "LlavaConfig":
        return cls(
            text=LlamaConfig.from_hf_dict(d["text_config"]),
            vision=ClipVisionConfig.from_hf_dict(d["vision_config"]),
            image_token_index=d.get("image_token_index", 32000),
            pad_token_id=d.get("pad_token_id", 32001) or 32001,
            vision_feature_layer=d.get("vision_feature_layer", -2),
            vision_feature_select_strategy=d.get(
                "vision_feature_select_strategy", "default"
            ),
        )


@dataclass(frozen=True)
class LlavaNextConfig:
    """LLaVA-NeXT (v1.6) composition: multi-tile anyres visual tokens
    (reference models/llavanext.py:48, 388-427)."""

    text: LlamaConfig = LlamaConfig(
        num_key_value_heads=8, intermediate_size=14336, rope_theta=1000000.0
    )
    vision: ClipVisionConfig = ClipVisionConfig()
    image_token_index: int = 32000
    pad_token_id: int = 32001
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"
    projector_hidden_act: str = "gelu"
    image_grid_pinpoints: Tuple[Tuple[int, int], ...] = (
        (336, 672),
        (672, 336),
        (672, 672),
        (1008, 336),
        (336, 1008),
    )

    @classmethod
    def from_hf_dict(cls, d: dict) -> "LlavaNextConfig":
        return cls(
            text=LlamaConfig.from_hf_dict(d["text_config"]),
            vision=ClipVisionConfig.from_hf_dict(d["vision_config"]),
            image_token_index=d.get("image_token_index", 32000),
            pad_token_id=d.get("pad_token_id", 32001) or 32001,
            vision_feature_layer=d.get("vision_feature_layer", -2),
            vision_feature_select_strategy=d.get(
                "vision_feature_select_strategy", "default"
            ),
            image_grid_pinpoints=tuple(
                tuple(p) for p in d.get("image_grid_pinpoints", [])
            )
            or cls.image_grid_pinpoints,
        )


@dataclass(frozen=True)
class InstructBlipConfig:
    """InstructBLIP composition: EVA-ViT -> Q-Former -> projection -> Vicuna
    (reference models/instructblip.py:580-697)."""

    text: LlamaConfig = LlamaConfig(vocab_size=32001)
    vision: BlipVisionConfig = BlipVisionConfig()
    qformer: QFormerConfig = QFormerConfig()
    num_query_tokens: int = 32

    @classmethod
    def from_hf_dict(cls, d: dict) -> "InstructBlipConfig":
        return cls(
            text=LlamaConfig.from_hf_dict(d["text_config"]),
            vision=BlipVisionConfig.from_hf_dict(d["vision_config"]),
            qformer=QFormerConfig.from_hf_dict(
                d["qformer_config"], d.get("num_query_tokens", 32)
            ),
            num_query_tokens=d.get("num_query_tokens", 32),
        )


@dataclass(frozen=True)
class EnsembleConfig:
    """Dropout-decoding ensemble parameters.

    Mirrors the reference's global ``settings`` dict (models/config.py:1-4)
    plus the per-model behavioral differences catalogued in SURVEY.md §7:

    - ``voting_probs``: mask-probability cap per ensemble member
      (``settings['voting_numbers']``, default K=3 -> (0.3, 0.5, 0.7)).
    - ``use_avg``: aggregate by averaging last-token logits instead of
      majority vote (reference select_by_average, llava.py:37-52).
    - ``use_random``: LLaVA-NeXT switches the mask policy to
      ``epis_no_overlap`` (llavanext.py:547-551); for other models this maps
      to the uncertainty-free ``random_image`` ablation.
    - ``mask_policy``: one of the policies in decoding/masks.py
      ("epis", "epis_quantile", "epis_kl", "epis_no_overlap",
      "random_image", "aggressive", "all_image", "keep_overlap", "none").
    - ``mask_accumulate``: LLaVA-1.5 never restores the attention mask
      between members, so masked-out positions accumulate across the K
      members within one step (llava.py:344 commented-out restore);
      InstructBLIP and LLaVA-NeXT restore to all-ones per member
      (instructblip.py:121, llavanext.py:546).
    - ``topk``: size of the per-visual-token text-projection table used for
      the overlap-keep set (LLaVA-1.5: 5 at llava.py:408; InstructBLIP and
      LLaVA-NeXT: 10).
    - ``prob_floor``: lower end of the linear epis->probability map
      (the ``0.1 + (prob-0.1)*...`` rescale, llava.py:646).
    """

    voting_probs: Tuple[float, ...] = (0.3, 0.5, 0.7)
    use_avg: bool = False
    use_random: bool = False
    mask_policy: str = "epis"
    mask_accumulate: bool = True
    topk: int = 5
    prob_floor: float = 0.1
    # Performance mode: fuse the unmasked forward and the K masked members
    # into ONE width-(K+1) forward per step (one weight stream instead of
    # two).  Exact reference semantics need the CURRENT step's unmasked
    # argmax for the overlap keep-set (llava.py:305->345), which forces two
    # sequential forwards; fused mode uses the PREVIOUS step's unmasked
    # argmax instead (one-step lag in the overlap restore only — the epis
    # Bernoulli masks are unchanged).  ~2x decode throughput.
    fused_step: bool = False

    @property
    def k(self) -> int:
        return len(self.voting_probs)

    @staticmethod
    def voting_probs_for(n: int) -> Tuple[float, ...]:
        """CLI ``--voting-numbers`` -> probability caps
        (reference chair_test.py:165-174)."""
        table = {
            1: (0.3,),
            2: (0.5, 0.3),
            3: (0.3, 0.5, 0.7),
            4: (0.1, 0.3, 0.5, 0.7),
            5: (0.1, 0.3, 0.5, 0.7, 0.9),
        }
        return table.get(n, table[3])


@dataclass(frozen=True)
class GenerationConfig:
    """Decode-loop parameters (reference generate kwargs,
    chair_test.py:341-346 / pope_test.py:239-242)."""

    max_new_tokens: int = 512
    eos_token_id: int = 2
    pad_token_id: int = 2
    num_beams: int = 1
    # HF beam knobs (BeamHypotheses normalization / stopping rules)
    length_penalty: float = 1.0
    early_stopping: object = False  # False | True | "never"
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: Optional[int] = None
    # VCD baseline (reference vcd_sample.py:142-161, vcd_add_noise.py)
    use_cd: bool = False
    cd_alpha: float = 0.5
    cd_beta: float = 0.1
    cd_noise_step: int = 500


def load_hf_config(model_dir: str) -> dict:
    with open(os.path.join(model_dir, "config.json")) as f:
        return json.load(f)


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
