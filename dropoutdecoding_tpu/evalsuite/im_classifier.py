"""Image classifiers for the im-consistency analysis.

The reference's im_consistency (chair_metrics/im_consistency.py:24-44)
checks whether an image classifier also predicts each hallucinated
object — but ships neither the classifier nor its precomputed .npy
outputs, so its copy is dormant.  This module supplies two live
producers for `evalsuite.consistency.image_consistency` (round-5
verdict item 7):

1. ``projection`` (default; zero extra weights): the method's OWN
   visual-token -> text-token projection table.  The engine's prefill
   already projects every visual token through the LM head and keeps the
   top-k text-token ids per position (reference llava.py:390-410, the
   same table the overlap logic reads); a COCO class fires when any
   first-token id of any of its synonym words appears in that table.
   This is "what does the vision encoder think it sees, expressed in
   text-token space" — exactly the signal dropout decoding already
   trusts for mask overlap.
2. ``clip`` (opt-in, needs a FULL CLIP checkpoint — LLaVA ships only
   the vision encoder): zero-shot prompts over the 80 COCO classes via
   models/clip_text.py; a class fires when its cosine similarity ranks
   in the top-n.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from .chair import _load_synonyms


def coco_class_words(synonyms_path: str | None = None) -> dict:
    """{node_word: [surface words]} for the 80 COCO classes, from the
    same synonyms table CHAIR canonicalizes with (so the fired labels
    land in the node-word vocabulary image_consistency compares
    against)."""
    _, inverse = _load_synonyms(synonyms_path)
    by_node = defaultdict(list)
    for word, node in inverse.items():
        by_node[node].append(word)
    return {n: sorted(ws) for n, ws in sorted(by_node.items())}


def class_token_table(tokenizer, class_words: dict) -> dict:
    """{node: set(first token id of ' ' + word)} — mid-sentence BPE
    convention, matching how class words appear in the projection table
    (visual tokens project to in-sentence word pieces)."""
    table = {}
    for node, words in class_words.items():
        ids = set()
        for w in words:
            for form in (" " + w, w):
                enc = tokenizer(form, add_special_tokens=False)["input_ids"]
                if enc:
                    ids.add(int(enc[0]))
        table[node] = ids
    return table


def projection_labels(topk_ids, token_table: dict) -> set:
    """Classes whose token ids appear in one image's visual-token
    top-k projection table ``topk_ids`` [N, k] (PrefillState.topk_ids
    row)."""
    present = set(int(t) for t in np.asarray(topk_ids).reshape(-1))
    return {
        node for node, ids in token_table.items() if ids & present
    }


class ClipZeroShot:
    """CLIP zero-shot over the COCO classes (opt-in route).

    Args:
      vision_cfg/vision_params: models/clip_vit tower (FULL depth).
      post_ln: (weight, bias) of the checkpoint's vision post-layernorm.
      visual_projection: [D, P] projection (HF visual_projection.weight
        transposed).
      text_cfg/text_params: models/clip_text tower.
      tokenizer: CLIP tokenizer (adds BOS/EOS).
      class_names: node words; prompts are "a photo of a {name}".
    """

    def __init__(self, vision_cfg, vision_params, post_ln,
                 visual_projection, text_cfg, text_params, tokenizer,
                 class_names, prompt="a photo of a {}"):
        import jax.numpy as jnp

        from ..models import clip_text, clip_vit
        from ..ops.basic import layer_norm

        self.class_names = list(class_names)
        enc = [
            tokenizer(prompt.format(n))["input_ids"]
            for n in self.class_names
        ]
        S = max(len(e) for e in enc)
        ids = np.zeros((len(enc), S), np.int32)
        eos = np.zeros((len(enc),), np.int32)
        for i, e in enumerate(enc):
            ids[i, : len(e)] = e
            eos[i] = len(e) - 1
        t = clip_text.apply(
            text_cfg, text_params, jnp.asarray(ids), jnp.asarray(eos)
        ).astype(jnp.float32)
        self._text_embeds = t / jnp.linalg.norm(t, axis=-1, keepdims=True)

        self._vision = (vision_cfg, vision_params, post_ln,
                        visual_projection)
        self._clip_vit = clip_vit
        self._layer_norm = layer_norm

    def labels(self, pixel_values, top_n: int = 10) -> set:
        """Classes in the top-n cosine ranks for one [1, 3, H, W] image
        (COCO scenes are multi-object: a rank set, not an argmax)."""
        import jax.numpy as jnp

        cfg, params, (ln_w, ln_b), proj = self._vision
        hidden = self._clip_vit.apply(
            cfg, params, jnp.asarray(pixel_values),
            feature_layer=cfg.num_hidden_layers,
        )
        pooled = self._layer_norm(
            hidden[:, 0], ln_w, ln_b, cfg.layer_norm_eps
        ).astype(jnp.float32)
        v = pooled @ jnp.asarray(proj, jnp.float32)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        sims = np.asarray(v @ self._text_embeds.T)[0]
        order = np.argsort(sims)[::-1][:top_n]
        return {self.class_names[i] for i in order}
