"""CHAIR metric parity against the reference's archived result files.

The reference's results/ tree stores, for ~29k real LLaVA captions, the
full per-caption CHAIR decomposition (tokenized words, detected object
nodes, hallucinated pairs, GT sets).  These tests replay our pipeline
(pattern-faithful singularizer + mined synonym table, evalsuite/text.py +
data/synonyms.txt) over those captions and require:

- >= 99% per-caption agreement on detected object nodes,
- >= 99.5% agreement on hallucinated pairs,
- overall CHAIRs within 0.5 points / CHAIRi within 0.1 points per file
  (reference run-to-run noise is ±2 CHAIRs, BASELINE.md).

Residual disagreement stems from synonym-table edits the reference authors
made *between* archived runs (conflicting detections for the same word
across files), so exact zero is unattainable from the archives alone.
"""
import glob
import json
import os

import pytest

from dropoutdecoding_tpu.evalsuite.chair import ChairEvaluator

REF_GLOB = "/root/reference/results/*/llava_llava/coco/*_chair_results.json"


def _files():
    return sorted(glob.glob(REF_GLOB))


pytestmark = pytest.mark.skipif(not _files(), reason="reference archives absent")


@pytest.mark.parametrize(
    "path",
    [
        "/root/reference/results/0924origin/llava_llava/coco/llava_llava_coco_num_images_500_chair_results.json",
        "/root/reference/results/0923sample_0/llava_llava/coco/llava_llava_coco_num_images_500_chair_results.json",
    ],
)
def test_per_caption_agreement(path):
    if not os.path.exists(path):
        pytest.skip("archive missing")
    d = json.load(open(path))
    sents = d["sentences"]
    ev = ChairEvaluator([s["image_id"] for s in sents])
    gen_match = hal_match = 0
    for s in sents:
        words, nodes, idxs, raw = ev.caption_to_words(s["caption"])
        if nodes == s["mscoco_generated_words"]:
            gen_match += 1
        gt = set(s["mscoco_gt_words"])
        my_hal = [[w, n] for w, n in zip(words, nodes) if n not in gt]
        if my_hal == s["mscoco_hallucinated_words"]:
            hal_match += 1
    n = len(sents)
    assert gen_match / n >= 0.99, f"object-node agreement {gen_match}/{n}"
    assert hal_match / n >= 0.995, f"hallucination agreement {hal_match}/{n}"


def test_overall_metrics_within_noise():
    deltas_s, deltas_i = [], []
    for path in _files()[:10]:
        d = json.load(open(path))
        sents = d["sentences"]
        ev = ChairEvaluator([s["image_id"] for s in sents])
        for s in sents:
            ev.imid_to_objects[s["image_id"]] = set(s["mscoco_gt_words"])
        out = ev.compute(
            [{"image_id": s["image_id"], "caption": s["caption"]} for s in sents]
        )
        m = out["overall_metrics"]
        deltas_s.append(abs(m["CHAIRs"] - d["overall_metrics"]["CHAIRs"]) * 100)
        deltas_i.append(abs(m["CHAIRi"] - d["overall_metrics"]["CHAIRi"]) * 100)
    assert max(deltas_s) <= 0.5, deltas_s
    assert max(deltas_i) <= 0.1, deltas_i
