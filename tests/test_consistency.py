"""Consistency analyses (evalsuite/consistency.py — the reference's dormant
chair_metrics extras, made runnable)."""
from dropoutdecoding_tpu.evalsuite.consistency import (
    image_consistency,
    lm_consistency,
    lm_consistency_rank,
    metric_hallucination_correlation,
)


def _cap_dict():
    return {
        "sentences": [
            {
                "image_id": 1,
                "mscoco_hallucinated_words": [("cat", "cat")],
                "hallucination_idxs": [3],
                "metrics": {"CHAIRs": 1, "CIDEr": 0.1},
            },
            {
                "image_id": 2,
                "mscoco_hallucinated_words": [],
                "hallucination_idxs": [],
                "metrics": {"CHAIRs": 0, "CIDEr": 0.9},
            },
        ]
    }


def test_lm_rank():
    assert lm_consistency_rank({"a": 0.5, "cat": 0.3, "b": 0.2}, "cat") == 2
    assert lm_consistency_rank({"a": 0.5}, "cat") == 0


def test_lm_consistency():
    out = lm_consistency(
        _cap_dict(), {1: {3: {"cat": 0.6, "dog": 0.4}}}
    )
    assert out["mean_rank"] == 1
    assert out["per_image"] == {1: 1}


def test_image_consistency():
    out = image_consistency(_cap_dict(), {1: {"cat"}})
    assert out == {"consistency": 1.0, "hallucinated": 1}
    out = image_consistency(_cap_dict(), {1: set()})
    assert out["consistency"] == 0.0


def test_correlation_sign():
    # hallucination co-occurs with LOW CIDEr here => negative correlation
    assert metric_hallucination_correlation(_cap_dict(), "CIDEr") < 0
