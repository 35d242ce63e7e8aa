"""Vote/average aggregation vs the reference's Counter-based semantics
(reference llava.py:22-52, llavanext.py:26-39)."""
from collections import Counter

import numpy as np
import jax.numpy as jnp

from dropoutdecoding_tpu.decoding.aggregate import select_by_average, select_by_vote


def reference_vote(member_argmax_ids):
    """Verbatim port of reference select_by_vote tie-break behavior."""
    id_counter = Counter()
    for tid in member_argmax_ids:
        id_counter[tid] += 1
    most_common_id = id_counter.most_common(1)[0][0]
    for index, tid in enumerate(member_argmax_ids):
        if tid == most_common_id:
            return index, tid
    return None


def _logits_with_argmax(ids, V=23):
    K = len(ids)
    logits = np.random.default_rng(1).normal(size=(K, V)).astype(np.float32)
    for m, t in enumerate(ids):
        logits[m, t] = 100.0
    return logits


def test_vote_matches_counter_semantics_exhaustive():
    # all argmax-id patterns for K=3 over a 3-symbol alphabet
    for a in range(3):
        for b in range(3):
            for c in range(3):
                ids = [a, b, c]
                logits = _logits_with_argmax(ids)
                w, t = select_by_vote(jnp.asarray(logits))
                rw, rt = reference_vote(ids)
                assert int(w) == rw and int(t) == rt, ids


def test_vote_k5_patterns():
    for ids in [[4, 1, 4, 1, 2], [0, 1, 2, 3, 4], [2, 2, 1, 1, 1]]:
        logits = _logits_with_argmax(ids, V=7)
        w, t = select_by_vote(jnp.asarray(logits))
        rw, rt = reference_vote(ids)
        assert int(w) == rw and int(t) == rt, ids


def test_average_matches_mean_argmax(rng):
    logits = rng.normal(size=(3, 19)).astype(np.float32)
    w, t = select_by_average(jnp.asarray(logits))
    assert int(w) == 0  # average propagates member 0's KV (llava.py:39)
    assert int(t) == int(np.argmax(logits.mean(0)))
