"""METEOR-lite: exact + Porter-stem alignment with the classic METEOR
parameters (alpha=0.9, beta=3.0, gamma=0.5).

The canonical METEOR is a Java jar (pycocoevalcap's meteor-1.5 with
WordNet synonym + paraphrase-table stages) — neither the JVM nor the
WordNet/paraphrase data is available in this container, so this implements
the exact and stem stages only (the stem stage uses the real Porter
stemmer, the same algorithm METEOR's stem module wraps).  The omission is
flagged machine-readably in result files (evalcap.METRIC_NOTES); scores
track full METEOR closely on caption-length texts, and CHAIRs/CHAIRi (the
headline metrics) are unaffected.
"""
from __future__ import annotations

from functools import lru_cache

from nltk.stem.porter import PorterStemmer

_PORTER = PorterStemmer()


@lru_cache(maxsize=65536)
def _stem(w: str) -> str:
    return _PORTER.stem(w)


def _align(hyp, ref):
    """Greedy left-to-right alignment: exact first, then stem matches.
    Returns (num_matches, num_chunks)."""
    matches = []  # (hyp_idx, ref_idx)
    used_ref = set()
    for stage in ("exact", "stem"):
        for i, hw in enumerate(hyp):
            if any(m[0] == i for m in matches):
                continue
            for j, rw in enumerate(ref):
                if j in used_ref:
                    continue
                ok = hw == rw if stage == "exact" else _stem(hw) == _stem(rw)
                if ok:
                    matches.append((i, j))
                    used_ref.add(j)
                    break
    if not matches:
        return 0, 0
    matches.sort()
    chunks = 1
    for (i1, j1), (i2, j2) in zip(matches, matches[1:]):
        if not (i2 == i1 + 1 and j2 == j1 + 1):
            chunks += 1
    return len(matches), chunks


def meteor_lite(
    hypotheses: dict,
    references: dict,
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
):
    per_image = {}
    for iid, hyps in hypotheses.items():
        hyp = hyps[0].split()
        best = 0.0
        for r in references[iid]:
            ref = r.split()
            m, chunks = _align(hyp, ref)
            if m == 0 or not hyp or not ref:
                continue
            prec = m / len(hyp)
            rec = m / len(ref)
            f_mean = prec * rec / (alpha * prec + (1 - alpha) * rec)
            frag = chunks / m
            penalty = gamma * frag**beta
            best = max(best, f_mean * (1 - penalty))
        per_image[iid] = best
    corpus = sum(per_image.values()) / max(len(per_image), 1)
    return corpus, per_image
