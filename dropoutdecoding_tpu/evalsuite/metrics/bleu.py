"""Corpus/sentence BLEU-1..4 with the COCOEvalCap conventions (shortest
reference length for the brevity penalty, per-ngram clipped counts, and the
'closest' length option unused by COCO).  Pure Python replacement for
pycocoevalcap.bleu."""
from __future__ import annotations

import math
from collections import Counter


def _ngrams(tokens, n):
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu_scores(hypotheses: dict, references: dict, max_n: int = 4):
    """Args:
      hypotheses: {id: [hyp_tokens_str]} (single hypothesis per id)
      references: {id: [ref_tokens_str, ...]}
    Returns:
      (corpus [B1..B4], per_image {id: [B1..B4]})
    COCOEvalCap computes sentence scores with the corpus smoothing ratio;
    here per-image scores use +1 smoothing on higher n-grams (standard
    practice) — CHAIR only consumes these for reporting.
    """
    ids = list(hypotheses.keys())
    total_clip = [0] * max_n
    total_count = [0] * max_n
    total_hyp_len = 0
    total_ref_len = 0
    per_image = {}

    stats = {}
    for iid in ids:
        hyp = hypotheses[iid][0].split()
        refs = [r.split() for r in references[iid]]
        hyp_len = len(hyp)
        # COCO Bleu uses the *shortest* reference length
        ref_len = min(len(r) for r in refs) if refs else 0
        clips, counts = [], []
        for n in range(1, max_n + 1):
            h_ngrams = _ngrams(hyp, n)
            max_ref = Counter()
            for r in refs:
                for g, c in _ngrams(r, n).items():
                    max_ref[g] = max(max_ref[g], c)
            clip = sum(min(c, max_ref[g]) for g, c in h_ngrams.items())
            cnt = max(len(hyp) - n + 1, 0)
            clips.append(clip)
            counts.append(cnt)
            total_clip[n - 1] += clip
            total_count[n - 1] += cnt
        total_hyp_len += hyp_len
        total_ref_len += ref_len
        stats[iid] = (clips, counts, hyp_len, ref_len)

    def _bleu(clips, counts, hyp_len, ref_len, smooth):
        out = []
        acc = 0.0
        dead = False
        bp = (
            1.0
            if hyp_len > ref_len
            else (math.exp(1 - ref_len / hyp_len) if hyp_len > 0 else 0.0)
        )
        for n in range(max_n):
            c, t = clips[n], counts[n]
            if smooth and n > 0:
                c, t = c + 1, t + 1
            p = c / t if t > 0 else 0.0
            if p <= 0:
                dead = True
            if dead:
                out.append(0.0)
            else:
                acc += math.log(p)
                out.append(bp * math.exp(acc / (n + 1)))
        return out

    corpus = _bleu(total_clip, total_count, total_hyp_len, total_ref_len, smooth=False)
    for iid in ids:
        clips, counts, hl, rl = stats[iid]
        per_image[iid] = _bleu(clips, counts, hl, rl, smooth=True)
    return corpus, per_image
