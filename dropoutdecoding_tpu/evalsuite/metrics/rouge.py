"""ROUGE-L (LCS F-measure with beta=1.2, the COCOEvalCap convention)."""
from __future__ import annotations


def _lcs_len(a, b):
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        ai = a[i - 1]
        for j in range(1, len(b) + 1):
            if ai == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l(hypotheses: dict, references: dict, beta: float = 1.2):
    per_image = {}
    for iid, hyps in hypotheses.items():
        hyp = hyps[0].split()
        best = 0.0
        for ref in references[iid]:
            r = ref.split()
            lcs = _lcs_len(hyp, r)
            if lcs == 0:
                continue
            prec = lcs / len(hyp)
            rec = lcs / len(r)
            f = ((1 + beta**2) * prec * rec) / (rec + beta**2 * prec)
            best = max(best, f)
        per_image[iid] = best
    corpus = sum(per_image.values()) / max(len(per_image), 1)
    return corpus, per_image
