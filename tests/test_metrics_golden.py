"""Golden-value tests for the COCOEvalCap metric ports, pinning the exact
pycocoevalcap behaviors that distinguish them from textbook formulas
(VERDICT round-1 missing item 2; expected values hand-computed).

Archive replay of the reference's per-caption metric values is
environment-blocked: the golden values in results/*.json were computed
against COCO ground-truth captions, which (like pycocoevalcap itself) are
not present in this container.  These tests pin the ALGORITHM instead —
pycocoevalcap's published scorer semantics — so a real-data run scores
captions exactly as the reference pipeline would.
"""
import math

import numpy as np
import pytest

from dropoutdecoding_tpu.evalsuite.metrics.bleu import bleu_scores
from dropoutdecoding_tpu.evalsuite.metrics.cider import CiderScorer
from dropoutdecoding_tpu.evalsuite.metrics.meteor import meteor_lite
from dropoutdecoding_tpu.evalsuite.metrics.rouge import rouge_l
from dropoutdecoding_tpu.evalsuite.metrics.spice_lite import spice_lite


# ---------------------------------------------------------------- BLEU
def test_bleu_corpus_hand_computed():
    """Clipped n-gram counts + geometric mean, no BP (hyp==closest ref
    length).  Counts derived by hand for this pair."""
    hyps = {1: ["the cat sat on the mat"]}
    refs = {1: ["the cat sat on a mat", "a cat was sitting on the mat"]}
    corpus, per = bleu_scores(hyps, refs)
    # correct/guess per n (hand-counted): 5/6, 5/5, 3/4, 1/3
    np.testing.assert_allclose(corpus[0], 5 / 6, rtol=1e-6)
    np.testing.assert_allclose(corpus[1], math.sqrt(5 / 6), rtol=1e-6)
    np.testing.assert_allclose(corpus[2], (5 / 6 * 3 / 4) ** (1 / 3), rtol=1e-6)
    np.testing.assert_allclose(
        corpus[3], (5 / 6 * 3 / 4 * 1 / 3) ** (1 / 4), rtol=1e-6
    )


def test_bleu_closest_reference_length():
    """pycocoevalcap uses the CLOSEST ref length (option='closest'), not
    the shortest: hyp len 4 vs refs len 5 and 2 -> reflen 5 -> brevity
    penalty exp(1 - 5/4); the shortest convention would give none."""
    hyps = {1: ["a b c d"]}
    refs = {1: ["a b c d e", "a b"]}
    corpus, _ = bleu_scores(hyps, refs)
    np.testing.assert_allclose(corpus[0], 1.0 * math.exp(1 - 5 / 4), rtol=1e-6)


def test_bleu_closest_tie_prefers_shorter():
    """Tie in |len - testlen| resolves to the shorter ref (min over
    (abs, len) tuples in BleuScorer._single_reflen) -> reflen 3 -> no BP."""
    hyps = {1: ["a b c d"]}
    refs = {1: ["a b c", "a b c d e"]}
    corpus, _ = bleu_scores(hyps, refs)
    np.testing.assert_allclose(corpus[0], 1.0, rtol=1e-6)


def test_bleu_per_sentence_tiny_smoothing():
    """A zero higher-n-gram match must yield a TINY nonzero sentence score
    (the (c+1e-15)/(g+1e-9) smoothing), matching the e-06..e-16 magnitudes
    in the reference's archived per-caption metrics — never exactly 0 and
    never +1-smoothed (which would be ~0.2 here)."""
    hyps = {1: ["x y z w"]}
    refs = {1: ["x q r s"]}  # unigram match 1, no bigram+
    _, per = bleu_scores(hyps, refs)
    b = per[1]
    np.testing.assert_allclose(b[0], 1 / 4, rtol=1e-5)
    assert 0 < b[3] < 1e-8, b[3]
    # exact magnitude: (1/4 * tiny/3 * tiny/2 * tiny/1)^(1/4), tiny=1e-15
    expected = (0.25 * (1e-15 / 3) * (1e-15 / 2) * 1e-15) ** 0.25
    np.testing.assert_allclose(b[3], expected, rtol=1e-3)


def test_bleu_corpus_pools_counts_not_scores():
    """Corpus BLEU pools clipped counts across sentences (not a mean of
    sentence scores): correct (1+1) over guess (2+4) = 1/3, where a mean
    of sentence p1 would give (1/2 + 1/4)/2 = 3/8."""
    hyps = {1: ["a b"], 2: ["c d e f"]}
    refs = {1: ["a x"], 2: ["c x y z"]}
    corpus, _ = bleu_scores(hyps, refs)
    np.testing.assert_allclose(corpus[0], 1 / 3, rtol=1e-6)


# ---------------------------------------------------------------- ROUGE
def test_rouge_max_prec_and_rec_from_different_refs():
    """pycocoevalcap takes max precision and max recall SEPARATELY across
    refs (possibly from different refs): hyp 'a b c d' with refs
    'a b c x' (prec 3/4) and 'd' (rec 1.0) -> F(0.75, 1.0) = 0.8798...,
    not the best per-ref F (0.75)."""
    hyps = {1: ["a b c d"]}
    refs = {1: ["a b c x", "d"]}
    corpus, per = rouge_l(hyps, refs)
    beta = 1.2
    pm, rm = 0.75, 1.0
    expected = ((1 + beta**2) * pm * rm) / (rm + beta**2 * pm)
    np.testing.assert_allclose(per[1], expected, rtol=1e-6)
    assert abs(per[1] - 0.75) > 0.1  # the per-ref-best convention differs


def test_rouge_zero_when_no_overlap():
    corpus, per = rouge_l({1: ["a b"]}, {1: ["x y"]})
    assert per[1] == 0.0


# ---------------------------------------------------------------- CIDEr
def test_cider_single_image_is_zero():
    """With a 1-image corpus every n-gram's idf is log(1)-log(df)=0, so
    CIDEr collapses — the mechanism behind the reference's 'CIDEr ~ 0'
    chunking artifact (SURVEY.md §6), here in the limit chunk=1."""
    corpus, per = CiderScorer().compute(
        {1: ["a cat sat"]}, {1: ["a cat sat"]}
    )
    assert corpus == 0.0


def test_cider_identical_caption_unique_ngrams():
    """Two-image corpus, disjoint vocab: hyp identical to the only ref =>
    cosine 1 per n, idf = log(2) everywhere, length penalty 1 => score 10."""
    hyps = {1: ["a b c d e"], 2: ["v w x y z"]}
    refs = {1: ["a b c d e"], 2: ["v w x y z"]}
    corpus, per = CiderScorer().compute(hyps, refs)
    np.testing.assert_allclose(per[1], 10.0, rtol=1e-6)
    np.testing.assert_allclose(corpus, 10.0, rtol=1e-6)


def test_cider_length_penalty():
    """Same unigram content, length delta 2 (4-grams absent in the short
    ref; only n=1 contributes): score = 10/4 * cos1 * exp(-4/72)."""
    hyps = {1: ["a a"], 2: ["q r s t"]}
    refs = {1: ["a"], 2: ["q r s t"]}
    _, per = CiderScorer().compute(hyps, refs)
    # n=1: hyp vec {a: 2*log2}, norm 2log2; ref vec {a: log2}; clipped dot
    # min(2log2, log2)*log2 = (log2)^2; cos = (log2)^2/(2log2*log2) = 1/2
    expected = 10.0 / 4 * 0.5 * math.exp(-(1**2) / (2 * 36))
    np.testing.assert_allclose(per[1], expected, rtol=1e-6)


# ---------------------------------------------------------------- METEOR
def test_meteor_exact_match_perfect():
    """METEOR-1.5 en-norm params (alpha=.85, beta=.2, gamma=.6): exact
    self-match gives P=R=1 -> fmean=1; the jar's single-chunk
    full-coverage special case zeroes the fragmentation penalty, so an
    identical sentence scores exactly 1.0."""
    corpus, per = meteor_lite({1: ["the cat sat"]}, {1: ["the cat sat"]})
    np.testing.assert_allclose(per[1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(corpus, 1.0, rtol=1e-6)


def test_meteor_partial_coverage_penalty():
    """A single chunk that does NOT cover the reference keeps its
    fragmentation penalty: 'the cat' vs 'the cat sat' has m=2,
    len(ref)=3 -> frag=(1/2), penalty=0.6*(1/2)^0.2."""
    _, per = meteor_lite({1: ["the cat"]}, {1: ["the cat sat"]})
    wm = 0.25 + 0.75  # function 'the' + content 'cat'
    prec = wm / (0.25 + 0.75)
    rec = wm / (0.25 + 0.75 + 0.75)
    fmean = prec * rec / (0.85 * prec + 0.15 * rec)
    np.testing.assert_allclose(
        per[1], fmean * (1 - 0.6 * 0.5**0.2), rtol=1e-6
    )


def test_meteor_porter_stem_stage():
    """'happy'/'happiness' align only through the Porter stem stage (both
    stem to 'happi'), stage weight 0.6: P=R=0.6 -> fmean=0.6; the
    single stem match covers both one-word strings, so the jar's
    full-coverage case zeroes the penalty -> score 0.6."""
    corpus, per = meteor_lite({1: ["happy"]}, {1: ["happiness"]})
    np.testing.assert_allclose(per[1], 0.6, rtol=1e-6)


def test_meteor_function_word_weighting():
    """delta=0.75: content words weigh 3x function words in weighted
    P/R.  Hyp matching only the function word 'the' of the ref scores
    below a hyp matching only the content word 'cat' (same alignment
    shape: 1 match, 1 chunk, both one-word hyps)."""
    _, fn = meteor_lite({1: ["the"]}, {1: ["the cat"]})
    _, ct = meteor_lite({1: ["cat"]}, {1: ["the cat"]})
    assert 0 < fn[1] < ct[1]


def test_meteor_fragmentation_penalty():
    """Same matches, scrambled order -> more chunks -> lower score."""
    _, a = meteor_lite({1: ["a b c d"]}, {1: ["a b c d"]})
    _, b = meteor_lite({1: ["d c b a"]}, {1: ["a b c d"]})
    assert b[1] < a[1]


# ---------------------------------------------------------------- SPICE-lite
def test_spice_lite_hand_computed():
    """Content words stemmed: hyp {cat, sat, mat} vs union-of-refs
    {cat, sat, mat, dog} -> P=1, R=3/4, F=6/7."""
    hyps = {1: ["the cat sat on the mat"]}
    refs = {1: ["a cat sat on a mat", "the dog and the cat"]}
    corpus, per = spice_lite(hyps, refs)
    np.testing.assert_allclose(per[1]["pr"], 1.0)
    np.testing.assert_allclose(per[1]["re"], 0.75)
    np.testing.assert_allclose(per[1]["f"], 2 * 1 * 0.75 / 1.75, rtol=1e-6)
    assert per[1]["tp"] == 3 and per[1]["fn"] == 1


def test_spice_lite_function_words_excluded():
    _, per = spice_lite({1: ["the of and"]}, {1: ["cat"]})
    assert per[1]["f"] == 0.0 and per[1]["tp"] == 0.0


def test_metric_notes_flow_to_outputs():
    """The SPICE/METEOR substitutions must be machine-flagged in the
    overall dict and the .txt table (VERDICT missing item 1)."""
    from dropoutdecoding_tpu.evalsuite.metrics.evalcap import METRIC_NOTES

    assert "SPICE" in METRIC_NOTES and "no JVM" in METRIC_NOTES["SPICE"]

    from dropoutdecoding_tpu.evalsuite.chair import metric_table

    table = metric_table(
        {
            "overall_metrics": {
                "SPICE": 0.1, "METEOR": 0.2, "CIDEr": 0.0,
                "CHAIRs": 0.3, "CHAIRi": 0.07,
                "_metric_notes": dict(METRIC_NOTES),
            }
        }
    )
    lines = table.splitlines()
    assert lines[0] == "SPICE\tMETEOR\tCIDEr\tCHAIRs\tCHAIRi"
    assert lines[1] == "10.0\t20.0\t0.0\t30.0\t7.0"
    assert any(l.startswith("# SPICE:") for l in lines[2:])


# ------------------------------------------------------------- tokenizer
@pytest.mark.parametrize(
    "src,want",
    [
        ("The dog doesn't run.", "the dog does n't run"),
        (
            "I can't believe it's the dog's ball!",
            "i ca n't believe it 's the dog 's ball",
        ),
        ("He cannot swim; she won't either.", "he can not swim she wo n't either"),
        (
            "A well-known artist -- truly great (I think).",
            "a well-known artist truly great i think",
        ),
        ("It is 1.5 meters tall, costing $3.50.", "it is 1.5 meters tall costing 3.50"),
        ('"Quoted text" and \'single\' quotes', "quoted text and single quotes"),
        ("We're gonna win... maybe", "we 're gon na win maybe"),
        ("ends with dots...", "ends with dots"),
        ("multi  \n whitespace", "multi whitespace"),
    ],
)
def test_ptb_tokenize(src, want):
    """PTBTokenizer fidelity: contractions split with their apostrophe
    kept (PTB 'do n't' / 'dog 's' survive pycocoevalcap's punctuation
    removal), in-word hyphens and decimal points kept, standalone
    punctuation removed."""
    from dropoutdecoding_tpu.evalsuite.metrics.evalcap import ptb_tokenize

    assert ptb_tokenize(src) == want
