"""Tokenization + singularization without external data downloads.

The reference calls nltk.word_tokenize (needs the punkt model, not
downloadable here) and pattern.en.singularize (py3.10-fragile, absent) —
chair.py:155-156.  These are replaced by:

- ``word_tokenize``: NLTK's TreebankWordTokenizer applied per caption (the
  algorithmic tokenizer behind word_tokenize; punkt is only needed for the
  sentence-splitting step, which we perform with a regex).  Falls back to a
  built-in PTB-style regex tokenizer if nltk is unavailable.
- ``singularize``: rule-based English singularizer covering the inflection
  classes that occur in COCO object vocabulary (tested against the COCO
  synonym list in tests/test_chair.py).
"""
from __future__ import annotations

import re

try:  # nltk is present in this image; its Treebank tokenizer is data-free
    from nltk.tokenize import TreebankWordTokenizer

    _TREEBANK = TreebankWordTokenizer()
except Exception:  # pragma: no cover
    _TREEBANK = None

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_FALLBACK_TOKEN = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")


def word_tokenize(text: str) -> list:
    if _TREEBANK is not None:
        tokens = []
        for sent in _SENT_SPLIT.split(text):
            tokens.extend(_TREEBANK.tokenize(sent))
        return tokens
    return _FALLBACK_TOKEN.findall(text)


# --- singularization ---------------------------------------------------------

_IRREGULAR = {
    "people": "person",
    "men": "man",
    "women": "woman",
    "children": "child",
    "geese": "goose",
    "mice": "mouse",
    "teeth": "tooth",
    "feet": "foot",
    "oxen": "ox",
    "sheep": "sheep",
    "deer": "deer",
    "fish": "fish",
    "knives": "knife",
    "wives": "wife",
    "loaves": "loaf",
    "leaves": "leaf",
    "shelves": "shelf",
    "wolves": "wolf",
    "calves": "calf",
    "scarves": "scarf",
    "cacti": "cactus",
    "skis": "ski",
    "buses": "bus",
    "bases": "base",
}

# words that look plural but are not (or whose -s must be kept)
_UNCHANGED = {
    "its",
    "this",
    "is",
    "us",
    "was",
    "has",
    "gas",
    "grass",
    "glass",
    "class",
    "pants",
    "jeans",
    "scissors",
    "glasses",  # keep: "glasses" (eyewear) should not become "glasse";
    "goggles",
    "clothes",
    "series",
    "species",
    "bus",
    "chess",
    "tennis",
    "lens",
    "less",
    "dress",
    "cross",
    "press",
    "mattress",
    "address",
    "across",
    "delicious",
    "various",
    "spacious",
    "previous",
    "furious",
    "curious",
    "serious",
    "dangerous",
    "numerous",
    "luscious",
    "gorgeous",
    "always",
    "perhaps",
    "whereas",
}


def singularize(word: str) -> str:
    w = word.lower()
    if w in _IRREGULAR:
        return _IRREGULAR[w]
    if w in _UNCHANGED or len(w) <= 2 or not w.endswith("s"):
        return word
    if w.endswith("ss") or w.endswith("us") or w.endswith("is"):
        return word
    if w.endswith("ies") and len(w) > 4:
        return word[:-3] + "y"
    if w.endswith("ves") and len(w) > 4:
        return word[:-3] + "fe" if w[-4] in "i" else word[:-3] + "f"
    if (
        w.endswith("ches")
        or w.endswith("shes")
        or w.endswith("xes")
        or w.endswith("sses")
        or w.endswith("zes")
        or w.endswith("oes")
    ):
        return word[:-2]
    return word[:-1]
