"""Self-contained evaluation suite.

The reference depends on pycocotools + pycocoevalcap (Java jars) + nltk
punkt + pattern.en — none of which are importable in this environment, and
two of its own data files are missing from the repo (synonyms.txt, chair.py
:62; models/utils.py).  This package reimplements the full metric stack in
pure Python with byte-compatible output formats:

  coco.py       minimal COCO annotation index + loadRes
  text.py       PTB-style tokenizer + rule-based singularizer
  metrics/      BLEU-1..4, CIDEr(-D), ROUGE-L, METEOR-lite (SPICE gated)
  chair.py      CHAIRs/CHAIRi evaluator (reference chair_metrics/chair.py)
  pope.py       POPE question builder + scorer (reference pope_metric/)
  consistency.py LM-/image-consistency analyses (chair_metrics extras)
"""
