"""Reusable operator implementations (LLM-data-pipeline extensions).

Modules:
  text.py       — tokenization, quality scoring, language-ID, fingerprints
  dedup.py      — exact, MinHash+LSH, SimHash, n-gram Jaccard dedup
  similarity.py — embedding cosine top-k (brute force + hyperplane-LSH ANN)
  multimodal.py — opaque binary columns + stubbed decode via mapInPandas

All operators are DataFrame-native (JVM expressions / higher-order
functions) unless Python is semantically required, in which case they use
Arrow-batched mapInPandas — never row-at-a-time UDFs.
"""
