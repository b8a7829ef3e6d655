"""Text-analysis operators for LLM training-data pipelines.

Everything here is a composable JVM-side Column expression (whole-stage
codegen; zero Python in the hot path) over a string column of documents —
designed to scan 100 TB of text with no shuffle at all except where a
group-by is the point (per-language stats).

Operators (BASELINE.json north star — text analysis):
  * tokenization (whitespace + BPE-ish regex)
  * token / char counting
  * quality scoring (length, punctuation ratio, stopword ratio,
    mean token length)
  * language-ID (marker-token n-gram heuristic)
  * document fingerprinting (polynomial rolling hash)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation —
# the shape GPT-2-style byte-pair pre-tokenization produces for ASCII text.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Tiny multilingual marker lexicons for the n-gram/stopword language-ID
# heuristic. Public common function words.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "una"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3", "wo3"),
}

STOPWORDS = LANG_MARKERS["en"]

_MOD = 1_000_000_007


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus; use bpe_tokens for
    arbitrary text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish regex pre-tokenization: letter runs / digit runs / single
    punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, "[A-Za-z0-9 ]", "")
    return F.length(stripped) / F.length(c)


def _isin_filter(words: tuple[str, ...]):
    """Unary lambda factory — PySpark inspects lambda arity, so closures
    must not smuggle extra (defaulted) parameters."""
    return lambda t: t.isin(*words)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, _isin_filter(stopwords)))
    return hits / F.size(toks)


def mean_token_len(col: Column | str) -> Column:
    """Mean token length = (chars - spaces) / tokens, all in one pass."""
    c = F.col(col) if isinstance(col, str) else col
    n_spaces = F.length(c) - F.length(F.regexp_replace(c, " ", ""))
    return (F.length(c) - n_spaces) / (n_spaces + 1)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long-enough, low punctuation,
    some stopwords, sane mean token length. Weights are arbitrary but
    fixed; the point is the *shape* (pure column expression, fuses into
    the scan)."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(400.0), F.lit(1.0))
    punct_score = 1.0 - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    tok_len = mean_token_len(c)
    tok_score = F.when((tok_len >= 3.0) & (tok_len <= 10.0), 1.0).otherwise(0.5)
    return (
        0.3 * len_score + 0.3 * punct_score + 0.2 * stop_score + 0.2 * tok_score
    )


def lang_scores(col: Column | str) -> Column:
    """Map language -> marker-hit count (the language-ID feature vector)."""
    toks = tokens(col)
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in sorted(LANG_MARKERS)]),
        F.array(
            *[
                F.size(F.filter(toks, _isin_filter(LANG_MARKERS[lang])))
                for lang in sorted(LANG_MARKERS)
            ]
        ),
    )


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Argmax language by marker hits; 'und' (undetermined) when no marker
    fires. Deterministic tie-break: alphabetical language order."""
    toks = tokens(col)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        score = F.size(F.filter(toks, _isin_filter(LANG_MARKERS[lang])))
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def fingerprint(col: Column | str, prefix_chars: int = 64) -> Column:
    """Polynomial rolling hash (Horner, base 31, mod 1e9+7) over the code
    points of the first ``prefix_chars`` characters. Pure integer column
    arithmetic — reproducible in any engine, unlike engine-specific hash
    functions (xxhash64 vs DuckDB's hash)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(F.substring(c, 1, prefix_chars), ""), F.ascii)
    head = F.element_at(codes, 1).cast("long")
    tail = F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0)))
    return F.aggregate(
        tail,
        head,
        lambda acc, x: (acc * 31 + x.cast("long")) % F.lit(_MOD),
    )
