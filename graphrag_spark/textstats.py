"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting — all *native* Spark expressions
(whole-stage codegen; zero Python in the hot path).

These extend the reference's chunk-quality surface (core/ocr.py:162-298)
to the operations a 100 TB training-data pipeline needs. Each has an
ANSI-SQL twin in __spark_entry__.oracle_sql() for the DuckDB gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .chunking import _quality_cols

# small per-language stopword lists for the n-gram/stopword-hit heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "para", "con", "por"],
}


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0)))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: word pieces + punctuation as single tokens —
    a cheap, deterministic proxy for subword tokenizers."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def _stopword_hits(text: Column, words: list[str]) -> Column:
    """Distinct stopword hits in the text (set semantics on both Spark
    and DuckDB sides keeps the oracle comparable)."""
    toks = F.split(F.lower(text), r"\s+")
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: language with most distinct stopword hits;
    deterministic tie-break by language code; 'und' when no hits."""
    scores = [(code, _stopword_hits(text, ws)) for code, ws in sorted(LANG_STOPWORDS.items())]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # iterate in reverse so earlier codes win ties (first match kept)
    for code, s in reversed(scores):
        out = F.when((s == best) & (best > 0), F.lit(code)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Reference chunk-quality score formula (core/ocr.py:162-258) as a
    reusable column over any text."""
    return _quality_cols(text)["quality_score"]


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of case/whitespace-normalized text
    (stable across engines — used for dedup survivorship joins)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


def minshingle_fingerprint(text: Column, n: int = 3) -> Column:
    """Rolling-hash document fingerprint: min xxhash64 over word n-gram
    shingles — native expressions only (sequence + transform)."""
    words = F.split(F.trim(text), r"\s+")
    nw = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(nw - n, F.lit(0)))
    shingles = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.array_min(F.transform(shingles, lambda s: F.xxhash64(s)))


def document_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document text profile."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count_ws(t).alias("tokens_ws"),
        token_count_bpe(t).alias("tokens_bpe"),
        lang_id(t).alias("lang_detected"),
        F.round(quality_score(t), 6).alias("quality"),
        fingerprint(t).alias("fp"),
    )
