"""Entity name/type normalization + low-value filtering.

Reference semantics: name normalization (core/entity_extraction.py:
223-246 — whitespace collapse, punctuation strip keeping word chars /
space / - . ( ) /, sub-floor canonicalization, trailing-parenthetical
strip), type normalization (:248-271 — uppercase + mapping table ->
canonical 10 types, default CONCEPT), low-value entity filter (:273-298,
:129-148 — importance<0.3, stopword/pronoun/generic/numeric patterns).

Two implementations with identical behavior, tested against each other:
``norm_*_col`` (native Spark Column expressions — WholeStageCodegen,
used by the pipeline) and ``py_norm_*`` (pure Python — used by the
reference-port oracle and property tests).
"""

from __future__ import annotations

import re
from itertools import chain

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from .vocab import TYPE_ALIASES

# -- name normalization ------------------------------------------------------

_PUNCT_RE = r"[^\w\s\-\.\(\)/]"
_TRAILING_PAREN_RE = r"\s*\([^)]*\)\s*$"
_SUBFLOOR_RE = r"(?i)sub[\s\-]+floor"


def norm_name_col(name: Column) -> Column:
    c = F.regexp_replace(name, _PUNCT_RE, "")
    c = F.regexp_replace(c, _SUBFLOOR_RE, "subfloor")
    c = F.regexp_replace(c, _TRAILING_PAREN_RE, "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    # strip trailing dots/commas left by punctuation-adjacent mentions
    c = F.regexp_replace(c, r"[\.\s]+$", "")
    return c


def py_norm_name(name: str) -> str:
    c = re.sub(_PUNCT_RE, "", name or "")
    c = re.sub(_SUBFLOOR_RE, "subfloor", c)
    c = re.sub(_TRAILING_PAREN_RE, "", c)
    c = re.sub(r"\s+", " ", c)
    c = c.strip()
    c = re.sub(r"[\.\s]+$", "", c)
    return c


# -- type normalization ------------------------------------------------------

def _type_map_col() -> Column:
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(TYPE_ALIASES.items())])


def norm_type_col(etype: Column) -> Column:
    key = F.upper(F.trim(F.regexp_replace(etype, r"\s*\([^)]*\)\s*$", "")))
    return F.coalesce(_type_map_col()[key], F.lit("CONCEPT"))


def py_norm_type(etype: str) -> str:
    key = re.sub(r"\s*\([^)]*\)\s*$", "", etype or "").strip().upper()
    return TYPE_ALIASES.get(key, "CONCEPT")


# -- low-value filter --------------------------------------------------------

MIN_IMPORTANCE = 0.3

LOW_VALUE_PATTERNS = [
    r"(?i)^(the|this|that|these|those|it|they|he|she|we|you|i|a|an)$",
    r"(?i)^(data|information|system|systems|document|documents|overview|item|items|thing|things|stuff|people)$",
    r"(?i)^(various|several|many|some|other|misc|miscellaneous)\b.*$",
    r"^\d{1,3}$",
    r"^.{0,2}$",
]
GENERIC_CONCEPT_PATTERNS = [
    r"(?i)^(concept|idea|topic|theory|approach|method|process)s?$",
    r"(?i)^(general|common|basic)\b.*$",
    r"(?i)^\w+ing$",
]
_LOW_RE = [re.compile(p) for p in LOW_VALUE_PATTERNS]
_GEN_RE = [re.compile(p) for p in GENERIC_CONCEPT_PATTERNS]


def is_low_value_col(name: Column, etype: Column, importance: Column) -> Column:
    low = importance < MIN_IMPORTANCE
    for p in LOW_VALUE_PATTERNS:
        low = low | name.rlike(p)
    generic = F.lit(False)
    for p in GENERIC_CONCEPT_PATTERNS:
        generic = generic | name.rlike(p)
    low = low | ((etype == "CONCEPT") & (importance < 0.6) & generic)
    return low


def py_is_low_value(name: str, etype: str, importance: float) -> bool:
    if importance < MIN_IMPORTANCE:
        return True
    for p in _LOW_RE:
        if p.match(name):
            return True
    if etype == "CONCEPT" and importance < 0.6:
        for p in _GEN_RE:
            if p.match(name):
                return True
    return False


def surface_norm_map(mentions_raw: DataFrame) -> DataFrame:
    """Distinct (surface, messy_type) pairs -> normalized name/type plus
    precomputed low-value pattern flags.

    Scale rationale: extraction emits O(10^6..10^9) mention/rel rows but
    only O(10^4) *distinct* surface forms (the alias vocabulary). Running
    the 5-regex normalization chain per row burns JVM regex time
    linearly in corpus size; running it once per distinct surface and
    broadcast-joining back is constant in corpus size. Semantics are
    identical (verified by tests against the per-row column functions).
    """
    pairs = mentions_raw.select("name", "type_or_target").distinct()
    low_name = F.lit(False)
    for p in LOW_VALUE_PATTERNS:
        low_name = low_name | F.col("norm_name").rlike(p)
    generic = F.lit(False)
    for p in GENERIC_CONCEPT_PATTERNS:
        generic = generic | F.col("norm_name").rlike(p)
    return (
        pairs.withColumn("norm_name", norm_name_col(F.col("name")))
        .withColumn("norm_type", norm_type_col(F.col("type_or_target")))
        .withColumn("low_name", low_name)
        .withColumn("generic_name", generic)
    )


_MAX_SURFACE_MAP_ROWS = 2_000_000


def _materialize_small(df: DataFrame, context: str) -> DataFrame:
    """Collect a provably-small dataframe to the driver and re-create it
    as a literal, so broadcast joins against it never re-execute its
    (scan + shuffle) subtree — AQE otherwise re-runs that subtree once
    per downstream query stage. The surface map is bounded by the alias
    vocabulary (O(10^4) rows regardless of corpus size); the guard
    protects against an extractor emitting unbounded junk."""
    rows = df.limit(_MAX_SURFACE_MAP_ROWS + 1).collect()
    if len(rows) > _MAX_SURFACE_MAP_ROWS:
        raise ValueError(f"{context}: surface map exceeds {_MAX_SURFACE_MAP_ROWS} rows")
    return df.sparkSession.createDataFrame(rows, df.schema)


def normalize_mentions(mentions_raw: DataFrame, smap: DataFrame | None = None) -> DataFrame:
    """Extraction rows (kind='entity') -> normalized, filtered mentions.
    Normalization runs on the distinct-surface map (broadcast join).
    Pass a pre-materialized ``smap`` (from materialize_surface_map) to
    share one map across mention and rel normalization."""
    if smap is None:
        smap = materialize_surface_map(mentions_raw)
    df = mentions_raw.join(F.broadcast(smap), ["name", "type_or_target"]).select(
        "chunk_id",
        "doc_id",
        F.col("norm_name").alias("name"),
        F.col("norm_type").alias("entity_type"),
        F.col("score").alias("importance"),
        "description",
        "low_name",
        "generic_name",
    ).filter(F.col("name") != "")
    keep = ~(
        (F.col("importance") < MIN_IMPORTANCE)
        | F.col("low_name")
        | ((F.col("entity_type") == "CONCEPT") & (F.col("importance") < 0.6) & F.col("generic_name"))
    )
    return df.filter(keep).drop("low_name", "generic_name")


def materialize_surface_map(mentions_raw: DataFrame) -> DataFrame:
    """One driver-materialized surface map shared by mention and rel
    normalization (rel endpoint surfaces are a subset of entity
    surfaces by the extractor contract)."""
    return _materialize_small(surface_norm_map(mentions_raw), "surface_map")


def normalize_rels(rels_raw: DataFrame, smap: DataFrame | None = None) -> DataFrame:
    """Extraction rows (kind='rel') -> normalized relationship
    candidates. Endpoint surfaces normalize via a distinct-surface map
    (two broadcast joins), not per-row regex. When ``smap`` (the
    mentions surface map) is given, no extra pass over rels_raw is
    needed to discover surfaces."""
    if smap is not None:
        names = smap.select(F.col("name").alias("surface"), F.col("norm_name").alias("norm")).distinct()
    else:
        names = _materialize_small(
            rels_raw.select(F.col("name").alias("surface"))
            .union(rels_raw.select(F.col("type_or_target").alias("surface")))
            .distinct()
            .withColumn("norm", norm_name_col(F.col("surface"))),
            "normalize_rels",
        )
    src_map = names.select(F.col("surface").alias("name"), F.col("norm").alias("source"))
    dst_map = names.select(F.col("surface").alias("type_or_target"), F.col("norm").alias("target"))
    return (
        rels_raw.join(F.broadcast(src_map), "name")
        .join(F.broadcast(dst_map), "type_or_target")
        .select(
            "chunk_id",
            "doc_id",
            "source",
            "target",
            F.col("score").alias("strength"),
            "description",
        )
        .filter((F.col("source") != "") & (F.col("target") != "") & (F.col("source") != F.col("target")))
    )
