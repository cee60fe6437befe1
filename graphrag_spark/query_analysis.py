"""Deterministic query-side heuristics (SURVEY.md §2.10) as native
column expressions: query-type classification, complexity, key-concept
extraction, multi-hop recommendation (reference
rag/nodes/query_analysis.py:61-228) and the hybrid retrieval split
(rag/retriever.py:639-686; settings defaults hybrid_chunk_weight=0.6,
hybrid_path_weight=0.6).

These are the parts of the reference's query pipeline that are pure
computation (the LLM rewrite/follow-up steps are not reproduced);
batch-scoring a table of queries with them is itself a training-data
operation (query routing / curriculum bucketing at corpus scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

COMPARATIVE_WORDS = ["compare", "difference", "vs", "versus", "contrast"]
ANALYTICAL_WORDS = ["why", "how", "explain", "reason", "analyze", "relationship", "connection"]
FACTUAL_WORDS = ["what", "who", "when", "where"]
RELATION_WORDS = ["relationship", "connection", "related", "link", "connect", "between"]
TREND_WORDS = ["trend", "pattern", "impact", "effect", "influence", "implication"]

# reference stop_words set (query_analysis.py:96-148)
QUERY_STOP_WORDS = [
    "what", "how", "why", "when", "where", "who", "which", "that", "this",
    "is", "are", "was", "were", "be", "been", "have", "has", "had", "do",
    "does", "did", "will", "would", "could", "should", "may", "might",
    "can", "the", "a", "an", "and", "or", "but", "in", "on", "at", "to",
    "for", "of", "with", "by", "from", "about", "into", "through",
    "during", "before", "after", "above", "below", "up", "down", "out",
    "off", "over", "under", "again", "further", "then", "once",
]

HYBRID_CHUNK_WEIGHT = 0.6
HYBRID_PATH_WEIGHT = 0.6


def _contains_any(lower: Column, words: list[str]) -> Column:
    cond = F.lit(False)
    for w in words:
        cond = cond | lower.contains(w)
    return cond


def analyze_queries(queries: DataFrame, query_col: str = "query") -> DataFrame:
    """Batch query analysis — each heuristic is the reference's rule as
    a native expression (substring containment like the reference's
    ``word in query_lower``, including its partial-word matches)."""
    q = F.col(query_col)
    lower = F.lower(q)
    qtype = (
        F.when(_contains_any(lower, COMPARATIVE_WORDS), "comparative")
        .when(_contains_any(lower, ANALYTICAL_WORDS), "analytical")
        .when(_contains_any(lower, FACTUAL_WORDS), "factual")
        .otherwise("general")
    )
    # Python's str.split() drops empty tokens; Spark's split keeps
    # leading/trailing empties — filter them or padded queries miscount
    n_words = F.size(F.filter(F.split(q, r"\s+"), lambda w: w != ""))
    complexity = F.when(
        (n_words > 10) | lower.contains("and") | lower.contains("or"),
        "complex",
    ).otherwise("simple")
    requires_multiple = (qtype == "comparative") | (complexity == "complex")
    requires_reasoning = qtype.isin("comparative", "analytical")

    cleaned = F.split(
        F.regexp_replace(lower, r"[?!,]", ""), r"\s+"
    )
    concepts = F.slice(
        F.filter(
            cleaned,
            lambda w: (F.length(w) > 2) & ~w.isin(QUERY_STOP_WORDS),
        ),
        1,
        5,
    )
    n_concepts = F.size(concepts)

    multi_hop = (
        (qtype == "comparative")
        | ((qtype == "analytical") & requires_reasoning)
        | ((complexity == "complex") & (n_concepts >= 3))
        | _contains_any(lower, RELATION_WORDS)
        | _contains_any(lower, TREND_WORDS)
    ) & ~(
        (qtype == "factual")
        & (complexity == "simple")
        & (n_concepts <= 2)
        & ~requires_multiple
    )

    return queries.select(
        "*",
        qtype.alias("query_type"),
        complexity.alias("complexity"),
        requires_multiple.alias("requires_multiple_sources"),
        requires_reasoning.alias("requires_reasoning"),
        concepts.alias("key_concepts"),
        multi_hop.alias("multi_hop_recommended"),
    )


def retrieval_split(
    analyzed: DataFrame,
    top_k: int = 10,
    chunk_weight: float = HYBRID_CHUNK_WEIGHT,
    base_path_weight: float = HYBRID_PATH_WEIGHT,
) -> DataFrame:
    """Per-query retrieval budget split (retriever.py:639-686): the
    query-type-adjusted path weight and chunk/entity/path slot counts,
    with multi-hop gated on the analysis recommendation."""
    qt = F.col("query_type")
    path_weight = (
        F.when(qt == "comparative", F.least(F.lit(0.8), F.lit(base_path_weight) * 1.3))
        .when(qt == "analytical", F.least(F.lit(0.7), F.lit(base_path_weight) * 1.1))
        .otherwise(F.greatest(F.lit(0.2), F.lit(base_path_weight) * 0.7))
    )
    use_mh = F.col("multi_hop_recommended")
    remaining = 1.0 - path_weight
    k = F.lit(top_k)
    chunk_mh = F.greatest(F.lit(1), F.floor(k * chunk_weight * remaining).cast("int"))
    entity_mh = F.greatest(F.lit(1), F.floor(k * (1 - chunk_weight) * remaining).cast("int"))
    path_mh = (
        F.when(qt == "comparative", F.greatest(F.floor(k * path_weight).cast("int"), F.lit(top_k // 2)))
        .when(qt == "analytical", F.greatest(F.floor(k * path_weight).cast("int"), F.lit(top_k // 3)))
        .otherwise(F.greatest(F.lit(1), F.floor(k * path_weight).cast("int")))
    )
    chunk_plain = F.greatest(F.lit(1), F.floor(k * chunk_weight).cast("int"))
    return analyzed.select(
        "*",
        F.round(path_weight, 6).alias("path_weight"),
        F.when(use_mh, chunk_mh).otherwise(chunk_plain).cast("int").alias("chunk_count"),
        F.when(use_mh, entity_mh)
        .otherwise(F.greatest(F.lit(1), k - chunk_plain))
        .cast("int")
        .alias("entity_count"),
        F.when(use_mh, F.floor(path_mh)).otherwise(F.lit(0)).cast("int").alias("path_count"),
    )


# ---------------------------------------------------------------- py twins

def py_analyze_query(query: str) -> dict:
    """Pure-Python trace of the reference analysis loop
    (query_analysis.py:61-228) — the test oracle for analyze_queries."""
    import re

    lower = query.lower()
    qtype = "general"
    req_multi = False
    req_reason = False
    if any(w in lower for w in COMPARATIVE_WORDS):
        qtype, req_multi, req_reason = "comparative", True, True
    elif any(w in lower for w in ANALYTICAL_WORDS):
        qtype, req_reason = "analytical", True
    elif any(w in lower for w in FACTUAL_WORDS):
        qtype = "factual"
    complexity = "simple"
    if len(query.split()) > 10 or "and" in lower or "or" in lower:
        complexity = "complex"
        req_multi = True
    words = re.sub(r"[?!,]", "", lower).split()
    stop = set(QUERY_STOP_WORDS)
    concepts = [w for w in words if len(w) > 2 and w not in stop][:5]
    mh = (
        qtype == "comparative"
        or (qtype == "analytical" and req_reason)
        or (complexity == "complex" and len(concepts) >= 3)
        or any(w in lower for w in RELATION_WORDS)
        or any(w in lower for w in TREND_WORDS)
    )
    if qtype == "factual" and complexity == "simple" and len(concepts) <= 2 and not req_multi:
        mh = False
    return {
        "query_type": qtype,
        "complexity": complexity,
        "requires_multiple_sources": req_multi,
        "requires_reasoning": req_reason,
        "key_concepts": concepts,
        "multi_hop_recommended": mh,
    }


def py_retrieval_split(
    query_type: str,
    multi_hop: bool,
    top_k: int = 10,
    chunk_weight: float = HYBRID_CHUNK_WEIGHT,
    base_path_weight: float = HYBRID_PATH_WEIGHT,
) -> dict:
    """Pure-Python trace of retriever.py:639-686."""
    if query_type == "comparative":
        pw = min(0.8, base_path_weight * 1.3)
    elif query_type == "analytical":
        pw = min(0.7, base_path_weight * 1.1)
    else:
        pw = max(0.2, base_path_weight * 0.7)
    if multi_hop:
        remaining = 1.0 - pw
        chunk_count = max(1, int(top_k * chunk_weight * remaining))
        entity_count = max(1, int(top_k * (1 - chunk_weight) * remaining))
        if query_type == "comparative":
            path_count = max(int(top_k * pw), top_k // 2)
        elif query_type == "analytical":
            path_count = max(int(top_k * pw), top_k // 3)
        else:
            path_count = max(1, int(top_k * pw))
    else:
        chunk_count = max(1, int(top_k * chunk_weight))
        entity_count = max(1, top_k - chunk_count)
        path_count = 0
    return {
        "path_weight": round(pw, 6),
        "chunk_count": chunk_count,
        "entity_count": entity_count,
        "path_count": path_count,
    }
