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

# follow-up detection word lists, verbatim (query_analysis.py:266-311)
FOLLOW_UP_INDICATORS = [
    "tell me more", "what about", "and", "also", "additionally",
    "his ", "her ", "their ", "its ", "this ", "that ", "these ",
    "those ", "he ", "she ", "they ", "it ", "more about", "explain",
    "clarify", "elaborate", "same", "similar", "different",
    "compared to",
]
CONTEXT_REFERENCES = [
    "he", "she", "they", "it", "this", "that", "these", "those",
    "him", "her", "them", "his", "their", "its",
]


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


def follow_up_flag_col(q: Column) -> Column:
    """Follow-up detection (query_analysis.py:248-389) as one native
    boolean: a query is flagged when it starts with a follow-up
    indicator or contains a context-reference pronoun framed by spaces
    — exactly the reference's heuristic gate, which is ALSO its own
    stand-in when the LLM refinement's JSON fails to parse (:384-389:
    ``is_follow_up = needs_context = starts_with_indicator or
    contains_reference``). The LLM refinement between gate and fallback
    is an encoder boundary, like extraction; this column IS the
    deterministic contract.

    The space-framed containment subsumes the reference's separate
    ``startswith(f"{ref} ")`` check (framing prepends a space), and its
    punctuation behavior is preserved: ``"about it?"`` does not frame
    ``" it "``, matching the reference."""
    lower = F.trim(F.lower(q))
    starts = F.lit(False)
    for w in FOLLOW_UP_INDICATORS:
        starts = starts | lower.startswith(w)
    framed = F.concat(F.lit(" "), lower, F.lit(" "))
    contains = F.lit(False)
    for r in CONTEXT_REFERENCES:
        contains = contains | framed.contains(f" {r} ")
    return starts | contains


def py_detect_follow_up(query: str) -> dict:
    """Pure-Python twin of ``follow_up_flag_col`` (the test oracle),
    returning the reference's fallback-contract dict (:384-389)."""
    lower = query.lower().strip()
    starts = any(lower.startswith(w) for w in FOLLOW_UP_INDICATORS)
    framed = f" {lower} "
    contains = any(f" {r} " in framed for r in CONTEXT_REFERENCES)
    flag = starts or contains
    return {"is_follow_up": flag, "needs_context": flag}


def build_contextualization_prompt(query: str, chat_history: list[dict]) -> str:
    """The deterministic half of query contextualization
    (query_analysis.py:397-436): window the history to the last 6
    messages, truncate each content to 500 chars, assemble the rewrite
    prompt. The rewrite itself is an LLM boundary; its failure fallback
    returns the query unchanged (:455-457)."""
    recent = chat_history[-6:] if len(chat_history) > 6 else chat_history
    history_text = "\n".join(
        f"{m['role'].title()}: {m['content'][:500]}" for m in recent
    )
    return (
        "Given the conversation history and the current follow-up "
        "question, rewrite the question to be self-contained and clear "
        "without the previous context.\n\nPrevious conversation:\n"
        f"{history_text}\n\nCurrent follow-up question: {query}\n\n"
        "Rewritten question:"
    )


def clean_rewritten_query(text: str) -> str:
    """Rewriter output cleanup (query_analysis.py:444-450): strip, then
    drop one layer of matching single or double quotes."""
    out = text.strip()
    for qc in ('"', "'"):
        if out.startswith(qc) and out.endswith(qc) and len(out) >= 2:
            out = out[1:-1]
    return out


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
