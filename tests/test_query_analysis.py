"""Query-side heuristics (SURVEY §2.10): native expressions must equal
the pure-Python trace of the reference rules."""

from __future__ import annotations

from graphrag_spark.query_analysis import (
    analyze_queries,
    py_analyze_query,
    py_retrieval_split,
    retrieval_split,
)

QUERIES = [
    "What is the capital of France?",
    "Compare the throughput of engine A versus engine B",
    "Why does the scheduler fall behind under load and how to fix it",
    "who founded Quantum Dynamics Corp",
    "Explain the relationship between latency and batch size",
    "impact of partnership trends on quarterly filings and forecasts",
    "short",
    "list all the items",
    "What is X and what is Y and how do they connect together over time?",
    "",
    "   padded   query   with   extra   spaces   between   every   single   word   here   now  ",
    "\tleading tab what is this",
]


def test_analysis_matches_trace(spark):
    df = spark.createDataFrame([(q,) for q in QUERIES], "query string")
    got = {r["query"]: r.asDict() for r in analyze_queries(df).collect()}
    for q in QUERIES:
        want = py_analyze_query(q)
        g = got[q]
        for k in ("query_type", "complexity", "requires_multiple_sources",
                  "requires_reasoning", "multi_hop_recommended"):
            assert g[k] == want[k], (q, k, g[k], want[k])
        assert list(g["key_concepts"]) == want["key_concepts"], q


def test_split_matches_trace(spark):
    df = analyze_queries(
        spark.createDataFrame([(q,) for q in QUERIES], "query string")
    )
    got = {r["query"]: r.asDict() for r in retrieval_split(df, top_k=10).collect()}
    for q in QUERIES:
        a = py_analyze_query(q)
        want = py_retrieval_split(a["query_type"], a["multi_hop_recommended"], 10)
        g = got[q]
        for k in ("path_weight", "chunk_count", "entity_count", "path_count"):
            assert g[k] == want[k], (q, k, g[k], want[k])
        assert g["chunk_count"] + g["entity_count"] + g["path_count"] >= 1
