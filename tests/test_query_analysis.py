"""Query-side heuristics (SURVEY §2.10): native expressions must equal
the pure-Python trace of the reference rules."""

from __future__ import annotations

import pyspark.sql.functions as F

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


def test_follow_up_detection_spark_matches_py(spark):
    from graphrag_spark.query_analysis import follow_up_flag_col, py_detect_follow_up

    cases = [
        "tell me more about the rollout",      # starts-with indicator
        "what about the other one",            # starts-with indicator
        "explain why the numbers differ",      # 'explain' indicator
        "what is it doing there",              # framed ' it '
        "describe the quarterly totals",       # neither
        "about it?",                           # punctuation blocks framing (reference parity)
        "This looks wrong",                    # 'this ' indicator after lower
        "summarize revenue",                   # neither
    ]
    df = spark.createDataFrame([(c,) for c in cases], "q string")
    got = {
        r["q"]: r["f"]
        for r in df.select("q", follow_up_flag_col(F.col("q")).alias("f")).collect()
    }
    for c in cases:
        assert got[c] == py_detect_follow_up(c)["is_follow_up"], c
    assert got["tell me more about the rollout"] is True
    assert got["describe the quarterly totals"] is False
    assert got["about it?"] is False


def test_contextualization_plumbing():
    from graphrag_spark.query_analysis import (
        build_contextualization_prompt, clean_rewritten_query,
    )

    hist = [{"role": "user", "content": "x" * 600}] * 8
    p = build_contextualization_prompt("what about him", hist)
    # last 6 messages only, each truncated to 500 chars
    assert p.count("User:") == 6
    assert "x" * 500 in p and "x" * 501 not in p
    assert p.rstrip().endswith("Rewritten question:")

    assert clean_rewritten_query('  "What did Greta do?"  ') == "What did Greta do?"
    assert clean_rewritten_query("'single'") == "single"
    assert clean_rewritten_query('"mismatched\'') == '"mismatched\''
