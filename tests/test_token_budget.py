"""Token-budget request splitting vs a literal transcription of the
reference greedy loop (core/token_manager.py:221-316)."""

from __future__ import annotations

from graphrag_spark.token_budget import (
    RESERVED_TOKENS,
    approx_tokens,
    py_split_batches,
    token_batches,
)


def ref_loop(query, contents, context_size, system_tokens=0):
    """Direct transcription of split_context_chunks: returns the list
    of batches, each a list of (content, truncated)."""
    available = context_size - RESERVED_TOKENS - approx_tokens(query) - system_tokens
    if available <= 0:
        return []
    batches, current = [], []
    current_tokens = 0
    for content in contents:
        t = approx_tokens(content)
        if t > available:
            if current:
                batches.append(current)
                current, current_tokens = [], 0
            batches.append([(content[: available * 4], True)])
            continue
        if current_tokens + t > available:
            if current:
                batches.append(current)
            current, current_tokens = [(content, False)], t
        else:
            current.append((content, False))
            current_tokens += t
    if current:
        batches.append(current)
    return batches


def flatten(batches):
    return [(b, c, tr) for b, batch in enumerate(batches) for c, tr in batch]


CASES = [
    ("q", ["a" * 400, "b" * 400, "c" * 400], 1300),       # splits mid-list
    ("q", ["x" * 40000], 1300),                           # oversized -> truncated lone batch
    ("q", ["a" * 100, "y" * 40000, "b" * 100], 1300),     # oversized between normals
    ("q", [], 1300),
    ("very long query " * 300, ["a"], 1300),              # no budget left
    ("q", ["a" * 4, "b" * 4, "c" * 4], 1300),             # all fit one batch
    ("q", [f"w{i} " * 50 for i in range(30)], 1500),      # many batches
]


def test_trace_matches_reference_loop():
    for query, contents, ctx in CASES:
        assert py_split_batches(query, contents, ctx) == flatten(
            ref_loop(query, contents, ctx)
        ), (query[:20], len(contents), ctx)


def test_spark_matches_trace(spark):
    rows = []
    for qid, (query, contents, ctx) in enumerate(CASES):
        for i, c in enumerate(contents):
            rows.append((qid, query, i, c))
    if not rows:
        return
    df = spark.createDataFrame(rows, "query_id long, query string, chunk_index int, content string")
    # single context size across queries for the Spark call
    got = {
        (r["query_id"], r["chunk_index"]): (r["batch_id"], r["content"], r["truncated"])
        for r in token_batches(df, context_size=1300).collect()
    }
    for qid, (query, contents, ctx) in enumerate(CASES):
        want = py_split_batches(query, contents, 1300)
        for i in range(len(want)):
            assert got[(qid, i)] == (want[i][0], want[i][1], want[i][2]), (qid, i)
