"""Answer-quality rubric: native expressions vs the pure-Python trace
of the reference heuristics (core/quality_scorer.py:190-320)."""

from __future__ import annotations

from graphrag_spark.answer_quality import answer_quality, py_answer_quality

CASES = [
    ("The merge completed. The shuffle ran well. All good here.",
     "why did the merge succeed", "merge completed because shuffle ran well " * 10, 3),
    ("", "what is this", "some context words", 2),
    ("short answer", "what is the merge", "", 0),
    ("word " * 200, "query terms here", "word " * 50, 6),
    ("No periods at all just words and words", "unrelated", "totally different text", 1),
    ("a. b. c. d. e.", "tiny", "a b c d e", 4),
]


def test_rubric_matches_trace(spark):
    df = spark.createDataFrame(
        CASES, "answer string, query string, context string, n_sources int"
    )
    got = {r["answer"]: r.asDict() for r in answer_quality(df).collect()}
    for answer, query, context, n in CASES:
        want = py_answer_quality(answer, query, context, n)
        g = got[answer]
        for k, v in want.items():
            if isinstance(v, float):
                assert abs(g[k] - v) < 1e-6, (answer[:30], k, g[k], v)
            else:
                assert g[k] == v, (answer[:30], k, g[k], v)
