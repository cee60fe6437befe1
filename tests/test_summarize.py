"""X9-X11 summarizer post-processing: native Spark expressions must
agree exactly with the pure-Python twins (each implements reference
core/document_summarizer.py:218-285 once)."""

from __future__ import annotations

import pyspark.sql.functions as F

from graphrag_spark.summarize import (
    clean_hashtags_col,
    extract_summary_json_col,
    py_clean_hashtags,
    py_extract_summary_json,
    py_truncate_at_sentence,
    py_valid_document_type,
    truncate_at_sentence_col,
    valid_document_type_col,
)

RESPONSES = [
    '{"summary": "a doc.", "document_type": "invoice", "hashtags": ["x", "#y"]}',
    'Sure! Here is the JSON:\n{"summary": "multi\\nline", "document_type": "REPORT", "hashtags": []}',
    "no json at all, just prose " * 10,
    'broken {"summary": "unterminated...',
    'prefix {"summary": "s1"} middle {"document_type": "memo"} suffix',
    "",
    '{"document_type": "weird_type"}',
    '{"summary": null, "hashtags": null}',
]


def test_extract_json_matches_python(spark):
    df = spark.createDataFrame([(r,) for r in RESPONSES], "resp string")
    got = df.select(extract_summary_json_col(F.col("resp"), 40).alias("p"), "resp").collect()
    for r in got:
        want = py_extract_summary_json(r["resp"], 40)
        assert r["p"]["summary"] == want["summary"], r["resp"][:50]
        assert r["p"]["document_type"] == want["document_type"], r["resp"][:50]
        assert list(r["p"]["hashtags"] or []) == want["hashtags"], r["resp"][:50]


def test_greedy_json_span():
    """The reference regex is greedy DOTALL: first '{' to LAST '}' —
    a response with two objects parses as invalid JSON -> fallback."""
    r = 'prefix {"summary": "s1"} middle {"document_type": "memo"} suffix'
    out = py_extract_summary_json(r, 25)
    assert out == {"summary": r[:25], "document_type": "other", "hashtags": []}


def test_hashtags():
    assert py_clean_hashtags([" spark ", "#data", "", 42, "x"]) == ["#spark", "#data", "#", "#x"]
    spark_tags = None  # checked via the column path below


def test_hashtags_col(spark):
    df = spark.createDataFrame([([" spark ", "#data", "graph"],)], "tags array<string>")
    got = df.select(clean_hashtags_col(F.col("tags")).alias("t")).first()["t"]
    assert got == ["#spark", "#data", "#graph"]


def test_valid_document_type(spark):
    cases = [" Invoice ", "report", "nonsense", "", "RESUME"]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r["v"] for r in df.select(valid_document_type_col(F.col("t")).alias("v")).collect()]
    assert got == [py_valid_document_type(c) for c in cases]
    assert got == ["invoice", "report", "other", "other", "resume"]


def test_truncate_at_sentence(spark):
    texts = [
        "short text.",
        "w" * 200,  # no period: hard cut
        ("sentence one. " * 20),  # period past min: pull back
        "x" * 149 + ".",  # period exactly at the cut edge
        "a. " + "y" * 300,  # period before min: hard cut
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["v"] for r in df.select(truncate_at_sentence_col(F.col("t"), 150, 80).alias("v")).collect()]
    want = [py_truncate_at_sentence(t, 150, 80) for t in texts]
    assert got == want
    assert all(len(v) <= 150 for v in got)
