"""Per-row span-sequence invariant (BASELINE.json input_hint):
(kind, text, media_ref, order) must be preserved by every
transformation that carries spans — the Spark analog of the reference's
ordered text/media interleaving (core/ocr.py:739-817)."""

from __future__ import annotations

import pyspark.sql.functions as F

from graphrag_spark.corpus import document_text


def test_spans_roundtrip_parquet(spark, doc_rows, corpus_path):
    """Write -> read preserves the exact span sequence per doc."""
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in spark.read.parquet(corpus_path).collect()
    }
    for doc_id, spans in doc_rows:
        expected = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        assert got[doc_id] == expected, doc_id


def test_document_text_preserves_spans(spark, corpus_path):
    """document_text carries the spans column through unchanged, and its
    content equals the reading-order join of text spans."""
    docs = spark.read.parquet(corpus_path)
    out = document_text(docs)
    rows = out.collect()
    assert set(out.columns) >= {"doc_id", "content", "spans"}
    for r in rows:
        expected = "\n\n".join(s["text"] for s in r["spans"] if s["kind"] == "text")
        assert r["content"] == expected
        # order preserved: offsets non-decreasing
        offsets = [s["offset"] for s in r["spans"]]
        assert offsets == sorted(offsets)


def test_media_spans_opaque(spark, corpus_path):
    """Media spans are carried, never parsed: empty text, media_ref set."""
    docs = spark.read.parquet(corpus_path)
    media = docs.select(F.explode("spans").alias("s")).filter(F.col("s.kind") != "text")
    rows = media.collect()
    assert rows, "corpus should contain media spans"
    for r in rows:
        assert r["s"]["text"] == ""
        assert r["s"]["media_ref"].startswith("media://")
