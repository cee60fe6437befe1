"""Deterministic feature-hash embeddings."""

from __future__ import annotations

import numpy as np

from graphrag_spark.embeddings import EMBED_DIM, embed_chunks, embed_texts_np


def test_deterministic_and_normalized():
    a = embed_texts_np(["the quick brown fox", "", "hello"])
    b = embed_texts_np(["the quick brown fox", "", "hello"])
    assert np.allclose(a, b)
    for v in a:
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_similar_texts_high_cosine():
    v = embed_texts_np(
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the sleepy dog",
            "completely unrelated spark shuffle partition text",
        ]
    )
    sim_near = float(v[0] @ v[1])
    sim_far = float(v[0] @ v[2])
    assert sim_near > 0.6
    assert sim_near > sim_far + 0.3


def test_embed_chunks_dedups_before_compute(spark):
    rows = [
        ("d1", "d1_chunk_0", "same text content"),
        ("d1", "d1_chunk_1", "same text content"),
        ("d2", "d2_chunk_0", "other text content"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, chunk_id string, content string")
    out = {r["chunk_id"]: r["embedding"] for r in embed_chunks(df).collect()}
    assert len(out) == 3
    assert out["d1_chunk_0"] == out["d1_chunk_1"]
    assert out["d1_chunk_0"] != out["d2_chunk_0"]
    assert len(out["d1_chunk_0"]) == EMBED_DIM
