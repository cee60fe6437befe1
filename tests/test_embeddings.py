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


def test_embedding_validation_states(spark):
    """validate_embeddings must flag exactly the four bad states
    (reference core/graph_db.py:1193-1386)."""
    from graphrag_spark.embeddings import EMBED_DIM, validate_embeddings

    rows = [
        ("a", [0.5] * EMBED_DIM),          # ok
        ("b", None),                        # missing
        ("c", []),                          # empty
        ("d", [0.5] * (EMBED_DIM - 3)),     # wrong_dim
        ("e", [float("nan")] + [0.5] * (EMBED_DIM - 1)),  # non_finite
        ("f", [float("inf")] + [0.5] * (EMBED_DIM - 1)),  # non_finite
    ]
    df = spark.createDataFrame(rows, "id string, embedding array<double>")
    got = {r["id"]: r["embedding_status"] for r in validate_embeddings(df).collect()}
    assert got == {
        "a": "ok", "b": "missing", "c": "empty",
        "d": "wrong_dim", "e": "non_finite", "f": "non_finite",
    }


def test_repair_embeddings_touches_only_bad_rows(spark):
    """Corrupt k rows -> repair recomputes exactly those k (back to the
    true encoder output) and leaves every other row byte-identical
    (reference fix_inconsistent_embeddings, core/graph_db.py:1550-1626)."""
    import pyspark.sql.functions as F

    from graphrag_spark.embeddings import (
        embedding_validation_summary,
        repair_embeddings,
    )

    texts = [(f"id{i:03d}", f"document number {i} about topic {i % 7}") for i in range(40)]
    df = spark.createDataFrame(texts, "id string, text string")
    from graphrag_spark.embeddings import _embed_df

    truth = _embed_df(df, "id", "text", 64).withColumnRenamed("embedding", "emb_true")
    base = df.join(truth.withColumnRenamed("emb_true", "embedding"), "id")

    corrupt = base.withColumn(
        "embedding",
        F.when(F.col("id") == "id003", F.lit(None).cast("array<double>"))
        .when(F.col("id") == "id007", F.array().cast("array<double>"))
        .when(F.col("id") == "id011", F.slice("embedding", 1, 10))
        .otherwise(F.col("embedding")),
    )
    bad_before = {
        r["embedding_status"]: r["n_rows"]
        for r in embedding_validation_summary(corrupt).collect()
    }
    assert bad_before == {"ok": 37, "missing": 1, "empty": 1, "wrong_dim": 1}

    repaired = repair_embeddings(corrupt, "id", "text")
    after = {
        r["embedding_status"]: r["n_rows"]
        for r in embedding_validation_summary(repaired).collect()
    }
    assert after == {"ok": 40}
    # every row — repaired or untouched — equals the true encoder output
    diff = (
        repaired.join(truth, "id")
        .filter(F.col("embedding") != F.col("emb_true"))
        .count()
    )
    assert diff == 0


def test_repair_embeddings_keeps_null_text_rows(spark):
    """ADVICE r3: a bad row whose text is NULL must come back from the
    repair (md5(NULL) would NULL the join key and drop it); it embeds
    like an empty text (the encoder's zero-gram unit vector)."""
    import pyspark.sql.functions as F

    from graphrag_spark.embeddings import embed_texts_np, repair_embeddings

    df = spark.createDataFrame(
        [
            ("g", "good text", [0.0] * 63 + [1.0]),
            ("n", None, None),
            ("e", "", None),
        ],
        "id string, text string, embedding array<double>",
    )
    repaired = repair_embeddings(df, "id", "text")
    rows = {r["id"]: r for r in repaired.collect()}
    assert set(rows) == {"g", "n", "e"}
    empty_vec = [float(x) for x in embed_texts_np([""])[0]]
    assert rows["n"]["embedding"] == empty_vec
    assert rows["e"]["embedding"] == empty_vec
    assert rows["g"]["embedding"] == [0.0] * 63 + [1.0]
