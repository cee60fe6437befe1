"""Source-record assembly (deterministic half of the generation node)."""

from __future__ import annotations

from graphrag_spark.generation import prepare_sources


def test_prepare_sources_shapes(spark):
    chunks = spark.createDataFrame(
        [("c1", "x" * 300), ("c2", "short"), ("c3", "no ents here"), ("c0", "zero")],
        "chunk_id string, content string",
    )
    mentions = spark.createDataFrame(
        [("c1", "e1"), ("c1", "e2"), ("c1", "e3"), ("c1", "e4"), ("c2", "e1")],
        "chunk_id string, entity_id string",
    )
    nodes = spark.createDataFrame(
        [("e1", "Alpha", 0.9), ("e2", "Beta", 0.8), ("e3", "Gamma", 0.7), ("e4", "Delta", 0.6)],
        "entity_id string, name string, importance double",
    )
    retrieved = spark.createDataFrame(
        [("c1", "entity_based", 0.8), ("c2", "chunk_based", 0.5),
         ("c3", "entity_based", 0.4), ("c0", "chunk_based", 0.0)],
        "chunk_id string, source string, score double",
    )
    rows = prepare_sources(retrieved, chunks, mentions, nodes).collect()

    # zero-similarity rows are dropped entirely
    assert all(r["chunk_id"] != "c0" for r in rows)

    # entity-based c1 explodes into exactly 3 entity sources, importance order
    e1 = sorted(
        (r for r in rows if r["chunk_id"] == "c1"), key=lambda r: r["entity_name"]
    )
    assert [r["kind"] for r in e1] == ["entity"] * 3
    assert {r["entity_name"] for r in e1} == {"Alpha", "Beta", "Gamma"}  # Delta cut
    assert all(r["relevance"] == 0.8 for r in e1)
    # 200-char preview + ellipsis
    assert all(len(r["content"]) == 203 and r["content"].endswith("...") for r in e1)
    assert all(r["contained_entities"] == "Alpha,Beta,Gamma,Delta" for r in e1)

    # chunk-based c2 is one chunk source with full content + entity csv
    c2 = [r for r in rows if r["chunk_id"] == "c2"]
    assert len(c2) == 1 and c2[0]["kind"] == "chunk"
    assert c2[0]["content"] == "short" and c2[0]["contained_entities"] == "Alpha"
    assert c2[0]["entity_enhanced"] is True

    # entity-based chunk WITHOUT entities falls back to a chunk source
    c3 = [r for r in rows if r["chunk_id"] == "c3"]
    assert len(c3) == 1 and c3[0]["kind"] == "chunk"
    assert c3[0]["entity_enhanced"] is False and c3[0]["contained_entities"] == ""
