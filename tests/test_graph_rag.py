"""End-to-end query workflow composition (rag/graph_rag.py parity)."""

from __future__ import annotations

import pytest

from graphrag_spark.graph_rag import graph_rag_query, retrieve_documents
from graphrag_spark.pipeline import run_in_memory


@pytest.fixture(scope="module")
def kg(spark, corpus_path):
    out = run_in_memory(spark, spark.read.parquet(corpus_path))
    return (
        out["chunks"].persist(),
        out["nodes"].persist(),
        out["mentions"].persist(),
        out["triples"].persist(),
    )


def test_retrieval_node_expansion_gate(kg):
    """Simple factual queries take the plain dispatcher; comparative
    queries route through graph expansion (expansion_type rows exist in
    the expanded variant's sources but the node's contract stays
    (chunk_id, source, score))."""
    plain = retrieve_documents(*kg, "what is partnership", top_k=5)
    assert plain.columns == ["chunk_id", "source", "score"]
    assert 0 < plain.count() <= 10

    comp = retrieve_documents(*kg, "compare partnership versus rollout", top_k=3)
    assert comp.columns == ["chunk_id", "source", "score"]
    # expansion adds rows beyond the widened top_k
    assert comp.count() > 8
    srcs = {r["source"] for r in comp.collect()}
    assert srcs & {"entity_expansion", "chunk_expansion"}


def test_graph_rag_query_state(kg):
    out = graph_rag_query(*kg, "what is partnership", top_k=5)
    assert out["stages"] == [
        "query_analysis", "retrieval", "graph_reasoning", "generation"
    ]
    assert out["analysis"]["query_type"] == "factual"
    assert out["analysis"]["is_follow_up"] is False

    retrieved = out["retrieved"].collect()
    assert 0 < len(retrieved) <= 5

    ctx = out["context"].collect()
    assert len(ctx) >= len(retrieved)
    assert out["metadata"]["chunks_used"] == sum(1 for r in ctx if r["score"] > 0)

    src = out["sources"].collect()
    assert src
    assert {r["kind"] for r in src} <= {"entity", "chunk"}

    # chunk_only mode: no reasoning enhancement — context == retrieved
    co = graph_rag_query(*kg, "what is partnership", retrieval_mode="chunk_only")
    assert co["context"].count() == co["retrieved"].count()


def test_graph_rag_follow_up_flag(kg):
    out = graph_rag_query(*kg, "tell me more about it")
    assert out["analysis"]["is_follow_up"] is True


def test_expansion_widening_applied_once(kg):
    """ADVICE r3 (medium): the expansion route must widen top_k exactly
    once — retrieve_documents passes the RAW top_k and the internal
    ``retrieve`` applies adjusted_top_k. The initial (non-expansion)
    rows of the expanded result therefore equal the plain dispatcher's
    rows for the same raw top_k."""
    from graphrag_spark import graph_query

    q = "compare partnership versus rollout"
    got = retrieve_documents(*kg, q, top_k=5)
    base = {
        r["chunk_id"]
        for r in got.collect()
        if r["source"] not in ("entity_expansion", "chunk_expansion")
    }
    want = {r["chunk_id"] for r in graph_query.retrieve(*kg, q, top_k=5).collect()}
    assert base == want


def test_batch_retrieve_matches_per_query(kg):
    """r3 VERDICT item 7: the set-oriented multi-query operator must
    reproduce retrieve(mode='chunk_only') per query, including the
    per-query complexity widening."""
    from graphrag_spark import graph_query

    chunks, nodes, mentions, triples = kg
    qs = [
        ("q1", "what is partnership"),
        ("q2", "compare partnership versus rollout"),
        ("q3", "why does the inspection relate to treatment and damage"),
        ("q4", "alpha beta"),
    ]
    spark = chunks.sparkSession
    qdf = spark.createDataFrame(qs, "query_id string, query string")
    got = graph_query.batch_retrieve_chunks(chunks, qdf, top_k=5)
    by_q: dict[str, set] = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(
            (r["chunk_id"], r["source"], r["score"])
        )
    for qid, text in qs:
        want = {
            (r["chunk_id"], r["source"], r["score"])
            for r in graph_query.retrieve(
                chunks, nodes, mentions, triples, text, mode="chunk_only", top_k=5
            ).collect()
        }
        assert by_q.get(qid, set()) == want, qid


def test_batch_retrieve_entities_matches_per_query(kg):
    """Round 4: the set-oriented ENTITY_ONLY operator must reproduce
    retrieve(mode='entity_only') per query, including widening and the
    min-similarity floor."""
    from graphrag_spark import graph_query

    chunks, nodes, mentions, triples = kg
    qs = [
        ("e1", "what is partnership"),
        ("e2", "compare partnership versus rollout"),
        ("e3", "alpha beta gamma"),
    ]
    spark = chunks.sparkSession
    qdf = spark.createDataFrame(qs, "query_id string, query string")
    got = graph_query.batch_retrieve_entities(chunks, nodes, mentions, qdf, top_k=5)
    by_q: dict[str, set] = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(
            (r["chunk_id"], r["source"], r["score"])
        )
    for qid, text in qs:
        want = {
            (r["chunk_id"], r["source"], r["score"])
            for r in graph_query.retrieve(
                chunks, nodes, mentions, triples, text, mode="entity_only", top_k=5
            ).collect()
        }
        assert by_q.get(qid, set()) == want, qid


def test_batch_retrieve_hybrid_matches_per_query(kg):
    """Round 4: the set-oriented HYBRID operator must reproduce
    retrieve(mode='hybrid') per query — including widening, the
    per-query slot split, the decay-expansion entity side, and (for
    multi-hop-recommended queries) the path side and 3-way merge."""
    from graphrag_spark import graph_query

    chunks, nodes, mentions, triples = kg
    qs = [
        ("h1", "what is partnership"),                       # factual, no paths
        ("h2", "compare partnership versus rollout"),        # comparative, paths
        ("h3", "explain the relationship between alpha and beta"),  # analytical+complex
        ("h4", "gamma delta"),                               # general
    ]
    spark = chunks.sparkSession
    qdf = spark.createDataFrame(qs, "query_id string, query string")
    got = graph_query.batch_retrieve_hybrid(
        chunks, nodes, mentions, triples, qdf, top_k=5
    )
    by_q: dict[str, set] = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(
            (r["chunk_id"], r["source"], r["score"])
        )
    for qid, text in qs:
        want = {
            (r["chunk_id"], r["source"], r["score"])
            for r in graph_query.retrieve(
                chunks, nodes, mentions, triples, text, mode="hybrid", top_k=5
            ).collect()
        }
        assert by_q.get(qid, set()) == want, (qid, by_q.get(qid, set()), want)


def test_batch_retrieve_dispatcher(kg):
    """The batch dispatcher routes modes like ``retrieve`` (legacy
    aliases included) and rejects unknown modes with an empty frame."""
    from graphrag_spark import graph_query

    chunks, nodes, mentions, triples = kg
    spark = chunks.sparkSession
    text = "what is partnership"
    qdf = spark.createDataFrame([("d1", text)], "query_id string, query string")
    for mode in ("simple", "entity_only", "graph_enhanced"):
        got = {
            (r["chunk_id"], r["source"], r["score"])
            for r in graph_query.batch_retrieve(
                chunks, nodes, mentions, triples, qdf, mode=mode
            ).collect()
        }
        want = {
            (r["chunk_id"], r["source"], r["score"])
            for r in graph_query.retrieve(
                chunks, nodes, mentions, triples, text, mode=mode
            ).collect()
        }
        assert got == want, mode
    assert (
        graph_query.batch_retrieve(
            chunks, nodes, mentions, triples, qdf, mode="nope"
        ).count()
        == 0
    )


def test_hybrid_retrieval_with_adjacency_index(kg):
    """hybrid_retrieval served from the materialized adjacency index
    equals the direct path."""
    from graphrag_spark import graph_query

    chunks, nodes, mentions, triples = kg
    adj = graph_query.build_entity_adjacency(triples)
    for q in ("what is partnership", "compare partnership versus rollout"):
        direct = {
            tuple(r)
            for r in graph_query.hybrid_retrieval(
                chunks, nodes, mentions, triples, q, top_k=10
            ).collect()
        }
        via = {
            tuple(r)
            for r in graph_query.hybrid_retrieval(
                chunks, nodes, mentions, triples, q, top_k=10, adjacency=adj
            ).collect()
        }
        assert direct == via, q


def test_batch_retrieve_hybrid_empty_queries_schema(kg):
    """Round 5 (r4 ADVICE): the empty-batch frame must carry the SAME
    column names as the non-empty path ('score', not 'hybrid_score') —
    a consumer selecting 'score' on an empty batch must not blow up."""
    from graphrag_spark import graph_query

    chunks, nodes, mentions, triples = kg
    spark = chunks.sparkSession
    empty = spark.createDataFrame([], "query_id string, query string")
    out = graph_query.batch_retrieve_hybrid(chunks, nodes, mentions, triples, empty)
    assert out.columns == ["query_id", "chunk_id", "source", "score"]
    assert out.count() == 0
