"""The reference's end-to-end query workflow (rag/graph_rag.py:44-64:
analyze_query -> retrieve_documents -> reason_with_graph ->
generate_response, a linear LangGraph chain) as one composition over
the stored KG tables. Everything is the deterministic engine surface;
the only boundary is the final LLM text generation, whose relational
surroundings (source assembly, metadata) are produced here.

Node parity:
- analyze:   query_analysis.py_analyze_query + follow-up flag
             (rag/nodes/query_analysis.py:12-246);
- retrieve:  the dispatcher incl. the graph-expansion gate — complex
             or comparative queries with graph_expansion enabled route
             through retrieve_with_graph_expansion
             (rag/nodes/retrieval.py:100-121);
- reason:    graph_reasoning_enhance, skipped for simple / chunk_only
             modes (rag/nodes/graph_reasoning.py:38-45);
- generate:  prepare_sources + response_metadata
             (rag/nodes/generation.py:45-146); the answer text itself
             is the LLM boundary.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from . import graph_query
from .generation import prepare_sources, response_metadata
from .query_analysis import py_analyze_query, py_detect_follow_up


def retrieve_documents(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    query_text: str,
    retrieval_mode: str = "graph_enhanced",
    top_k: int = 5,
    graph_expansion: bool = True,
) -> DataFrame:
    """The retrieval node (rag/nodes/retrieval.py:18-135): analyze,
    widen top_k by complexity, then — for complex or comparative
    queries when ``graph_expansion`` is on — retrieve WITH graph
    expansion; otherwise the plain dispatcher. Returns
    (chunk_id, source, score)."""
    analysis = py_analyze_query(query_text)
    if graph_expansion and (
        analysis["complexity"] == "complex"
        or analysis["query_type"] == "comparative"
    ):
        # pass the RAW top_k: retrieve_with_graph_expansion's internal
        # ``retrieve`` call applies adjusted_top_k itself, so widening
        # here as well would apply the complexity bump twice
        # (comparative 5 -> 12 instead of the reference's 10)
        return graph_query.retrieve_with_graph_expansion(
            chunks, nodes, mentions, triples, query_text,
            mode=retrieval_mode, top_k=top_k,
        ).select("chunk_id", "source", F.col("similarity").alias("score"))
    return graph_query.retrieve(
        chunks, nodes, mentions, triples, query_text,
        mode=retrieval_mode, top_k=top_k,
    )


def graph_rag_query(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    query_text: str,
    retrieval_mode: str = "graph_enhanced",
    top_k: int = 5,
    graph_expansion: bool = True,
) -> dict:
    """GraphRAG.query (rag/graph_rag.py:192-283) minus the generated
    text: run the full node chain and return the state a caller (or an
    LLM answerer) consumes:

    - 'analysis': the query-analysis dict incl. is_follow_up;
    - 'retrieved': (chunk_id, source, score) after the retrieval node;
    - 'context': the reasoning-enhanced context frame — retrieval rows
      plus graph-expansion rows (reason node skips enhancement for
      simple/chunk_only modes, graph_reasoning.py:38-45);
    - 'sources': the generation node's source records;
    - 'metadata': chunks_used + analysis echo (generation.py:122-146);
    - 'stages': the stage names in execution order (graph_rag.py's
      stage tracking)."""
    analysis = py_analyze_query(query_text)
    analysis.update(py_detect_follow_up(query_text))

    retrieved = retrieve_documents(
        chunks, nodes, mentions, triples, query_text,
        retrieval_mode=retrieval_mode, top_k=top_k,
        graph_expansion=graph_expansion,
    ).persist()

    if retrieval_mode in ("simple", "chunk_only"):
        context = retrieved
    else:
        ranked = retrieved.select(
            "chunk_id",
            F.row_number().over(
                Window.orderBy(F.desc("score"), "chunk_id")
            ).alias("rank"),
        )
        sim_edges = graph_query.chunk_similarity_edges_for(chunks)
        enhanced = graph_query.graph_reasoning_enhance(
            ranked, sim_edges, chunks
        )
        # enhancement keeps retrieval scores for the original rows and
        # assigns expansion rows their traversal similarity
        context = retrieved.unionByName(
            enhanced.filter(F.col("source") == "graph_expansion").select(
                "chunk_id", F.lit("graph_expansion").alias("source"),
                F.col("similarity").alias("score"),
            )
        )

    sources = prepare_sources(context, chunks, mentions, nodes)
    meta = response_metadata(context, analysis)
    return {
        "analysis": analysis,
        "retrieved": retrieved,
        "context": context,
        "sources": sources,
        "metadata": meta,
        "stages": ["query_analysis", "retrieval", "graph_reasoning", "generation"],
    }
