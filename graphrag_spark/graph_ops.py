"""Graph maintenance + aggregation operators over the materialized
tables (nodes / mentions / triples / chunks) — the Spark analogs of the
reference's Cypher surface.

Covered (SURVEY.md §2): A1 graph stats, A2 per-doc chunk counts, A3
entity-extraction status, A4 doc-entity rollup, C6 post-entity chunk
quality filter, S14 delete cascade, J1/J2 similarity edges (via
similarity.pairwise_topk over deterministic embeddings).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .embeddings import embed_chunks, embed_entities
from .similarity import pairwise_topk, topk_per_item


def graph_stats(nodes: DataFrame, chunks: DataFrame, mentions: DataFrame, triples: DataFrame) -> DataFrame:
    """A1 (core/graph_db.py:668-701): one-row label/edge counts."""
    n = nodes.agg(F.count("*").alias("n_entities")).collect()[0]["n_entities"]
    c = chunks.agg(F.count("*").alias("c"), F.countDistinct("doc_id").alias("d")).collect()[0]
    m = mentions.count()
    t = triples.count()
    spark = nodes.sparkSession
    return spark.createDataFrame(
        [(c["d"], c["c"], n, m, t)],
        "n_documents long, n_chunks long, n_entities long, n_mentions long, n_triples long",
    )


def per_doc_stats(chunks: DataFrame) -> DataFrame:
    """A2 (core/graph_db.py:1804-1849): per-doc chunk counts."""
    return chunks.groupBy("doc_id").agg(
        F.count("*").alias("chunk_count"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
    )


def extraction_status(chunks: DataFrame, mentions: DataFrame, coverage_threshold: float = 0.7) -> DataFrame:
    """A3 (core/graph_db.py:703-740): per-doc distinct chunk/entity
    counts, chunk coverage, extraction-complete flag."""
    per_chunk = mentions.groupBy("doc_id").agg(
        F.countDistinct("chunk_id").alias("chunks_with_entities"),
        F.countDistinct("entity_id").alias("n_entities"),
    )
    totals = chunks.groupBy("doc_id").agg(F.countDistinct("chunk_id").alias("n_chunks"))
    return (
        totals.join(per_chunk, "doc_id", "left")
        .na.fill(0, ["chunks_with_entities", "n_entities"])
        .withColumn(
            "extraction_complete",
            (F.col("n_entities") > 0)
            & (F.col("chunks_with_entities") >= coverage_threshold * F.col("n_chunks")),
        )
    )


def doc_entity_rollup(mentions: DataFrame, chunks: DataFrame) -> DataFrame:
    """A4 (core/graph_db.py:1924-1943): per (doc, entity) mention count
    + distinct chunk indexes."""
    return (
        mentions.join(chunks.select("chunk_id", "chunk_index"), "chunk_id")
        .groupBy("doc_id", "entity_id")
        .agg(
            F.count("*").alias("n_mentions"),
            F.sort_array(F.collect_set("chunk_index")).alias("chunk_indexes"),
        )
    )


def post_entity_chunk_filter(chunks: DataFrame, mentions: DataFrame, rels_norm: DataFrame | None = None) -> DataFrame:
    """C6 (core/chunking.py:198-249, core/ocr.py:300-330): drop a chunk
    when (quality<0.2 and it produced no entities and no relationships)
    or (len<30 and no entities). Left join against entity counts keeps
    the scan set-oriented."""
    ent_counts = mentions.groupBy("chunk_id").agg(F.count("*").alias("n_ents"))
    df = chunks.join(ent_counts, "chunk_id", "left").na.fill(0, ["n_ents"])
    if rels_norm is not None:
        rel_counts = rels_norm.groupBy("chunk_id").agg(F.count("*").alias("n_rels"))
        df = df.join(rel_counts, "chunk_id", "left").na.fill(0, ["n_rels"])
    else:
        df = df.withColumn("n_rels", F.lit(0))
    drop = ((F.col("quality_score") < 0.2) & (F.col("n_ents") == 0) & (F.col("n_rels") == 0)) | (
        (F.length("content") < 30) & (F.col("n_ents") == 0)
    )
    return df.filter(~drop).drop("n_ents", "n_rels")


def delete_documents(
    doc_ids: list[str],
    chunks: DataFrame,
    mentions: DataFrame,
    nodes: DataFrame,
    triples: DataFrame,
) -> dict[str, DataFrame]:
    """S14 delete cascade (core/graph_db.py:572-635) as anti-join
    rewrites: drop the docs' chunks and mentions, strip their chunk ids
    from entity/triple source_chunks, drop orphaned entities (no
    remaining source chunks) and triples referencing them.

    Returns the rewritten tables; the caller overwrites storage
    (Iceberg overwrite / parquet rewrite)."""
    doc_set = F.array(*[F.lit(d) for d in doc_ids])
    chunks2 = chunks.filter(~F.col("doc_id").isin(doc_ids))
    mentions2 = mentions.filter(~F.col("doc_id").isin(doc_ids))

    def strip(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "source_chunks",
            F.filter(
                "source_chunks",
                lambda c: ~F.array_contains(doc_set, F.regexp_replace(c, r"_chunk_\d+$", "")),
            ),
        )

    nodes2 = strip(nodes).filter(F.size("source_chunks") > 0)
    surviving = nodes2.select(F.upper("name").alias("_k"))
    triples2 = (
        strip(triples)
        .filter(F.size("source_chunks") > 0)
        .join(F.broadcast(surviving.withColumnRenamed("_k", "_ks")), F.upper("subj") == F.col("_ks"), "left_semi")
        .join(F.broadcast(surviving.withColumnRenamed("_k", "_ko")), F.upper("obj") == F.col("_ko"), "left_semi")
    )
    return {"chunks": chunks2, "mentions": mentions2, "nodes": nodes2, "triples": triples2}


def chunk_similarity_edges(chunks: DataFrame, threshold: float = 0.7, k: int = 5) -> DataFrame:
    """J1 (core/graph_db.py:239-297): within-document chunk SIMILAR_TO
    edges, per-chunk top-k — one distributed job instead of the
    reference's per-doc O(n^2) Python loops with per-pair MERGEs.

    Uses the embedding column stored on the chunks table when present
    (the reference reads stored vectors, graph_db.py:248-254); falls
    back to on-the-fly embedding for bare chunk frames."""
    if "embedding" in chunks.columns:
        emb = chunks.select("chunk_id", "doc_id", "embedding")
    else:
        emb = embed_chunks(chunks)
    return pairwise_topk(
        emb, k=k, threshold=threshold, id_col="chunk_id", vec_col="embedding", block_col="doc_id"
    )


def entity_similarity_edges(
    nodes: DataFrame, threshold: float = 0.7, k: int = 5, exact_max_rows: int = 200_000
) -> DataFrame:
    """J2 (core/graph_db.py:343-425): entity SIMILAR_TO edges across the
    whole entity set (the reference scores all entity pairs, skipping
    self-pairs), per-entity top-k.

    Scale path: block-pair exact kNN (O((n/nb)^2) per task, never a
    full matrix on one executor). Above ``exact_max_rows`` entities the
    quadratic total work stops being worth exactness and the job
    switches to sign-random-projection LSH candidates + exact verify
    (O(n*bands) shuffle) — the 100 TB posture, with recall bounded by
    the band parameters instead of silently degrading the runtime."""
    from .similarity import lsh_bucket_pairs, pairwise_topk_blocked

    if "embedding" in nodes.columns:
        emb = nodes.select("entity_id", "embedding")
    else:
        emb = embed_entities(nodes)
    if emb.count() > exact_max_rows:
        from .embeddings import EMBED_DIM

        cand = lsh_bucket_pairs(
            emb, threshold=threshold, id_col="entity_id", vec_col="embedding",
            dim=EMBED_DIM,  # engine vectors have a known dim: skip the probe job
        )
        sym = cand.unionByName(
            cand.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "similarity")
        )
        return topk_per_item(sym, k=k)
    return pairwise_topk_blocked(
        emb, k=k, threshold=threshold, id_col="entity_id", vec_col="embedding"
    )
