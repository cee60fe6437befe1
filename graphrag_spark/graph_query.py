"""Query-side graph operators over the materialized KG tables — the
Spark analogs of the reference's Cypher traversals.

Covered (SURVEY.md §2): G3 bounded BFS expansion with distance decay,
G4 entity neighborhood subgraph, G5 beam-search multi-hop paths (per-
hop top-k via window rank), G6 strength-decay expansion, T1 vector
search top-k, T4 entities by importance, T7 fulltext search, T8 chunk
ordering. All are iterative self-joins + window top-k — no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DISTANCE_DECAY = {1: 0.3, 2: 0.2}  # reference core/graph_db.py:516-557
DEFAULT_DECAY = 0.15


def undirected_edges(triples: DataFrame) -> DataFrame:
    """triples -> symmetric edge list (RELATED_TO is undirected,
    core/graph_db.py:1023)."""
    fwd = triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"), "strength")
    return fwd.union(triples.select(F.col("obj").alias("src"), F.col("subj").alias("dst"), "strength"))


def expand_entities(triples: DataFrame, seeds: list[str], depth: int = 2) -> DataFrame:
    """G3 (core/graph_db.py:516-557): BFS from seed entity names with
    per-depth distance-decay scores; keeps the first (shallowest)
    depth per reached entity."""
    spark = triples.sparkSession
    edges = undirected_edges(triples)
    frontier = spark.createDataFrame([(s,) for s in seeds], "name string").withColumn(
        "depth", F.lit(0)
    ).withColumn("score", F.lit(1.0))
    reached = frontier
    for d in range(1, depth + 1):
        decay = DISTANCE_DECAY.get(d, DEFAULT_DECAY)
        nxt = (
            edges.join(frontier.select(F.col("name").alias("src")), "src")
            .select(F.col("dst").alias("name"))
            .distinct()
            .join(reached.select("name"), "name", "left_anti")
            .withColumn("depth", F.lit(d))
            .withColumn("score", F.lit(float(decay)))
        )
        nxt = nxt.localCheckpoint(eager=True)
        reached = reached.unionByName(nxt)
        frontier = nxt
    return reached


def neighborhood(triples: DataFrame, entity_name: str, hops: int = 1) -> DataFrame:
    """G4 (core/graph_db.py:1143-1191): induced edge set within `hops`
    of the entity."""
    nodes = expand_entities(triples, [entity_name], depth=hops).select("name")
    e = undirected_edges(triples)
    return (
        e.join(nodes.withColumnRenamed("name", "src"), "src", "left_semi")
        .join(nodes.withColumnRenamed("name", "dst"), "dst", "left_semi")
        .select("src", "dst", "strength")
        .distinct()
    )


def beam_search_paths(
    triples: DataFrame,
    nodes: DataFrame,
    seeds: list[str],
    max_hops: int = 2,
    beam_size: int = 8,
) -> DataFrame:
    """G5 (core/graph_db.py:1628-1802): per-hop beam expansion; path
    score = 0.5*path + 0.3*strength + 0.2*importance (:1766-1772);
    visited filtering; global beam per hop via window rank."""
    spark = triples.sparkSession
    edges = undirected_edges(triples)
    imp = nodes.select(F.col("name").alias("dst"), "importance")
    paths = spark.createDataFrame([(s,) for s in seeds], "tail string").select(
        F.col("tail"),
        F.array("tail").alias("path"),
        F.lit(1.0).alias("path_score"),
    )
    out = paths
    for _hop in range(max_hops):
        expanded = (
            edges.join(paths.withColumnRenamed("tail", "src"), "src")
            .join(F.broadcast(imp), "dst", "left")
            .na.fill(0.0, ["importance"])
            .filter(~F.array_contains("path", F.col("dst")))
            .select(
                F.col("dst").alias("tail"),
                F.concat("path", F.array("dst")).alias("path"),
                (0.5 * F.col("path_score") + 0.3 * F.col("strength") + 0.2 * F.col("importance")).alias(
                    "path_score"
                ),
            )
        )
        # global per-hop beam = orderBy().limit() — TakeOrderedAndProject
        # (parallel partial top-k per partition, merged on the driver),
        # not a single-partition window over every expanded path
        paths = (
            expanded.orderBy(F.desc("path_score"), F.col("tail"), F.concat_ws(">", "path"))
            .limit(beam_size)
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(paths)
    return out.select("path", F.round("path_score", 6).alias("path_score"))


def expand_with_strength_decay(
    triples: DataFrame,
    seeds: list[str],
    max_depth: int = 2,
    max_entity_connections: int = 20,
    threshold: float = 0.1,
) -> DataFrame:
    """G6 — strength-decay entity expansion (rag/retriever.py:256-407,
    settings defaults: max_entity_connections=20,
    expansion_similarity_threshold=0.1, max_expansion_depth=2).

    Per depth d: follow each frontier entity's top
    ``max_entity_connections`` relationships by strength, keep those
    with strength >= threshold, and score the reached entity
    ``max(existing, strength * 0.7^(d+1))``; newly reached entities
    form the next frontier. Expansion stops early once the expanded
    set exceeds 3x the connection cap, and the final set is trimmed to
    the top 2x by score (retriever.py:330-344).

    Documented divergence: the reference caps the entities *processed*
    per depth in frontier insertion order (a latency guard in its
    online loop); this set-oriented version caps the frontier
    deterministically by (score desc, name asc). Returns (name, score).
    """
    spark = triples.sparkSession
    edges = undirected_edges(triples)
    # the reference holds seeds in a dict/set — duplicates collapse
    scores = spark.createDataFrame(
        [(s, 1.0) for s in dict.fromkeys(seeds)], "name string, score double"
    )
    frontier = scores
    for d in range(max_depth):
        f = (
            frontier.orderBy(F.desc("score"), "name")
            .limit(max_entity_connections)
            .select(F.col("name").alias("src"))
        )
        w = Window.partitionBy("src").orderBy(F.desc("strength"), "dst")
        rels = (
            edges.join(F.broadcast(f), "src")
            .withColumn("_rk", F.row_number().over(w))
            .filter((F.col("_rk") <= max_entity_connections) & (F.col("strength") >= threshold))
        )
        decay = 0.7 ** (d + 1)
        cand = (
            rels.groupBy(F.col("dst").alias("name"))
            .agg(F.max("strength").alias("s"))
            .select("name", (F.col("s") * F.lit(decay)).alias("cand_score"))
        )
        new = cand.join(scores, "name", "left_anti").select(
            "name", F.col("cand_score").alias("score")
        )
        scores = (
            scores.join(cand, "name", "left")
            .select(
                "name",
                F.greatest("score", F.coalesce("cand_score", F.lit(0.0))).alias("score"),
            )
            .unionByName(new)
            .localCheckpoint(eager=True)
        )
        frontier = new
        if scores.count() > 3 * max_entity_connections:
            break
    return (
        scores.select("name", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), "name")
        .limit(2 * max_entity_connections)
    )


def hybrid_merge(
    chunk_results: DataFrame,
    entity_results: DataFrame,
    entity_fallback: float = 0.3,
) -> DataFrame:
    """J6 — hybrid retrieval merge (rag/retriever.py:725-762): full
    outer merge keyed by chunk_id; chunks found by both paths get
    ``min(1, (chunk_score + entity_score) * 0.8)`` and source
    'hybrid'; single-path chunks keep their own score (entity side
    falls back to ``entity_fallback`` when its score is null).

    Inputs: (chunk_id, similarity) frames from the vector path and the
    entity-expansion path. Returns (chunk_id, source, hybrid_score).
    """
    c = chunk_results.select("chunk_id", F.col("similarity").alias("chunk_score"))
    e = entity_results.select("chunk_id", F.col("similarity").alias("entity_score"))
    merged = c.join(e, "chunk_id", "full_outer")
    both = F.col("chunk_score").isNotNull() & F.col("entity_score").isNotNull()
    score = (
        F.when(
            both,
            F.least(
                F.lit(1.0),
                (F.coalesce("chunk_score", F.lit(0.0)) + F.coalesce("entity_score", F.lit(0.0)))
                * 0.8,
            ),
        )
        .when(F.col("chunk_score").isNotNull(), F.col("chunk_score"))
        .otherwise(F.coalesce("entity_score", F.lit(entity_fallback)))
    )
    source = (
        F.when(both, "hybrid")
        .when(F.col("chunk_score").isNotNull(), "chunk_based")
        .otherwise("entity_based")
    )
    return merged.select(
        "chunk_id",
        source.alias("source"),
        F.round(score, 6).alias("hybrid_score"),
    ).orderBy(F.desc("hybrid_score"), "chunk_id")


def fulltext_search(chunks: DataFrame, query: str, top_k: int = 10) -> DataFrame:
    """T7 (core/graph_db.py:1084-1110): term-frequency ranked chunk
    search. Each query term is counted with regexp_count (word
    boundaries); score = sum of term frequencies, length-normalized."""
    terms = [t.lower() for t in query.split() if t.strip()]
    score = F.lit(0.0)
    for t in terms:
        pat = r"(?i)\b" + "".join("\\" + c if not c.isalnum() else c for c in t) + r"\b"
        score = score + F.regexp_count(F.col("content"), F.lit(pat))
    scored = chunks.select(
        "chunk_id",
        "doc_id",
        (score / F.greatest(F.length("content"), F.lit(1)) * 1000).alias("raw"),
    ).withColumn("score", F.round("raw", 6)).drop("raw")
    return scored.filter(F.col("score") > 0).orderBy(F.desc("score"), "chunk_id").limit(top_k)


def top_entities(nodes: DataFrame, k: int = 10) -> DataFrame:
    """T4 (core/graph_db.py:1051-1067)."""
    return nodes.orderBy(F.desc("importance"), "name").limit(k)


def chunks_in_order(chunks: DataFrame, doc_id: str) -> DataFrame:
    """T8 (core/graph_db.py:559-570)."""
    return chunks.filter(F.col("doc_id") == doc_id).orderBy("chunk_index")
