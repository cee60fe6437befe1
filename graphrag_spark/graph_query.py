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


# Driver beam fast path (see beam_search_paths): adjacency + importance
# maps collected once per (triples, nodes) table pair and cached by
# input files — the same serving-index pattern as the fulltext _meta and
# IVF matrix caches (INPUT-side state, never query results). Frames
# without a stable file listing rebuild per call (tests, ad-hoc frames).
_DRIVER_BEAM_CACHE: dict[tuple, object] = {}
_DRIVER_BEAM_MAX_ROWS = 200_000


def _driver_cached(df: DataFrame, tag: str, build):
    """Build-and-cache driver state keyed by a frame's input files (no
    stable listing -> uncached rebuild per call, e.g. test frames)."""
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        files = ()
    key = (tag, files) if files else None
    if key is not None and key in _DRIVER_BEAM_CACHE:
        return _DRIVER_BEAM_CACHE[key]
    data = build()
    if key is not None:
        _DRIVER_BEAM_CACHE[key] = data
    return data


def _driver_graph_adjacency(triples: DataFrame):
    """Undirected adjacency dict {src: [(dst, strength, source_chunks)]}
    when the triples frame fits the driver cap, else None. The collect
    is LIMIT-guarded: at most cap+1 rows ever reach the driver."""

    def build():
        has_sc = "source_chunks" in triples.columns
        cols = ["subj", "obj", "strength"] + (["source_chunks"] if has_sc else [])
        rows = triples.select(*cols).limit(_DRIVER_BEAM_MAX_ROWS + 1).collect()
        if len(rows) > _DRIVER_BEAM_MAX_ROWS:
            return None
        adj: dict[str, list] = {}
        for r in rows:
            sc = list(r["source_chunks"]) if has_sc else []
            adj.setdefault(r["subj"], []).append((r["obj"], r["strength"], sc))
            adj.setdefault(r["obj"], []).append((r["subj"], r["strength"], sc))
        return adj

    return _driver_cached(triples, "adj", build)


def _driver_importance(nodes: DataFrame):
    """{name: importance} when the nodes frame fits the cap, else None."""

    def build():
        rows = nodes.select("name", "importance").limit(_DRIVER_BEAM_MAX_ROWS + 1).collect()
        if len(rows) > _DRIVER_BEAM_MAX_ROWS:
            return None
        return {r["name"]: r["importance"] for r in rows}

    return _driver_cached(nodes, "imp", build)


def _driver_beam_data(triples: DataFrame, nodes: DataFrame):
    """(adjacency dict, importance dict) when both frames fit the
    driver cap, else None (distributed hop loop)."""
    adj = _driver_graph_adjacency(triples)
    if adj is None:
        return None
    imp = _driver_importance(nodes)
    if imp is None:
        return None
    return (adj, imp)


def beam_search_paths(
    triples: DataFrame,
    nodes: DataFrame,
    seeds: list[str],
    max_hops: int = 2,
    beam_size: int = 8,
    min_edge_strength: float = 0.0,
    with_support: bool = False,
) -> DataFrame:
    """G5 (core/graph_db.py:1628-1802): per-hop beam expansion; path
    score = 0.5*path + 0.3*strength + 0.2*importance (:1766-1772);
    visited filtering; global beam per hop via window rank.

    ``with_support`` additionally accumulates the traversed triples'
    source_chunks per path (the reference's per-hop supporting chunk
    ids, graph_db.py:1714-1728) for path-provenance retrieval.

    Execution shape: the per-hop expansion + global beam runs
    DISTRIBUTED (edges join a <=beam_size broadcast frame; the beam is
    a TakeOrderedAndProject — parallel partial top-k per partition,
    merged on the driver — never a single-partition window); the
    surviving <=beam_size rows are collected per hop so the next hop
    joins a literal frame and the final result is literal — one
    bounded job per hop, no checkpoint lineage, no union-of-
    checkpoints job at consumption.

    Driver fast path (r6, the canonicalize.py union-find pattern): when
    the edge and node frames are LIMIT-guarded small, the hop loop runs
    in pure Python over a cached driver adjacency — zero jobs per
    request instead of one per hop plus two broadcast builds. The
    arithmetic is the identical IEEE expression (0.5*ps + 0.3*st +
    0.2*imp, left-associated), the per-hop ordering key is the same
    (desc score, tail, '>'-joined path; UTF-8 byte order and code-point
    order agree), and the final round/sort_array still run as the SAME
    Spark expressions over the literal result — so rows are
    bit-identical to the distributed loop (oracled by kg_beam_paths)."""
    spark = triples.sparkSession
    driver_data = _driver_beam_data(triples, nodes)
    if driver_data is not None:
        adj, impmap = driver_data
        beam_rows = [(s, [s], 1.0, []) for s in dict.fromkeys(seeds)]
        out_rows = list(beam_rows)
        for _hop in range(max_hops):
            expanded = []
            for tail, path, ps, sup in beam_rows:
                for dst, st, sc in adj.get(tail, ()):
                    if st < min_edge_strength or dst in path:
                        continue
                    imp = impmap.get(dst)
                    imp = 0.0 if imp is None else imp
                    score = 0.5 * ps + 0.3 * st + 0.2 * imp
                    nsup = list(dict.fromkeys(sup + sc)) if with_support else sup
                    expanded.append((dst, path + [dst], score, nsup))
            expanded.sort(key=lambda r: (-r[2], r[0], ">".join(r[1])))
            beam_rows = expanded[:beam_size]
            out_rows.extend(beam_rows)
        out = spark.createDataFrame(
            out_rows, "tail string, path array<string>, path_score double, support array<string>"
        )
        cols = ["path", F.round("path_score", 6).alias("path_score")]
        if with_support:
            cols.append(F.sort_array("support").alias("support"))
        return out.select(*cols)
    if with_support:
        sc = triples.select(
            F.col("subj").alias("src"), F.col("obj").alias("dst"), "strength", "source_chunks"
        )
        edges = sc.unionByName(
            sc.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "strength", "source_chunks"
            )
        ).filter(F.col("strength") >= min_edge_strength)
    else:
        edges = undirected_edges(triples).filter(F.col("strength") >= min_edge_strength)
    # cached for the hop loop only (each hop re-reads it); the returned
    # frame is literal, so the cache is dropped before returning
    edges = edges.persist()
    imp = nodes.select(F.col("name").alias("dst"), "importance")
    beam_schema = (
        "tail string, path array<string>, path_score double, support array<string>"
    )
    beam_rows = [(s, [s], 1.0, []) for s in dict.fromkeys(seeds)]
    out_rows = list(beam_rows)
    for _hop in range(max_hops):
        paths = spark.createDataFrame(beam_rows, beam_schema)
        new_support = (
            F.array_distinct(F.concat("support", F.col("source_chunks")))
            if with_support
            else F.col("support")
        )
        expanded = (
            edges.join(F.broadcast(paths.withColumnRenamed("tail", "src")), "src")
            .join(F.broadcast(imp), "dst", "left")
            .na.fill(0.0, ["importance"])
            .filter(~F.array_contains("path", F.col("dst")))
            .select(
                F.col("dst").alias("tail"),
                F.concat("path", F.array("dst")).alias("path"),
                (0.5 * F.col("path_score") + 0.3 * F.col("strength") + 0.2 * F.col("importance")).alias(
                    "path_score"
                ),
                new_support.alias("support"),
            )
        )
        beam_rows = [
            (r["tail"], list(r["path"]), r["path_score"], list(r["support"]))
            for r in expanded.orderBy(
                F.desc("path_score"), F.col("tail"), F.concat_ws(">", "path")
            )
            .limit(beam_size)
            .collect()
        ]
        out_rows.extend(beam_rows)
    edges.unpersist()
    out = spark.createDataFrame(out_rows, beam_schema)
    cols = ["path", F.round("path_score", 6).alias("path_score")]
    if with_support:
        cols.append(F.sort_array("support").alias("support"))
    return out.select(*cols)


def multi_hop_retrieval(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    query_vec: list[float],
    seed_top_k: int = 5,
    max_hops: int = 2,
    beam_size: int = 8,
    min_edge_strength: float = 0.0,
    top_chunks: DataFrame | None = None,
    seeds: list[str] | None = None,
) -> DataFrame:
    """Multi-hop reasoning retrieval (rag/retriever.py:409-600) as one
    declarative DAG over the stored tables:

    1. hybrid seeding — vector top (2k) chunks for the query, entities
       mentioned in them, top ``seed_top_k`` by importance;
    2. beam-search paths from the seeds with per-edge supporting-chunk
       provenance (the traversed triples' source_chunks);
    3. path scoring — ``0.6*path_score + 0.3*cos(query, mean entity
       embedding along the path) + 0.1*max cos(query, supporting-chunk
       embedding)`` (retriever.py:541-550, alpha/beta/gamma weights);
    4. one row per supporting chunk with the best path's score
       (set-oriented dedup; the reference keeps first-path order and
       dedups later in the hybrid merge).

    Returns (chunk_id, similarity) — the path-based side of the hybrid
    merge (see ``hybrid_merge``)."""
    from .similarity import cosine_col, cosine_topk_query

    # 1. hybrid seeding — callers that already hold the query-scored
    # top chunks / seed entities (hybrid_retrieval's shared scan and
    # seed collect) pass them in; only standalone use pays those jobs
    if seeds is None:
        if top_chunks is None:
            top_chunks = cosine_topk_query(
                chunks, query_vec, k=2 * seed_top_k, id_col="chunk_id"
            ).select("chunk_id")
        seeds = [
            r["name"]
            for r in mentions.join(F.broadcast(top_chunks), "chunk_id")
            .join(nodes.select("entity_id", "name", "importance"), "entity_id")
            .groupBy("name")
            .agg(F.max("importance").alias("importance"))
            .orderBy(F.desc("importance"), "name")
            .limit(seed_top_k)
            .collect()
        ]
    if not seeds:
        return chunks.sparkSession.createDataFrame([], "chunk_id string, similarity double")

    # 2. scored paths with provenance
    paths = beam_search_paths(
        triples, nodes, seeds, max_hops=max_hops, beam_size=beam_size,
        min_edge_strength=min_edge_strength, with_support=True,
    ).filter(F.size("support") > 0)
    paths = paths.withColumn("path_id", F.concat_ws(">", "path"))

    # 3a. path embedding = elementwise mean of entity embeddings
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    ent = paths.select("path_id", F.explode("path").alias("name")).join(
        nodes.select("name", "embedding"), "name"
    )
    dim_vals = ent.select("path_id", F.posexplode("embedding").alias("pos", "v"))
    path_emb = (
        dim_vals.groupBy("path_id", "pos")
        .agg(F.avg("v").alias("v"))
        .groupBy("path_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("path_id", F.transform("pv", lambda s: s["v"]).alias("path_emb"))
    )
    path_q_sim = path_emb.select(
        "path_id", cosine_col(F.col("path_emb"), q).alias("path_q_sim")
    )

    # 3b. max query-similarity over each path's supporting chunks
    support = paths.select("path_id", "path_score", F.explode("support").alias("chunk_id"))
    chunk_sim = chunks.select(
        "chunk_id", cosine_col(F.col("embedding").cast("array<double>"), q).alias("chunk_sim")
    )
    per_path = (
        support.join(chunk_sim, "chunk_id")
        .groupBy("path_id", "path_score")
        .agg(F.max("chunk_sim").alias("max_chunk_sim"))
    )
    scored = per_path.join(path_q_sim, "path_id").select(
        "path_id",
        (0.6 * F.col("path_score") + 0.3 * F.coalesce("path_q_sim", F.lit(0.0))
         + 0.1 * F.col("max_chunk_sim")).alias("final_score"),
    )

    # 4. per supporting chunk, best path's score
    return (
        support.join(scored, "path_id")
        .groupBy("chunk_id")
        .agg(F.round(F.max("final_score"), 6).alias("similarity"))
        .orderBy(F.desc("similarity"), "chunk_id")
    )


def batch_beam_search_paths(
    triples: DataFrame,
    nodes: DataFrame,
    seed_df: DataFrame,
    max_hops: int = 2,
    beam_size: int = 8,
    min_edge_strength: float = 0.0,
    id_col: str = "query_id",
) -> DataFrame:
    """``beam_search_paths(with_support=True)`` for MANY queries'
    seed sets in one hop-level loop (r4 VERDICT item 4): the beam
    state carries ``id_col`` and the per-hop global beam becomes a
    query-partitioned window, so a comparative-heavy batch pays ONE
    edge-join job per hop for ALL queries instead of one beam loop
    per query. Per query identical to the sequential beam
    (pytest-asserted): same expansion join, same score formula
    (0.5*path + 0.3*strength + 0.2*importance, core/graph_db.py:
    1766-1772), same deterministic beam order (path_score desc, tail,
    path string).

    ``seed_df``: (id_col, name). The surviving beam is collected per
    hop — bounded at |queries| x beam_size rows — so the next hop
    joins a literal broadcast frame, exactly like the sequential
    beam's per-hop collect. Returns (id_col, path, path_score,
    support)."""
    spark = triples.sparkSession
    sc = triples.select(
        F.col("subj").alias("src"), F.col("obj").alias("dst"), "strength", "source_chunks"
    )
    edges = sc.unionByName(
        sc.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "strength", "source_chunks"
        )
    ).filter(F.col("strength") >= min_edge_strength).persist()
    imp = nodes.select(F.col("name").alias("dst"), "importance")
    beam_schema = (
        f"{id_col} string, tail string, path array<string>, "
        "path_score double, support array<string>"
    )
    beam_rows = [
        (r[id_col], r["name"], [r["name"]], 1.0, [])
        for r in seed_df.select(id_col, "name").distinct().collect()
    ]
    out_rows = list(beam_rows)
    bw = Window.partitionBy(id_col).orderBy(
        F.desc("path_score"), F.col("tail"), F.concat_ws(">", "path")
    )
    for _hop in range(max_hops):
        if not beam_rows:
            break
        paths = spark.createDataFrame(beam_rows, beam_schema)
        expanded = (
            edges.join(F.broadcast(paths.withColumnRenamed("tail", "src")), "src")
            .join(F.broadcast(imp), "dst", "left")
            .na.fill(0.0, ["importance"])
            .filter(~F.array_contains("path", F.col("dst")))
            .select(
                id_col,
                F.col("dst").alias("tail"),
                F.concat("path", F.array("dst")).alias("path"),
                (0.5 * F.col("path_score") + 0.3 * F.col("strength") + 0.2 * F.col("importance")).alias(
                    "path_score"
                ),
                F.array_distinct(F.concat("support", F.col("source_chunks"))).alias(
                    "support"
                ),
            )
        )
        beam_rows = [
            (r[id_col], r["tail"], list(r["path"]), r["path_score"], list(r["support"]))
            for r in expanded.withColumn("_rk", F.row_number().over(bw))
            .filter(F.col("_rk") <= beam_size)
            .drop("_rk")
            .collect()
        ]
        out_rows.extend(beam_rows)
    edges.unpersist()
    return spark.createDataFrame(out_rows, beam_schema).select(
        id_col, "path", F.round("path_score", 6).alias("path_score"),
        F.sort_array("support").alias("support"),
    )


def batch_multi_hop_retrieval(
    chunks: DataFrame,
    nodes: DataFrame,
    triples: DataFrame,
    qvecs: DataFrame,
    seed_df: DataFrame,
    max_hops: int = 2,
    beam_size: int = 8,
    min_edge_strength: float = 0.0,
    id_col: str = "query_id",
) -> DataFrame:
    """``multi_hop_retrieval`` for a whole query table — per query
    identical output (pytest-asserted), one set of jobs for all
    queries: the beam runs hop-batched (``batch_beam_search_paths``),
    path embeddings are computed once per DISTINCT path (they are
    query-independent — the elementwise mean of entity embeddings),
    and the path-scoring joins (0.6*path + 0.3*cos(q, path_emb) +
    0.1*max cos(q, support chunk), retriever.py:541-550) key every
    frame by (id_col, path) instead of looping.

    ``qvecs``: (id_col, qvec) — the callers' shared query-embedding
    frame (bit-identical to ``embed_texts_np``, so scores match the
    sequential path exactly). ``seed_df``: (id_col, name) seed
    entities per query (callers pass their already-computed seeds,
    like ``multi_hop_retrieval(seeds=...)``). Returns (id_col,
    chunk_id, similarity)."""
    from .similarity import cosine_col

    paths = batch_beam_search_paths(
        triples, nodes, seed_df, max_hops=max_hops, beam_size=beam_size,
        min_edge_strength=min_edge_strength, id_col=id_col,
    ).filter(F.size("support") > 0)
    # paths is a literal frame (the beam collects per hop), so every
    # reuse below re-reads driver-local rows — no persist needed
    paths = paths.withColumn("path_id", F.concat_ws(">", "path"))

    # 3a. path embedding per DISTINCT path (query-independent), then
    # per-query cosine via one broadcast join against qvecs
    dpaths = paths.select("path_id", "path").distinct()
    ent = dpaths.select("path_id", F.explode("path").alias("name")).join(
        nodes.select("name", "embedding"), "name"
    )
    dim_vals = ent.select("path_id", F.posexplode("embedding").alias("pos", "v"))
    path_emb = (
        dim_vals.groupBy("path_id", "pos")
        .agg(F.avg("v").alias("v"))
        .groupBy("path_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
        .select("path_id", F.transform("pv", lambda s: s["v"]).alias("path_emb"))
    )
    path_q_sim = (
        paths.select(id_col, "path_id")
        .join(path_emb, "path_id")
        .join(F.broadcast(qvecs.select(id_col, "qvec")), id_col)
        .select(
            id_col, "path_id",
            cosine_col(F.col("path_emb"), F.col("qvec")).alias("path_q_sim"),
        )
    )

    # 3b. max query-similarity over each path's supporting chunks
    support = paths.select(
        id_col, "path_id", "path_score", F.explode("support").alias("chunk_id")
    )
    per_path = (
        support.join(chunks.select("chunk_id", "embedding"), "chunk_id")
        .join(F.broadcast(qvecs.select(id_col, "qvec")), id_col)
        .select(
            id_col, "path_id", "path_score",
            cosine_col(F.col("embedding").cast("array<double>"), F.col("qvec")).alias(
                "chunk_sim"
            ),
        )
        .groupBy(id_col, "path_id", "path_score")
        .agg(F.max("chunk_sim").alias("max_chunk_sim"))
    )
    scored = per_path.join(path_q_sim, [id_col, "path_id"]).select(
        id_col, "path_id",
        (0.6 * F.col("path_score") + 0.3 * F.coalesce("path_q_sim", F.lit(0.0))
         + 0.1 * F.col("max_chunk_sim")).alias("final_score"),
    )

    # 4. per supporting chunk, best path's score
    return (
        support.join(scored, [id_col, "path_id"])
        .groupBy(id_col, "chunk_id")
        .agg(F.round(F.max("final_score"), 6).alias("similarity"))
    )


def build_entity_adjacency(
    triples: DataFrame, max_connections: int = 20
) -> DataFrame:
    """Materialized per-entity top-k adjacency — the graph-serving
    index (the Spark analog of the reference's Neo4j relationship
    store, which serves `MATCH (e)-[r]-(x) ORDER BY r.strength LIMIT k`
    from an index rather than a scan, core/graph_db.py:343-425).

    One O(E) shuffle at build time produces (src, dst, strength, rk)
    with rk = rank of dst among src's edges by (strength desc, dst
    asc), bounded to ``max_connections`` rows per entity. Query-side
    expansion then joins its broadcast frontier against this bounded
    table instead of windowing the full edge frame per hop — at corpus
    scale that turns every expansion hop from an edge-frame scan into
    an index lookup. Persist with ``materialize.write_table(...,
    bucket_col='src')`` for partition-pruned point lookups.

    Valid for any expansion cap <= ``max_connections`` (the per-src
    rank order does not depend on the query); the build cap is attached
    as ``_graphrag_adj_cap`` so consumers can validate it. An index
    loaded back from disk loses the attribute — re-attach it with
    ``attach_adjacency_cap`` (the cap is part of the index contract,
    store it next to the table like the fulltext ``_meta``)."""
    edges = undirected_edges(triples)
    w = Window.partitionBy("src").orderBy(F.desc("strength"), "dst")
    out = (
        edges.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= max_connections)
    )
    out._graphrag_adj_cap = int(max_connections)  # type: ignore[attr-defined]
    return out


def attach_adjacency_cap(adjacency: DataFrame, max_connections: int) -> DataFrame:
    """Re-attach the build cap to an adjacency index loaded from
    storage (DataFrame attributes do not survive a write/read round
    trip). The cap is what ``expand_with_strength_decay`` validates —
    passing a larger value than the index was built with reintroduces
    the silent-truncation bug the check exists to prevent."""
    adjacency._graphrag_adj_cap = int(max_connections)  # type: ignore[attr-defined]
    return adjacency


def _validate_adjacency_cap(adjacency: DataFrame, max_entity_connections: int) -> None:
    """Raise when an adjacency index was built with a smaller per-entity
    cap than the expansion wants — each hop would be silently truncated
    (r4 ADVICE item; the cap is part of the index contract)."""
    adj_cap = getattr(adjacency, "_graphrag_adj_cap", None)
    if adj_cap is not None and adj_cap < max_entity_connections:
        raise ValueError(
            f"expand_with_strength_decay: adjacency index was built with "
            f"max_connections={adj_cap} < max_entity_connections="
            f"{max_entity_connections}; each hop would be silently "
            "truncated. Rebuild the index with a cap >= the expansion cap."
        )


def expand_with_strength_decay_lazy(
    adjacency: DataFrame,
    seed_frame: DataFrame,
    max_entity_connections: int = 20,
    threshold: float = 0.1,
) -> DataFrame:
    """``expand_with_strength_decay`` (adjacency-served, max_depth=2 —
    the serving defaults) as ONE lazy plan: no per-hop driver collect,
    so a caller that folds the expansion into a larger query (e.g.
    ``hybrid_retrieval``'s entity side) pays ZERO extra Spark jobs for
    it — the whole 2-hop expansion executes inside the consumer's
    single action. Bit-identical to the driver loop (pytest-asserted
    via the adjacency-equality test; the loop itself is trace-tested
    against a pure-Python oracle).

    The loop's data-dependent control flow maps to plan constructs:
    - per-depth frontier cap -> row_number window over the (bounded,
      <= cap x cap rows) candidate set;
    - visited-set "only NEW entities form the next frontier" ->
      left_anti join against the prior level's names;
    - the early-stop rule (stop after depth 1 when the expanded set
      exceeds 3x the cap) -> a scalar count broadcast-cross-joined as
      a filter gate on the hop-2 contributions;
    - "score = max(existing, strength * decay^d)" -> union all
      per-level contributions and take max per name (exact: decay
      scaling is monotone, so max commutes with it).

    ``seed_frame`` is a (name string) frame — may itself be a lazy
    subtree (e.g. the seed-entity top-k off a retrieval scan). All
    intermediate frames are vocabulary-bounded: every hop joins the
    bounded adjacency index against a <= cap-row frontier."""
    _validate_adjacency_cap(adjacency, max_entity_connections)
    cap = max_entity_connections
    seeds_d = seed_frame.select("name").distinct()
    # depth-0 frontier: top cap seeds by (score desc, name) — all seeds
    # score 1.0, so alphabetical; single-partition window is fine (the
    # frame is seed-scale by contract)
    w_seed = Window.orderBy("name")
    front1 = (
        seeds_d.withColumn("_rk", F.row_number().over(w_seed))
        .filter(F.col("_rk") <= cap)
        .select(F.col("name").alias("src"))
    )
    hop = lambda front: (  # noqa: E731 — shared hop shape, bounded output
        adjacency.join(F.broadcast(front), "src")
        .filter((F.col("rk") <= cap) & (F.col("strength") >= threshold))
        .groupBy(F.col("dst").alias("name"))
        .agg(F.max("strength").alias("s"))
    )
    # ALL depth-1 candidates contribute a score (existing names via the
    # final max-merge); only names NOT already scored form frontier 2
    c1 = hop(front1).select("name", (F.col("s") * F.lit(0.7)).alias("score"))
    new1 = c1.join(seeds_d, "name", "left_anti")
    # early-stop gate: |scores after depth 1| = |seeds| + |new1|
    # (disjoint by construction); depth 2 runs iff it is <= 3*cap
    gate = (
        seeds_d.select("name")
        .unionAll(new1.select("name"))
        .agg(F.count("*").alias("n_after1"))
    )
    w_front = Window.orderBy(F.desc("score"), "name")
    front2 = (
        new1.withColumn("_rk", F.row_number().over(w_front))
        .filter(F.col("_rk") <= cap)
        .select(F.col("name").alias("src"))
    )
    c2 = (
        hop(front2)
        .select("name", (F.col("s") * F.lit(0.7**2)).alias("score"))
        .crossJoin(F.broadcast(gate))
        .filter(F.col("n_after1") <= F.lit(3 * cap))
        .select("name", "score")
    )
    scores = (
        seeds_d.select("name", F.lit(1.0).alias("score"))
        .unionAll(c1)
        .unionAll(c2)
        .groupBy("name")
        .agg(F.max("score").alias("score"))
    )
    return (
        scores.select("name", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), "name")
        .limit(2 * cap)
    )


def expand_with_strength_decay(
    triples: DataFrame,
    seeds: list[str],
    max_depth: int = 2,
    max_entity_connections: int = 20,
    threshold: float = 0.1,
    adjacency: DataFrame | None = None,
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

    Execution shape (query-serving latency): the per-depth neighbor
    top-k window runs DISTRIBUTED (an entity with 10^6 edges never
    lands on the driver — the window bounds the result to
    frontier x max_entity_connections rows before it leaves the
    cluster); the score bookkeeping between depths is driver-side over
    that bounded set, so the whole expansion is ONE bounded-collect
    job per depth instead of a checkpoint + count + union chain —
    per-iteration barriers no executor count amortizes (same rationale
    as the canonicalize.py driver fast path). Final rounding/ordering
    stays in Spark expressions so results are bit-identical to the
    former all-DataFrame loop (oracle-checked).

    Pass ``adjacency`` (a ``build_entity_adjacency`` table with
    max_connections >= max_entity_connections) to serve each hop from
    the materialized index — an index lookup per hop instead of an
    edge-frame window; results are identical (pytest-asserted). The
    constraint is VALIDATED, not just documented: an index built with
    a smaller cap would silently truncate each hop's candidate set, so
    a known-too-small ``_graphrag_adj_cap`` raises (disk-loaded
    indexes: re-attach the cap with ``attach_adjacency_cap``).
    """
    spark = triples.sparkSession
    if adjacency is not None:
        _validate_adjacency_cap(adjacency, max_entity_connections)
    # Driver fast path (r6): with the cached LIMIT-guarded adjacency
    # (shared with beam_search_paths) the whole expansion is pure
    # Python and the result a literal frame — zero jobs per call. The
    # per-hop neighbor selection reproduces the window exactly (rank
    # over (strength desc, dst asc) BEFORE the threshold filter); the
    # score bookkeeping below is the same code either way, and the
    # final round/order/limit stay Spark expressions — bit-identical
    # (kg_decay_expansion oracle + fast==distributed pytest).
    adjd = _driver_graph_adjacency(triples)
    if adjd is not None:
        scores = {s: 1.0 for s in dict.fromkeys(seeds)}
        frontier = dict(scores)
        for d in range(max_depth):
            top_frontier = sorted(frontier.items(), key=lambda kv: (-kv[1], kv[0]))
            decay = 0.7 ** (d + 1)
            cand: dict[str, float] = {}
            for src, _ in top_frontier[:max_entity_connections]:
                ranked = sorted(adjd.get(src, ()), key=lambda e: (-e[1], e[0]))
                for dst, s, _sc in ranked[:max_entity_connections]:
                    if s >= threshold and s > cand.get(dst, float("-inf")):
                        cand[dst] = s
            new: dict[str, float] = {}
            for name, s in cand.items():
                cs = s * decay
                if name in scores:
                    scores[name] = max(scores[name], cs)
                else:
                    new[name] = cs
            scores.update(new)
            frontier = new
            if len(scores) > 3 * max_entity_connections:
                break
        out = spark.createDataFrame(sorted(scores.items()), "name string, score double")
        return (
            out.select("name", F.round("score", 6).alias("score"))
            .orderBy(F.desc("score"), "name")
            .limit(2 * max_entity_connections)
        )
    if adjacency is not None:
        if max_depth == 2:
            # the serving configuration: one lazy plan, zero per-hop
            # driver collects — a consuming action executes the whole
            # expansion as part of its own job
            seed_frame = spark.createDataFrame(
                [(s,) for s in dict.fromkeys(seeds)], "name string"
            )
            return expand_with_strength_decay_lazy(
                adjacency, seed_frame, max_entity_connections, threshold
            )
        edges = None
        adj = adjacency
    else:
        # cached for the loop only: each depth re-reads the edge frame,
        # and the function's result is literal — unpersisted at return
        edges = undirected_edges(triples).persist()
        adj = None
    # the reference holds seeds in a dict/set — duplicates collapse
    scores: dict[str, float] = {s: 1.0 for s in dict.fromkeys(seeds)}
    frontier = dict(scores)
    for d in range(max_depth):
        top_frontier = sorted(frontier.items(), key=lambda kv: (-kv[1], kv[0]))
        f = spark.createDataFrame(
            [(n,) for n, _ in top_frontier[:max_entity_connections]], "src string"
        )
        if adj is not None:
            rels = (
                adj.join(F.broadcast(f), "src")
                .filter((F.col("rk") <= max_entity_connections) & (F.col("strength") >= threshold))
                .select("dst", "strength")
                .collect()
            )
        else:
            w = Window.partitionBy("src").orderBy(F.desc("strength"), "dst")
            rels = (
                edges.join(F.broadcast(f), "src")
                .withColumn("_rk", F.row_number().over(w))
                .filter((F.col("_rk") <= max_entity_connections) & (F.col("strength") >= threshold))
                .select("dst", "strength")
                .collect()
            )
        decay = 0.7 ** (d + 1)
        cand: dict[str, float] = {}
        for r in rels:
            s = r["strength"]
            if s > cand.get(r["dst"], float("-inf")):
                cand[r["dst"]] = s
        new: dict[str, float] = {}
        for name, s in cand.items():
            cs = s * decay
            if name in scores:
                scores[name] = max(scores[name], cs)
            else:
                new[name] = cs
        scores.update(new)
        frontier = new
        if len(scores) > 3 * max_entity_connections:
            break
    if edges is not None:
        edges.unpersist()
    out = spark.createDataFrame(
        sorted(scores.items()), "name string, score double"
    )
    return (
        out.select("name", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), "name")
        .limit(2 * max_entity_connections)
    )


def hybrid_merge(
    chunk_results: DataFrame,
    entity_results: DataFrame,
    entity_fallback: float = 0.3,
    keys: list[str] | None = None,
) -> DataFrame:
    """J6 — hybrid retrieval merge (rag/retriever.py:725-762): full
    outer merge keyed by chunk_id; chunks found by both paths get
    ``min(1, (chunk_score + entity_score) * 0.8)`` and source
    'hybrid'; single-path chunks keep their own score (entity side
    falls back to ``entity_fallback`` when its score is null).

    Documented divergences from retriever.py:725-762 (deliberate):
    the reference never assigns ``hybrid_score`` to chunk_based-only
    entries, so they sort with an implicit 0.0 in its final ranking —
    here they keep their ``chunk_score`` (a chunk found only by the
    vector path still ranks by its vector similarity, which is the
    behavior a retrieval consumer wants). Likewise the reference's
    "allow up to 2x path_count when path results score high" widening
    (retriever.py:769-776) is not reproduced in ``hybrid_retrieval``;
    the slot budget from py_retrieval_split is applied as-is.

    Inputs: (chunk_id, similarity) frames from the vector path and the
    entity-expansion path. Returns (chunk_id, source, hybrid_score).
    ``keys`` generalizes the merge key — batch retrieval merges per
    (query_id, chunk_id) with identical per-key semantics.
    """
    keys = keys or ["chunk_id"]
    c = chunk_results.select(*keys, F.col("similarity").alias("chunk_score"))
    e = entity_results.select(*keys, F.col("similarity").alias("entity_score"))
    merged = c.join(e, keys, "full_outer")
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
        *keys,
        source.alias("source"),
        F.round(score, 6).alias("hybrid_score"),
    ).orderBy(F.desc("hybrid_score"), *keys)


def hybrid_merge_3way(
    chunk_results: DataFrame,
    entity_results: DataFrame,
    path_results: DataFrame,
    entity_fallback: float = 0.3,
    path_fallback: float = 0.3,
    keys: list[str] | None = None,
) -> DataFrame:
    """J6 full 3-phase combine (rag/retriever.py:725-792): chunk +
    entity sides merge with the ``min(1,(a+b)*0.8)`` boost; path
    results then merge into whatever is present with
    ``min(1,(current+path)*0.7)`` (source 'hybrid_with_paths'); single-
    path chunks keep their own score."""
    keys = keys or ["chunk_id"]
    two = hybrid_merge(chunk_results, entity_results, entity_fallback, keys=keys)
    p = path_results.select(*keys, F.col("similarity").alias("path_score"))
    merged = two.join(p, keys, "full_outer")
    has_prev = F.col("hybrid_score").isNotNull()
    has_path = F.col("path_score").isNotNull()
    score = (
        F.when(has_prev & has_path,
               F.least(F.lit(1.0), (F.col("hybrid_score") + F.col("path_score")) * 0.7))
        .when(has_prev, F.col("hybrid_score"))
        .otherwise(F.coalesce("path_score", F.lit(path_fallback)))
    )
    source = (
        F.when(has_prev & has_path, F.lit("hybrid_with_paths"))
        .when(has_prev, F.col("source"))
        .otherwise(F.lit("path_based"))
    )
    return merged.select(
        *keys, source.alias("source"), F.round(score, 6).alias("hybrid_score")
    ).orderBy(F.desc("hybrid_score"), *keys)


def hybrid_retrieval(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    query_text: str,
    top_k: int = 10,
    expansion_threshold: float = 0.1,
    adjacency: DataFrame | None = None,
    chunk_index=None,
) -> DataFrame:
    """The reference's full hybrid retrieval (rag/retriever.py:600-800)
    end to end, LLM-free: analyze the query (type / multi-hop
    recommendation -> per-side slot budget), run the three retrieval
    modes over the stored tables, and combine with the boost formulas.

    - chunk side: vector top-k with the deterministic text encoder;
    - entity side: strength-decay expansion (G6) from the vector-seeded
      top entities, chunks scored by their best contained entity;
    - path side: multi-hop reasoning retrieval (beam paths with
      supporting-chunk provenance) when recommended.

    Pass ``chunk_index`` (a ``similarity.IvfIndex`` over the chunk
    embeddings, id_col='chunk_id') to serve the chunk-side top-k from
    the ANN index instead of a brute-force corpus scan — the serving
    analog of the ``adjacency=`` seam (reference: Neo4j's vector index,
    core/graph_db.py:497-514). At ``n_probe = n_centroids`` results are
    identical to the scan (pytest-asserted); the default partial probe
    trades recall for a 1/n_centroids-per-probe scan cost — at 100 TB
    the difference between reading the corpus per query and reading a
    few cells.

    Returns (chunk_id, source, hybrid_score) limited to ``top_k``.
    """
    from .embeddings import embed_texts_np
    from .query_analysis import py_analyze_query, py_retrieval_split
    from .similarity import cosine_topk_query

    qvec = [float(x) for x in embed_texts_np([query_text])[0]]
    analysis = py_analyze_query(query_text)
    split = py_retrieval_split(
        analysis["query_type"], analysis["multi_hop_recommended"], top_k
    )

    # ONE corpus-scored scan serves both consumers (r3 VERDICT item 6):
    # the chunk side needs the top split["chunk_count"], the entity
    # seeding needs the top 10 — take max(k) once and driver-materialize
    # the <=12 rows, so the seed broadcast below never re-executes the
    # scan subtree (at 100 TB a second full cosine pass per query is
    # the difference between one and two corpus reads)
    kmax = max(split["chunk_count"], 10)
    if chunk_index is not None:
        _check_chunk_index(chunk_index)
        top_q = chunk_index.topk(qvec, k=kmax)
    else:
        top_q = cosine_topk_query(chunks, qvec, k=kmax, id_col="chunk_id")
    scored_top = chunks.sparkSession.createDataFrame(top_q.collect(), top_q.schema)
    chunk_side = scored_top.orderBy(F.desc("similarity"), "chunk_id").limit(
        split["chunk_count"]
    )
    top_chunks = (
        scored_top.orderBy(F.desc("similarity"), "chunk_id").limit(10).select("chunk_id")
    )
    seed_frame = (
        mentions.join(F.broadcast(top_chunks), "chunk_id")
        .join(nodes.select("entity_id", "name", "importance"), "entity_id")
        .groupBy("name")
        .agg(F.max("importance").alias("importance"))
        .orderBy(F.desc("importance"), "name")
        .limit(5)
        .select("name")
    )
    # seeds are collected when a driver loop needs the literal list
    # (the beam path side, edge-frame expansion without an adjacency
    # index) — and, r6, whenever the cached driver adjacency can serve
    # the expansion: one bounded seed-collect job plus a LITERAL
    # expansion frame beats folding the whole lazy expansion subtree
    # (its windows/anti-joins add ~5 stages of pure scheduling overhead
    # per request at serving scale; measured ~1.6s vs ~2.5s per factual
    # request). Past the driver cap the seed subtree stays LAZY and the
    # request remains ONE action after the retrieval scan.
    seeds: list[str] | None = None
    if (
        split["path_count"] > 0
        or adjacency is None
        or _driver_graph_adjacency(triples) is not None
    ):
        seeds = [r["name"] for r in seed_frame.collect()]
        seed_frame = chunks.sparkSession.createDataFrame(
            [(s,) for s in seeds], "name string"
        )
    if adjacency is not None:
        if seeds is not None:
            # seeds already on the driver (path route): the expansion
            # driver fast path can serve a literal frame — fewer plan
            # stages in the final action (falls back to the lazy plan
            # internally past the cap)
            exp = expand_with_strength_decay(triples, seeds, adjacency=adjacency)
        else:
            exp = expand_with_strength_decay_lazy(adjacency, seed_frame)
    else:
        exp = expand_with_strength_decay(triples, seeds) if seeds else None
    if exp is not None:
        entity_side = (
            mentions.join(nodes.select("entity_id", "name"), "entity_id")
            .join(exp, "name")
            .groupBy("chunk_id")
            .agg(F.max("score").alias("similarity"))
            .filter(F.col("similarity") >= expansion_threshold)
            .orderBy(F.desc("similarity"), "chunk_id")
            .limit(split["entity_count"])
        )
    else:
        entity_side = chunks.sparkSession.createDataFrame(
            [], "chunk_id string, similarity double"
        )

    if split["path_count"] > 0:
        path_side = multi_hop_retrieval(
            chunks, nodes, mentions, triples, qvec,
            top_chunks=top_chunks, seeds=seeds,
        ).limit(split["path_count"])
    else:
        path_side = chunks.sparkSession.createDataFrame(
            [], "chunk_id string, similarity double"
        )

    return hybrid_merge_3way(chunk_side, entity_side, path_side).limit(top_k)


def fulltext_search(chunks: DataFrame, query: str, top_k: int = 10) -> DataFrame:
    """T7 (core/graph_db.py:1084-1110): term-frequency ranked chunk
    search. Each query term is counted with regexp_count (word
    boundaries); score = sum of term frequencies, length-normalized.

    TEST-SCALE PATH: this is a full corpus scan PER QUERY — fine as a
    one-off batch filter, a scale-killer as a query serving path (at
    100 TB every search re-reads every chunk). The scale-safe shape is
    the materialized inverted index below (``build_fulltext_postings``
    once per corpus + ``fulltext_search_indexed`` per query, touching
    only the queried terms' posting lists) — the Spark analog of the
    reference's Neo4j fulltext INDEX (core/graph_db.py:1084-1110 runs
    against ``chunk_fulltext``, an index, not a scan)."""
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


def build_fulltext_postings(chunks: DataFrame, text_col: str = "content") -> DataFrame:
    """T7 at scale — materialize the inverted index ONCE per corpus:
    (term, chunk_id, doc_id, chunk_len, tf). Tokenization is the native
    lower+split on non-word chars ([^a-z0-9_]+ — the complement of the
    regex ``\\w`` class ``fulltext_search`` bounds terms with, so for
    word-shaped terms both paths count identical occurrences); tf
    aggregates with map-side partial combine.

    Storage guidance (the part that makes queries index-shaped): write
    ``.repartition("term").sortWithinPartitions("term").write.
    partitionBy(<term-prefix bucket>)`` or bucketBy(term) on a real
    catalog — each query then reads only its terms' posting lists
    instead of the corpus. Index size is O(total tokens), built with
    one shuffle."""
    toks = chunks.select(
        "chunk_id",
        "doc_id",
        F.length(text_col).alias("chunk_len"),
        F.explode(F.split(F.lower(F.col(text_col)), r"[^a-z0-9_]+")).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", "chunk_id", "doc_id", "chunk_len").agg(
        F.count("*").alias("tf")
    )


N_TERM_BUCKETS = 64  # term-hash partition fan-out of the stored index


def write_fulltext_index(postings: DataFrame, path: str, n_buckets: int = N_TERM_BUCKETS) -> None:
    """Persist the inverted index partitioned by a term-hash bucket
    (``tbucket=<b>/`` dirs): a query computes its terms' buckets on the
    driver and the parquet reader prunes every other partition from the
    file listing, so per-query scan cost is
    O(corpus_postings * |query terms| / n_buckets) instead of O(corpus).
    Same layout trick as the IVF index (similarity.ivf_build_index)."""
    out = postings.withColumn(
        "tbucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )
    # repartition by bucket: one writer task per partition dir, posting
    # lists for a term colocated in one file
    out.repartition("tbucket").sortWithinPartitions("term").write.mode(
        "overwrite"
    ).partitionBy("tbucket").parquet(path)
    # persist the bucket count WITH the index (underscore-prefixed dirs
    # are invisible to the parquet reader, like _SUCCESS) so readers
    # can never prune with a mismatched modulus
    postings.sparkSession.createDataFrame(
        [(int(n_buckets),)], "n_buckets int"
    ).coalesce(1).write.mode("overwrite").json(path + "/_meta")
    _FULLTEXT_META_CACHE[path] = int(n_buckets)  # rebuilt in-process: refresh


# modulus cache for persisted fulltext indexes: the bucket count is
# immutable for an index's lifetime (incremental_fulltext_index raises
# on any restart that tries to change it), so one _meta read per path
# per process suffices — without this every query paid a spark.read.
# json(...).first() job before touching the index
_FULLTEXT_META_CACHE: dict[str, int] = {}


def fulltext_search_index_path(spark, path: str, query: str, top_k: int = 10) -> DataFrame:
    """Index-backed T7 over a PERSISTED index: scans only the queried
    terms' ``tbucket`` partitions (verify with .explain — the scan's
    partition filters carry ``tbucket IN (...)``), then the same
    broadcast-terms join + rollup as ``fulltext_search_indexed``. The
    pruning modulus comes from the index's own ``_meta``, never a
    caller guess (read once per path per process — the modulus is
    immutable for the index's lifetime)."""
    n_buckets = _FULLTEXT_META_CACHE.get(path)
    if n_buckets is None:
        n_buckets = int(spark.read.json(path + "/_meta").first()["n_buckets"])
        _FULLTEXT_META_CACHE[path] = n_buckets
    terms = sorted({t.lower() for t in query.split() if t.strip()})
    # bucket assignment must match the writer's xxhash64 exactly — a
    # tiny driver-side Spark job over the handful of query terms
    spark_buckets = [
        r["b"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("b"))
        .distinct()
        .collect()
    ]
    pruned = spark.read.parquet(path).filter(F.col("tbucket").isin(spark_buckets))
    # batch_id appears as an extra partition column when the index is
    # maintained incrementally (streaming.incremental_fulltext_index's
    # batch_id=N/tbucket=B layout); drop() ignores it when absent
    return fulltext_search_indexed(
        pruned.drop("tbucket", "batch_id"), query, top_k=top_k
    )


def fulltext_search_indexed(postings: DataFrame, query: str, top_k: int = 10) -> DataFrame:
    """Index-backed T7: same scoring as ``fulltext_search`` (sum of
    per-term frequencies — query-term multiplicity included — divided
    by chunk length, x1000, rounded), but the only data touched is the
    queried terms' posting lists (broadcast semi-join on a handful of
    terms -> partition-/file-pruned scan when the postings table is
    laid out by term). Terms must be word-shaped (``\\w``) — the
    tokenizer cannot represent terms containing separators; the scan
    path handles arbitrary strings at test scale."""
    from collections import Counter

    spark = postings.sparkSession
    terms = Counter(t.lower() for t in query.split() if t.strip())
    tdf = spark.createDataFrame(
        [(t, float(m)) for t, m in sorted(terms.items())], "term string, mult double"
    )
    return (
        postings.join(F.broadcast(tdf), "term")
        .groupBy("chunk_id", "doc_id", "chunk_len")
        .agg(F.sum(F.col("tf") * F.col("mult")).alias("hits"))
        .select(
            "chunk_id",
            "doc_id",
            F.round(
                F.col("hits") / F.greatest(F.col("chunk_len"), F.lit(1)) * 1000, 6
            ).alias("score"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "chunk_id")
        .limit(top_k)
    )


def entity_fulltext_search(nodes: DataFrame, query: str, top_k: int = 5) -> DataFrame:
    """entity_similarity_search analog (core/graph_db.py:1084-1110):
    ranked entity lookup for a query over (name, description). The
    reference scores with a Lucene fulltext index (BM25, engine-
    specific); the deterministic analog here is the repo's T7 scoring —
    summed word-boundary term frequency over ``name || ' ' ||
    description``, length-normalized x1000 — a documented divergence on
    the score function, same contract (query -> ranked entities).
    Serving shape at scale: build_fulltext_postings over the same
    concatenated text, exactly like chunk fulltext."""
    terms = [t.lower() for t in query.split() if t.strip()]
    text = F.concat_ws(" ", "name", "description")
    score = F.lit(0.0)
    for t in terms:
        pat = r"(?i)\b" + "".join("\\" + c if not c.isalnum() else c for c in t) + r"\b"
        score = score + F.regexp_count(text, F.lit(pat))
    return (
        nodes.select(
            "entity_id", "name", "entity_type", "importance",
            F.round(score / F.greatest(F.length(text), F.lit(1)) * 1000, 6).alias("score"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "name")
        .limit(top_k)
    )


def entity_based_retrieval(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    query_text: str,
    top_k: int = 5,
    min_similarity: float = 0.1,
) -> DataFrame:
    """ENTITY_ONLY retrieval (rag/retriever.py:150-255): fulltext-match
    entities for the query, take the chunks containing them, score each
    candidate chunk by cosine(query vector, stored chunk vector), drop
    those under ``min_retrieval_similarity`` (settings.py:95-97 default
    0.1), return the top-k by similarity.

    The entity match is a broadcast semijoin (a handful of entity ids)
    into the mentions table, so the only corpus-sized work is scoring
    the candidate chunks — no full-corpus cosine pass."""
    from .embeddings import embed_texts_np
    from .similarity import cosine_col

    qvec = [float(x) for x in embed_texts_np([query_text])[0]]
    ents = entity_fulltext_search(nodes, query_text, top_k).select("entity_id")
    cand = (
        mentions.join(F.broadcast(ents), "entity_id")
        .select("chunk_id")
        .distinct()
    )
    q = F.array(*[F.lit(x) for x in qvec])
    return (
        chunks.join(cand, "chunk_id")
        .select(
            "chunk_id",
            F.round(
                cosine_col(F.col("embedding").cast("array<double>"), q), 6
            ).alias("similarity"),
        )
        .filter(F.col("similarity") >= min_similarity)
        .orderBy(F.desc("similarity"), "chunk_id")
        .limit(top_k)
    )


_MODE_MAP = {
    "simple": "chunk_only",
    "chunk_only": "chunk_only",
    "entity_only": "entity_only",
    "hybrid": "hybrid",
    "graph_enhanced": "hybrid",  # legacy alias (retrieval.py:99)
    "auto": "hybrid",  # entity extraction is always on in this engine
}


def _check_chunk_index(chunk_index) -> None:
    """The serving seams join index hits back to mentions/chunks by
    chunk_id — an index keyed on anything else would silently return
    zero joins downstream, so reject it loudly."""
    if chunk_index.id_col != "chunk_id":
        raise ValueError(
            "chunk_index must be an IvfIndex over the chunk embeddings "
            f"(id_col='chunk_id'); got id_col={chunk_index.id_col!r}"
        )


def batch_probe_pairs(chunk_index, qvecs: DataFrame, id_col: str = "query_id", n_probe: int | None = None) -> DataFrame:
    """(query_id, cluster) — the centroid cells each query probes:
    rank cells per query with a query-scale cross join against the
    broadcast n_centroids-row centroid frame (no driver round trip),
    window to the top ``n_probe`` per query. Deterministic ties broken
    by cluster id. ``qvecs`` must carry (id_col, qvec)."""
    from .similarity import dot_col

    spark = qvecs.sparkSession
    npb = int(n_probe or chunk_index.n_probe)
    cents = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(chunk_index.centroids)],
        "cluster int, cvec array<double>",
    )
    pw = Window.partitionBy(id_col).orderBy(F.desc("_cscore"), "cluster")
    return (
        qvecs.select(id_col, "qvec")
        .crossJoin(F.broadcast(cents))
        .select(id_col, "cluster", dot_col(F.col("qvec"), F.col("cvec")).alias("_cscore"))
        .withColumn("_pk", F.row_number().over(pw))
        .filter(F.col("_pk") <= npb)
        .select(id_col, "cluster")
    )


def _indexed_query_scores(chunk_index, qvecs: DataFrame, id_col: str, n_probe: int | None = None) -> DataFrame:
    """(query_id, chunk_id, score) for a WHOLE query table through the
    IVF index: compute each query's probe cells (``batch_probe_pairs``)
    and score exact cosine ONLY over (probed cell) x (probing query)
    pairs via a broadcast join on ``cluster``. At full probe every
    (chunk, query) pair is scored exactly once — identical to the
    brute-force cross join (pytest-asserted); at partial probe each
    query touches n_probe/n_centroids of the corpus instead of all of
    it.

    ``qvecs`` must carry (id_col, qvec); returns one row per scored
    pair, un-topped (callers apply their own per-query k window)."""
    from .similarity import cosine_col

    pairs = batch_probe_pairs(chunk_index, qvecs, id_col, n_probe)
    vec = F.col(chunk_index.vec_col).cast("array<double>")
    return (
        chunk_index.cells.join(F.broadcast(pairs), "cluster")
        .join(F.broadcast(qvecs.select(id_col, "qvec")), id_col)
        .select(
            id_col,
            F.col(chunk_index.id_col).alias("chunk_id"),
            F.round(cosine_col(vec, F.col("qvec")), 6).alias("score"),
        )
    )


def adjusted_top_k(top_k: int, analysis: dict) -> int:
    """The dispatcher's complexity-based widening (rag/nodes/
    retrieval.py:58-66): complex or multi-source queries get +3 capped
    at 10; comparative queries +5 capped at 12; the first matching rule
    wins (the reference's elif chain)."""
    if analysis.get("complexity") == "complex" or analysis.get(
        "requires_multiple_sources"
    ):
        return min(top_k + 3, 10)
    if analysis.get("query_type") == "comparative":
        return min(top_k + 5, 12)
    return top_k


def retrieve(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    query_text: str,
    mode: str = "hybrid",
    top_k: int = 5,
    adjacency: DataFrame | None = None,
    chunk_index=None,
) -> DataFrame:
    """The retrieval dispatcher (rag/retriever.py:825-874 +
    rag/nodes/retrieval.py:18-135): analyze the query, widen top_k by
    complexity, map the requested mode (simple/chunk_only ->
    chunk-only; entity_only; hybrid/graph_enhanced/auto -> hybrid),
    and run the corresponding strategy over the stored tables. Unknown
    modes return an empty frame like the reference's error path.

    ``chunk_index`` (similarity.IvfIndex over the chunk embeddings)
    routes the vector top-k through the ANN index instead of a corpus
    scan — see ``hybrid_retrieval``.

    Returns (chunk_id, source, score) — chunk-only rows carry source
    'chunk_based', entity-only 'entity_based', hybrid rows their merge
    source."""
    from .embeddings import embed_texts_np
    from .query_analysis import py_analyze_query
    from .similarity import cosine_topk_query

    analysis = py_analyze_query(query_text)
    k = adjusted_top_k(top_k, analysis)
    resolved = _MODE_MAP.get(mode)
    if resolved is None:
        return chunks.sparkSession.createDataFrame(
            [], "chunk_id string, source string, score double"
        )
    if resolved == "chunk_only":
        qvec = [float(x) for x in embed_texts_np([query_text])[0]]
        if chunk_index is not None:
            _check_chunk_index(chunk_index)
            top = chunk_index.topk(qvec, k=k)
        else:
            top = cosine_topk_query(chunks, qvec, k=k, id_col="chunk_id")
        return top.select(
            "chunk_id", F.lit("chunk_based").alias("source"),
            F.col("similarity").alias("score"),
        )
    if resolved == "entity_only":
        return entity_based_retrieval(
            chunks, nodes, mentions, query_text, top_k=k
        ).select(
            "chunk_id", F.lit("entity_based").alias("source"),
            F.col("similarity").alias("score"),
        )
    return hybrid_retrieval(
        chunks, nodes, mentions, triples, query_text, top_k=k,
        adjacency=adjacency, chunk_index=chunk_index,
    ).select("chunk_id", "source", F.col("hybrid_score").alias("score"))


def batch_retrieve_chunks(
    chunks: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    id_col: str = "query_id",
    query_col: str = "query",
    chunk_index=None,
    n_probe: int | None = None,
) -> DataFrame:
    """Set-oriented multi-query retrieval (r3 VERDICT item 7): the
    chunk-only dispatcher route for a WHOLE query table in one job —
    the serving shape for a 10k-query evaluation batch, where the
    per-query ``retrieve`` loop would be driver-bound (one analyze +
    embed + scan round-trip per query).

    Per query, output rows equal ``retrieve(mode='chunk_only')``
    exactly (pytest-asserted): analysis runs as native columns
    (query_analysis.analyze_queries), complexity widening as the same
    first-match-wins rule as ``adjusted_top_k``, query embedding in one
    Arrow pass, and scoring as ONE broadcast cross join — each chunk
    partition scores every query vector in place, so the corpus is
    read once for the whole batch instead of once per query; per-query
    top-k is a window over (query_id, -similarity, chunk_id).

    ``chunk_index`` (similarity.IvfIndex over the chunk embeddings)
    replaces the full cross join with the probe-pruned scoring of
    ``_indexed_query_scores``: each query scores only its ``n_probe``
    nearest cells — the batch still reads each probed cell once for
    all its probing queries, but skips the rest of the corpus
    entirely. Identical output at full probe (pytest-asserted).

    Returns (query_id, chunk_id, source, score)."""
    from .embeddings import EMBED_DIM, _embed_df
    from .query_analysis import analyze_queries
    from .similarity import cosine_col

    meta = analyze_queries(queries, query_col)
    k_col = (
        F.when(
            (F.col("complexity") == "complex") | F.col("requires_multiple_sources"),
            F.least(F.lit(top_k + 3), F.lit(10)),
        )
        .when(F.col("query_type") == "comparative", F.least(F.lit(top_k + 5), F.lit(12)))
        .otherwise(F.lit(top_k))
    )
    qk = meta.select(id_col, k_col.alias("k"))
    qvecs = _embed_df(queries, id_col, query_col, EMBED_DIM).withColumnRenamed(
        "embedding", "qvec"
    )
    if chunk_index is not None:
        _check_chunk_index(chunk_index)
        scored = _indexed_query_scores(chunk_index, qvecs, id_col, n_probe).join(
            F.broadcast(qk), id_col
        )
    else:
        qside = F.broadcast(qvecs.join(qk, id_col))
        scored = chunks.crossJoin(qside).select(
            id_col,
            "chunk_id",
            "k",
            F.round(
                cosine_col(F.col("embedding").cast("array<double>"), F.col("qvec")), 6
            ).alias("score"),
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "chunk_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("k"))
        .select(id_col, "chunk_id", F.lit("chunk_based").alias("source"), "score")
    )


def batch_retrieve_entities(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    min_similarity: float = 0.1,
    id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Set-oriented ENTITY_ONLY retrieval for a whole query table —
    the batch twin of ``retrieve(mode='entity_only')``, per-query
    identical output (pytest-asserted).

    Shape: ONE entity-scoring pass (entities x query terms — the same
    total regexp work as the per-query loop, but one job instead of
    one driver round-trip per query), per-query entity top-k window,
    one mentions semijoin for all queries' candidate chunks, one
    cosine pass over the (query, candidate-chunk) pairs. The query
    table is collected to build term patterns (queries are
    driver-scale by definition — they arrive from a client), and the
    per-query widened k is computed with the same first-match-wins
    rule as ``adjusted_top_k``.

    Returns (query_id, chunk_id, source, score)."""
    from .embeddings import EMBED_DIM, _embed_df
    from .query_analysis import analyze_queries
    from .similarity import cosine_col

    spark = queries.sparkSession
    meta = analyze_queries(queries, query_col)
    k_col = (
        F.when(
            (F.col("complexity") == "complex") | F.col("requires_multiple_sources"),
            F.least(F.lit(top_k + 3), F.lit(10)),
        )
        .when(F.col("query_type") == "comparative", F.least(F.lit(top_k + 5), F.lit(12)))
        .otherwise(F.lit(top_k))
    )
    qk = meta.select(id_col, k_col.alias("k"))

    # term patterns built driver-side: the word-boundary escaping is
    # Python-charclass semantics, identical to entity_fulltext_search
    qrows = queries.select(id_col, query_col).collect()
    term_rows = []
    for r in qrows:
        for t in (r[query_col] or "").split():
            t = t.lower()
            if not t.strip():
                continue
            pat = r"(?i)\b" + "".join("\\" + c if not c.isalnum() else c for c in t) + r"\b"
            term_rows.append((r[id_col], pat))
    if not term_rows:
        return spark.createDataFrame(
            [], f"{id_col} string, chunk_id string, source string, score double"
        )
    qterms = spark.createDataFrame(term_rows, f"{id_col} string, pat string")

    text = F.concat_ws(" ", "name", "description")
    ent_scored = (
        nodes.select("entity_id", "name", text.alias("_t"))
        .crossJoin(F.broadcast(qterms))
        .select(
            id_col, "entity_id", "name", "_t",
            F.regexp_count("_t", F.col("pat")).alias("cnt"),
        )
        .groupBy(id_col, "entity_id", "name")
        .agg(F.sum("cnt").alias("cnt"), F.first(F.length("_t")).alias("tlen"))
        .select(
            id_col, "entity_id", "name",
            F.round(F.col("cnt") / F.greatest("tlen", F.lit(1)) * 1000, 6).alias("escore"),
        )
        .filter(F.col("escore") > 0)
    )
    ew = Window.partitionBy(id_col).orderBy(F.desc("escore"), "name")
    ents = (
        ent_scored.withColumn("_rk", F.row_number().over(ew))
        .join(F.broadcast(qk), id_col)
        .filter(F.col("_rk") <= F.col("k"))
        .select(id_col, "entity_id", "k")
    )
    cand = (
        mentions.join(F.broadcast(ents), "entity_id")
        .select(id_col, "chunk_id", "k")
        .distinct()
    )
    qvecs = _embed_df(queries, id_col, query_col, EMBED_DIM).withColumnRenamed(
        "embedding", "qvec"
    )
    scored = (
        chunks.join(cand, "chunk_id")
        .join(F.broadcast(qvecs), id_col)
        .select(
            id_col, "chunk_id", "k",
            F.round(
                cosine_col(F.col("embedding").cast("array<double>"), F.col("qvec")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= min_similarity)
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "chunk_id")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("k"))
        .select(id_col, "chunk_id", F.lit("entity_based").alias("source"), "score")
    )


def batch_retrieve(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    queries: DataFrame,
    mode: str = "hybrid",
    top_k: int = 5,
    id_col: str = "query_id",
    query_col: str = "query",
    chunk_index=None,
) -> DataFrame:
    """Batch twin of the ``retrieve`` dispatcher: route a whole query
    table through the mode-mapped set-oriented strategy
    (chunk_only/simple -> batch_retrieve_chunks; entity_only ->
    batch_retrieve_entities; hybrid/graph_enhanced/auto ->
    batch_retrieve_hybrid). Unknown modes return an empty frame like
    the reference's error path. ``chunk_index`` threads the IVF index
    into the vector-scoring strategies (entity_only does no vector
    corpus scan, so it ignores the index). Returns (query_id,
    chunk_id, source, score) — per query identical to
    ``retrieve(mode=...)``."""
    resolved = _MODE_MAP.get(mode)
    if resolved is None:
        return chunks.sparkSession.createDataFrame(
            [], f"{id_col} string, chunk_id string, source string, score double"
        )
    if resolved == "chunk_only":
        return batch_retrieve_chunks(
            chunks, queries, top_k=top_k, id_col=id_col, query_col=query_col,
            chunk_index=chunk_index,
        )
    if resolved == "entity_only":
        return batch_retrieve_entities(
            chunks, nodes, mentions, queries, top_k=top_k,
            id_col=id_col, query_col=query_col,
        )
    return batch_retrieve_hybrid(
        chunks, nodes, mentions, triples, queries, top_k=top_k,
        id_col=id_col, query_col=query_col, chunk_index=chunk_index,
    )


def _batch_decay_expand(
    triples: DataFrame,
    seeds_by_q: dict[str, list[str]],
    max_depth: int = 2,
    max_entity_connections: int = 20,
    threshold: float = 0.1,
) -> DataFrame:
    """Strength-decay expansion for MANY queries in one set of jobs:
    the per-depth neighbor top-k window runs once over the union of
    every active query's frontier (partitioned by (query_id, src) — the
    per-src rank is query-independent but partitioning per query keeps
    the per-query cap semantics exact), and the score bookkeeping is
    the same driver-side dict logic as ``expand_with_strength_decay``,
    keyed by query. Per query, the output rows equal the per-query
    operator exactly (pytest-asserted).

    Returns (query_id, name, score) after each query's final
    round -> (score desc, name) -> 2x-cap trim."""
    spark = triples.sparkSession
    edges = undirected_edges(triples).persist()
    scores: dict[str, dict[str, float]] = {
        q: {s: 1.0 for s in dict.fromkeys(s_list)} for q, s_list in seeds_by_q.items()
    }
    frontier: dict[str, dict[str, float]] = {q: dict(v) for q, v in scores.items()}
    active = {q for q, v in frontier.items() if v}
    for d in range(max_depth):
        f_rows = []
        for q in sorted(active):
            top = sorted(frontier[q].items(), key=lambda kv: (-kv[1], kv[0]))
            f_rows.extend((q, n) for n, _ in top[:max_entity_connections])
        if not f_rows:
            break
        f = spark.createDataFrame(f_rows, "qid string, src string")
        w = Window.partitionBy("qid", "src").orderBy(F.desc("strength"), "dst")
        rels = (
            edges.join(F.broadcast(f), "src")
            .withColumn("_rk", F.row_number().over(w))
            .filter((F.col("_rk") <= max_entity_connections) & (F.col("strength") >= threshold))
            .select("qid", "dst", "strength")
            .collect()
        )
        decay = 0.7 ** (d + 1)
        cand: dict[str, dict[str, float]] = {}
        for r in rels:
            qc = cand.setdefault(r["qid"], {})
            s = r["strength"]
            if s > qc.get(r["dst"], float("-inf")):
                qc[r["dst"]] = s
        next_active = set()
        for q in active:
            new: dict[str, float] = {}
            for name, s in cand.get(q, {}).items():
                cs = s * decay
                if name in scores[q]:
                    scores[q][name] = max(scores[q][name], cs)
                else:
                    new[name] = cs
            scores[q].update(new)
            frontier[q] = new
            if len(scores[q]) <= 3 * max_entity_connections and new:
                next_active.add(q)
        active = next_active
        if not active:
            break
    edges.unpersist()
    rows = [(q, n, s) for q, v in sorted(scores.items()) for n, s in sorted(v.items())]
    out = spark.createDataFrame(rows, "query_id string, name string, score double")
    tw = Window.partitionBy("query_id").orderBy(F.desc("score"), "name")
    return (
        out.select("query_id", "name", F.round("score", 6).alias("score"))
        .withColumn("_rk", F.row_number().over(tw))
        .filter(F.col("_rk") <= 2 * max_entity_connections)
        .drop("_rk")
    )


def batch_retrieve_hybrid(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    queries: DataFrame,
    top_k: int = 5,
    expansion_threshold: float = 0.1,
    id_col: str = "query_id",
    query_col: str = "query",
    chunk_index=None,
    n_probe: int | None = None,
) -> DataFrame:
    """Set-oriented HYBRID retrieval for a whole query table — the
    batch twin of ``retrieve(mode='hybrid')``, per-query identical
    output (pytest-asserted). ``chunk_index`` routes the one scored
    scan through the IVF index (``_indexed_query_scores``) — probed
    cells only instead of the whole corpus; identical at full probe.

    Set-oriented stages (one job each for ALL queries): complexity
    widening + per-query slot split as columns; one query-embedding
    Arrow pass; ONE broadcast cross join for every query's scored
    chunk scan; one seeds job; the multi-query decay expansion
    (``_batch_decay_expand``); one entity-side rollup; the
    (query_id, chunk_id)-keyed 3-way merge. The multi-hop PATH side
    runs HOP-BATCHED over all multi-hop-recommended queries' seeds at
    once (``batch_multi_hop_retrieval`` — one edge-join job per hop
    for the whole batch, not one beam loop per query); factual/simple
    batches never pay it.

    Returns (query_id, chunk_id, source, hybrid_score)."""
    from .embeddings import EMBED_DIM, _embed_df
    from .query_analysis import (
        HYBRID_CHUNK_WEIGHT,
        HYBRID_PATH_WEIGHT,
        analyze_queries,
    )
    from .similarity import cosine_col

    spark = queries.sparkSession
    meta = analyze_queries(queries, query_col)
    kc = (
        F.when(
            (F.col("complexity") == "complex") | F.col("requires_multiple_sources"),
            F.least(F.lit(top_k + 3), F.lit(10)),
        )
        .when(F.col("query_type") == "comparative", F.least(F.lit(top_k + 5), F.lit(12)))
        .otherwise(F.lit(top_k))
    ).cast("int")
    # retrieval_split (retriever.py:639-686) with the PER-QUERY widened
    # k (the Spark retrieval_split takes a constant top_k; hybrid is
    # called with the widened value, so the split must use it too)
    qt = F.col("query_type")
    cw, bpw = float(HYBRID_CHUNK_WEIGHT), float(HYBRID_PATH_WEIGHT)
    pw = (
        F.when(qt == "comparative", F.least(F.lit(0.8), F.lit(bpw) * 1.3))
        .when(qt == "analytical", F.least(F.lit(0.7), F.lit(bpw) * 1.1))
        .otherwise(F.greatest(F.lit(0.2), F.lit(bpw) * 0.7))
    )
    use_mh = F.col("multi_hop_recommended")
    remaining = 1.0 - pw
    k = kc.cast("double")
    chunk_plain = F.greatest(F.lit(1), F.floor(k * cw).cast("int"))
    chunk_count = F.when(
        use_mh, F.greatest(F.lit(1), F.floor(k * cw * remaining).cast("int"))
    ).otherwise(chunk_plain)
    entity_count = F.when(
        use_mh, F.greatest(F.lit(1), F.floor(k * (1 - cw) * remaining).cast("int"))
    ).otherwise(F.greatest(F.lit(1), kc - chunk_plain))
    path_mh = (
        F.when(qt == "comparative", F.greatest(F.floor(k * pw).cast("int"), F.floor(kc / 2).cast("int")))
        .when(qt == "analytical", F.greatest(F.floor(k * pw).cast("int"), F.floor(kc / 3).cast("int")))
        .otherwise(F.greatest(F.lit(1), F.floor(k * pw).cast("int")))
    )
    path_count = F.when(use_mh, path_mh).otherwise(F.lit(0)).cast("int")
    qmeta = {
        r[id_col]: r
        for r in meta.select(
            id_col,
            F.col(query_col).alias("_q"),
            kc.alias("k"),
            chunk_count.cast("int").alias("chunk_count"),
            entity_count.cast("int").alias("entity_count"),
            path_count.alias("path_count"),
        ).collect()
    }
    if not qmeta:
        # column name must match the non-empty path's final select
        # (which aliases hybrid_score AS score) — a consumer selecting
        # 'score' on an empty batch must not hit an AnalysisException
        return spark.createDataFrame(
            [], f"{id_col} string, chunk_id string, source string, score double"
        )

    # one scored scan for every query; per-query top max(chunk_count, 10)
    qvecs = _embed_df(queries, id_col, query_col, EMBED_DIM).withColumnRenamed(
        "embedding", "qvec"
    )
    kmax_rows = [(q, max(m["chunk_count"], 10)) for q, m in qmeta.items()]
    kmaxdf = spark.createDataFrame(kmax_rows, f"{id_col} string, kmax int")
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "chunk_id")
    if chunk_index is not None:
        _check_chunk_index(chunk_index)
        scored_all = _indexed_query_scores(chunk_index, qvecs, id_col, n_probe).join(
            F.broadcast(kmaxdf), id_col
        )
    else:
        scored_all = chunks.crossJoin(F.broadcast(qvecs.join(kmaxdf, id_col))).select(
            id_col, "chunk_id", "kmax",
            F.round(
                cosine_col(F.col("embedding").cast("array<double>"), F.col("qvec")), 6
            ).alias("score"),
        )
    scored_top = [
        (r[id_col], r["chunk_id"], r["score"])
        for r in scored_all
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("kmax"))
        .select(id_col, "chunk_id", "score")
        .collect()
    ]
    by_q: dict[str, list[tuple[str, float]]] = {}
    for q, cid, s in sorted(scored_top, key=lambda t: (t[0], -t[2], t[1])):
        by_q.setdefault(q, []).append((cid, s))
    chunk_rows = [
        (q, cid, s)
        for q, lst in by_q.items()
        for cid, s in lst[: qmeta[q]["chunk_count"]]
    ]
    chunk_side = spark.createDataFrame(
        chunk_rows, f"{id_col} string, chunk_id string, similarity double"
    )

    # seeds for every query in one job (top-10 chunks' entities, top-5
    # by max importance)
    top10_rows = [(q, cid) for q, lst in by_q.items() for cid, _ in lst[:10]]
    top10 = spark.createDataFrame(top10_rows, f"{id_col} string, chunk_id string")
    sw = Window.partitionBy(id_col).orderBy(F.desc("importance"), "name")
    seed_rows = (
        mentions.join(F.broadcast(top10), "chunk_id")
        .join(nodes.select("entity_id", "name", "importance"), "entity_id")
        .groupBy(id_col, "name")
        .agg(F.max("importance").alias("importance"))
        .withColumn("_rk", F.row_number().over(sw))
        .filter(F.col("_rk") <= 5)
        .select(id_col, "name")
        .collect()
    )
    seeds_by_q: dict[str, list[str]] = {q: [] for q in qmeta}
    for r in sorted(seed_rows, key=lambda r: (r[id_col], r["name"])):
        seeds_by_q[r[id_col]].append(r["name"])

    # entity side: multi-query decay expansion + one rollup
    exp = _batch_decay_expand(
        triples, {q: s for q, s in seeds_by_q.items() if s}
    )
    ew = Window.partitionBy(id_col).orderBy(F.desc("similarity"), "chunk_id")
    ec_rows = [(q, m["entity_count"]) for q, m in qmeta.items()]
    ecdf = spark.createDataFrame(ec_rows, f"{id_col} string, ec int")
    entity_side = (
        mentions.join(nodes.select("entity_id", "name"), "entity_id")
        .join(F.broadcast(exp.withColumnRenamed("query_id", id_col)), "name")
        .groupBy(id_col, "chunk_id")
        .agg(F.max("score").alias("similarity"))
        .filter(F.col("similarity") >= expansion_threshold)
        .withColumn("_rk", F.row_number().over(ew))
        .join(F.broadcast(ecdf), id_col)
        .filter(F.col("_rk") <= F.col("ec"))
        .select(id_col, "chunk_id", "similarity")
    )

    # path side: hop-batched beam search over ALL multi-hop queries'
    # seeds at once (r4 VERDICT item 4) — a comparative-heavy batch
    # pays one edge-join job per hop instead of one beam loop per
    # query; per query identical to multi_hop_retrieval (the seeds and
    # query vectors are the exact frames the sequential calls used)
    mh_seed_rows = [
        (q, s)
        for q, m in qmeta.items()
        if m["path_count"] > 0
        for s in seeds_by_q.get(q, [])
    ]
    if mh_seed_rows:
        seed_df = spark.createDataFrame(mh_seed_rows, f"{id_col} string, name string")
        pcdf = spark.createDataFrame(
            [(q, m["path_count"]) for q, m in qmeta.items() if m["path_count"] > 0],
            f"{id_col} string, pc int",
        )
        pw2 = Window.partitionBy(id_col).orderBy(F.desc("similarity"), "chunk_id")
        path_side = (
            batch_multi_hop_retrieval(
                chunks, nodes, triples, qvecs, seed_df, id_col=id_col
            )
            .withColumn("_rk", F.row_number().over(pw2))
            .join(F.broadcast(pcdf), id_col)
            .filter(F.col("_rk") <= F.col("pc"))
            .select(id_col, "chunk_id", "similarity")
        )
    else:
        path_side = spark.createDataFrame(
            [], f"{id_col} string, chunk_id string, similarity double"
        )

    merged = hybrid_merge_3way(
        chunk_side, entity_side, path_side, keys=[id_col, "chunk_id"]
    )
    kdf = spark.createDataFrame(
        [(q, m["k"]) for q, m in qmeta.items()], f"{id_col} string, k int"
    )
    mw = Window.partitionBy(id_col).orderBy(F.desc("hybrid_score"), "chunk_id")
    return (
        merged.withColumn("_rk", F.row_number().over(mw))
        .join(F.broadcast(kdf), id_col)
        .filter(F.col("_rk") <= F.col("k"))
        .select(id_col, "chunk_id", "source", F.col("hybrid_score").alias("score"))
    )


def retrieve_with_graph_expansion(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    query_text: str,
    mode: str = "hybrid",
    top_k: int = 3,
    expand_depth: int = 2,
    max_chunk_connections: int = 10,
    max_expanded_chunks: int = 500,
    expansion_threshold: float = 0.1,
) -> DataFrame:
    """Graph-expanded retrieval (rag/retriever.py:876-1084): initial
    ``retrieve`` results widened through the graph, as one declarative
    job per branch. Defaults mirror config/settings.py:107-121.

    - entity branch (entity_only / hybrid modes): entities mentioned in
      the initial chunks seed a strength-decay expansion (G6, the same
      0.7^(d+1) / top-20 / threshold loop as entity_expansion_retrieval,
      retriever.py:1086-1160); each candidate chunk scores as the max
      contained-entity expansion score (:1152-1168); additions capped at
      ``max_expanded_chunks // 2`` (:946-948).
    - chunk branch (chunk_only / hybrid modes): ``related_chunks`` from
      each initial chunk, top ``max_chunk_connections`` per seed in
      (distance, similarity) order (:1019-1022), scored
      ``source_score / (distance + 1)`` (:1034-1037), capped at
      ``max_chunk_connections x n_initial`` additions (:1004-1006).
    - merge: initial rows first, then entity additions, then chunk
      additions (the reference's append order), first occurrence per
      chunk wins; filter >= ``expansion_similarity_threshold``, sort by
      similarity, truncate to ``max_expanded_chunks`` (:1060-1077).

    Documented divergences (repo convention): the reference's mid-loop
    break quirks become the equivalent global caps, and initial rows
    keep their retrieval score through the final filter (the reference
    reads ``chunk["similarity"]``, which hybrid-mode rows don't carry,
    so its final filter silently drops initial hybrid results — clearly
    unintended).

    Returns (chunk_id, source, expansion_type, similarity)."""
    initial = retrieve(
        chunks, nodes, mentions, triples, query_text, mode=mode, top_k=top_k
    ).persist()
    n_initial = initial.count()
    if n_initial == 0:
        return chunks.sparkSession.createDataFrame(
            [], "chunk_id string, source string, expansion_type string, similarity double"
        )
    resolved = _MODE_MAP.get(mode, "hybrid")
    base = initial.select(
        "chunk_id", "source", F.lit(None).cast("string").alias("expansion_type"),
        F.col("score").alias("similarity"), F.lit(0).alias("branch"),
    )
    parts = [base]

    if resolved in ("entity_only", "hybrid"):
        # per-chunk entity cap = the reference's entity_ids[:20] slice
        # (settings.max_entity_connections, retriever.py:956-958) —
        # bounds this collect at 20 x n_initial names no matter how
        # entity-dense a chunk is
        per_chunk = Window.partitionBy("chunk_id").orderBy(
            F.desc("importance"), "name"
        )
        seeds = [
            r["name"]
            for r in mentions.join(
                F.broadcast(initial.select("chunk_id")), "chunk_id"
            )
            .join(nodes.select("entity_id", "name", "importance"), "entity_id")
            .withColumn("rk", F.row_number().over(per_chunk))
            .filter(F.col("rk") <= 20)
            .select("name").distinct().collect()
        ]
        if seeds:
            exp = expand_with_strength_decay(
                triples, seeds, max_depth=min(expand_depth, 2),
                threshold=expansion_threshold,
            )
            ent_add = (
                mentions.join(nodes.select("entity_id", "name"), "entity_id")
                .join(exp, "name")
                .groupBy("chunk_id")
                .agg(F.round(F.max("score"), 6).alias("similarity"))
                .orderBy(F.desc("similarity"), "chunk_id")
                .limit(max_expanded_chunks // 2)
                .select(
                    "chunk_id", F.lit("entity_expansion").alias("source"),
                    F.lit("entity_expansion").alias("expansion_type"),
                    "similarity", F.lit(1).alias("branch"),
                )
            )
            parts.append(ent_add)

    if resolved in ("chunk_only", "hybrid"):
        sim_edges = chunk_similarity_edges_for(chunks)
        seeds_df = initial.select(
            F.col("chunk_id").alias("seed_id"),
            F.row_number().over(
                Window.orderBy(F.desc("score"), "chunk_id")
            ).alias("seed_rank"),
            F.col("score").alias("seed_score"),
        )
        rel = related_chunks(
            sim_edges, chunks, seeds_df.select("seed_id", "seed_rank"),
            max_depth=min(expand_depth, 2),
        )
        per_seed = Window.partitionBy("seed_id").orderBy(
            "distance", F.desc("similarity"), "chunk_id"
        )
        chunk_add = (
            rel.withColumn("rk", F.row_number().over(per_seed))
            .filter(F.col("rk") <= max_chunk_connections)
            .join(seeds_df.select("seed_id", "seed_score"), "seed_id")
            .select(
                "chunk_id", "seed_rank", "distance",
                F.round(
                    F.col("seed_score") / (F.col("distance") + 1), 6
                ).alias("similarity"),
            )
            .withColumn(
                "occ",
                F.row_number().over(
                    Window.partitionBy("chunk_id").orderBy(
                        "seed_rank", "distance", F.desc("similarity")
                    )
                ),
            )
            .filter(F.col("occ") == 1)
            .withColumn(
                "pos",
                F.row_number().over(
                    Window.orderBy("seed_rank", "distance", F.desc("similarity"), "chunk_id")
                ),
            )
            .filter(F.col("pos") <= max_chunk_connections * n_initial)
            .select(
                "chunk_id", F.lit("chunk_expansion").alias("source"),
                F.lit("chunk_similarity").alias("expansion_type"),
                "similarity", F.lit(2).alias("branch"),
            )
        )
        parts.append(chunk_add)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    first = Window.partitionBy("chunk_id").orderBy("branch")
    return (
        out.withColumn("occ", F.row_number().over(first))
        .filter(F.col("occ") == 1)
        .filter(F.col("similarity") >= expansion_threshold)
        .select("chunk_id", "source", "expansion_type", "similarity")
        .orderBy(F.desc("similarity"), "chunk_id")
        .limit(max_expanded_chunks)
    )


def batch_retrieve_with_graph_expansion(
    chunks: DataFrame,
    nodes: DataFrame,
    mentions: DataFrame,
    triples: DataFrame,
    queries: DataFrame,
    mode: str = "hybrid",
    top_k: int = 3,
    expand_depth: int = 2,
    max_chunk_connections: int = 10,
    max_expanded_chunks: int = 500,
    expansion_threshold: float = 0.1,
    id_col: str = "query_id",
    query_col: str = "query",
    chunk_index=None,
) -> DataFrame:
    """``retrieve_with_graph_expansion`` for a whole query table — per
    query identical output (pytest-asserted). This closes the last
    per-query driver loop in the batch serving family: a complex/
    comparative-heavy evaluation batch previously paid one full
    expansion composition per gated query
    (graph_rag.batch_retrieve_documents's loop); now the three phases
    run as set-oriented jobs over every query at once:

    - initial retrieval: ``batch_retrieve`` (one corpus pass for all
      queries, optionally through the IVF ``chunk_index``);
    - entity branch: per-(query, chunk) top-20 seed entities in one
      window, then ``_batch_decay_expand`` — the hop-batched expansion
      already serving batch_retrieve_hybrid, whose per-query early-stop
      bookkeeping is exact; candidate chunks score/cap per query;
    - chunk branch: ``related_chunks(keys=[query_id])`` traverses every
      query's seeds in the same three joins; the per-seed cap, the
      first-occurrence dedup, and the reference's
      ``max_chunk_connections x n_initial`` additions cap become
      query-partitioned windows (per-query n_initial joined from a
      broadcast counts frame);
    - merge: branch-priority first-occurrence per (query, chunk),
      threshold filter, per-query top ``max_expanded_chunks``.

    Driver-side state stays query-scale: the initial-count frame and
    the seed-entity names (<= 20 x top_k x |queries| rows) — same
    bounded-collect contract as the rest of the batch family.

    Returns (query_id, chunk_id, source, expansion_type, similarity)."""
    spark = chunks.sparkSession
    initial = batch_retrieve(
        chunks, nodes, mentions, triples, queries, mode=mode, top_k=top_k,
        id_col=id_col, query_col=query_col, chunk_index=chunk_index,
    ).persist()
    counts = initial.groupBy(id_col).count().collect()
    resolved = _MODE_MAP.get(mode, "hybrid")
    base = initial.select(
        id_col, "chunk_id", "source",
        F.lit(None).cast("string").alias("expansion_type"),
        F.col("score").alias("similarity"), F.lit(0).alias("branch"),
    )
    parts = [base]

    if resolved in ("entity_only", "hybrid"):
        per_chunk = Window.partitionBy(id_col, "chunk_id").orderBy(
            F.desc("importance"), "name"
        )
        seed_rows = (
            mentions.join(F.broadcast(initial.select(id_col, "chunk_id")), "chunk_id")
            .join(nodes.select("entity_id", "name", "importance"), "entity_id")
            .withColumn("rk", F.row_number().over(per_chunk))
            .filter(F.col("rk") <= 20)
            .select(id_col, "name")
            .distinct()
            .collect()
        )
        seeds_by_q: dict[str, list[str]] = {}
        for r in seed_rows:
            seeds_by_q.setdefault(r[id_col], []).append(r["name"])
        exp = _batch_decay_expand(
            triples, seeds_by_q, max_depth=min(expand_depth, 2),
            threshold=expansion_threshold,
        ).withColumnRenamed("query_id", id_col)
        ew = Window.partitionBy(id_col).orderBy(F.desc("similarity"), "chunk_id")
        ent_add = (
            mentions.join(nodes.select("entity_id", "name"), "entity_id")
            .join(exp, "name")
            .groupBy(id_col, "chunk_id")
            .agg(F.round(F.max("score"), 6).alias("similarity"))
            .withColumn("_rk", F.row_number().over(ew))
            .filter(F.col("_rk") <= max_expanded_chunks // 2)
            .select(
                id_col, "chunk_id", F.lit("entity_expansion").alias("source"),
                F.lit("entity_expansion").alias("expansion_type"),
                "similarity", F.lit(1).alias("branch"),
            )
        )
        parts.append(ent_add)

    if resolved in ("chunk_only", "hybrid"):
        sim_edges = chunk_similarity_edges_for(chunks)
        sw = Window.partitionBy(id_col).orderBy(F.desc("score"), "chunk_id")
        seeds_df = initial.select(
            id_col,
            F.col("chunk_id").alias("seed_id"),
            F.row_number().over(sw).alias("seed_rank"),
            F.col("score").alias("seed_score"),
        )
        rel = related_chunks(
            sim_edges, chunks, seeds_df.select(id_col, "seed_id", "seed_rank"),
            max_depth=min(expand_depth, 2), keys=[id_col],
        )
        per_seed = Window.partitionBy(id_col, "seed_id").orderBy(
            "distance", F.desc("similarity"), "chunk_id"
        )
        ninit = spark.createDataFrame(
            [(r[id_col], r["count"]) for r in counts], f"{id_col} string, n_init long"
        )
        chunk_add = (
            rel.withColumn("rk", F.row_number().over(per_seed))
            .filter(F.col("rk") <= max_chunk_connections)
            .join(seeds_df.select(id_col, "seed_id", "seed_score"), [id_col, "seed_id"])
            .select(
                id_col, "chunk_id", "seed_rank", "distance",
                F.round(
                    F.col("seed_score") / (F.col("distance") + 1), 6
                ).alias("similarity"),
            )
            .withColumn(
                "occ",
                F.row_number().over(
                    Window.partitionBy(id_col, "chunk_id").orderBy(
                        "seed_rank", "distance", F.desc("similarity")
                    )
                ),
            )
            .filter(F.col("occ") == 1)
            .withColumn(
                "pos",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        "seed_rank", "distance", F.desc("similarity"), "chunk_id"
                    )
                ),
            )
            .join(F.broadcast(ninit), id_col)
            .filter(F.col("pos") <= max_chunk_connections * F.col("n_init"))
            .select(
                id_col, "chunk_id", F.lit("chunk_expansion").alias("source"),
                F.lit("chunk_similarity").alias("expansion_type"),
                "similarity", F.lit(2).alias("branch"),
            )
        )
        parts.append(chunk_add)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    first = Window.partitionBy(id_col, "chunk_id").orderBy("branch")
    cap = Window.partitionBy(id_col).orderBy(F.desc("similarity"), "chunk_id")
    return (
        out.withColumn("occ", F.row_number().over(first))
        .filter(F.col("occ") == 1)
        .filter(F.col("similarity") >= expansion_threshold)
        .withColumn("_rk", F.row_number().over(cap))
        .filter(F.col("_rk") <= max_expanded_chunks)
        .select(id_col, "chunk_id", "source", "expansion_type", "similarity")
    )


def chunk_similarity_edges_for(chunks: DataFrame) -> DataFrame:
    """The stored J1 edge set used by chunk-graph traversals — thin
    indirection so query-side callers don't import graph_ops
    (circular)."""
    from .graph_ops import chunk_similarity_edges

    return chunk_similarity_edges(chunks, threshold=0.5, k=3)


def top_entities(nodes: DataFrame, k: int = 10) -> DataFrame:
    """T4 (core/graph_db.py:1051-1067)."""
    return nodes.orderBy(F.desc("importance"), "name").limit(k)


def related_chunks(
    sim_edges: DataFrame,
    chunks: DataFrame,
    seeds: DataFrame,
    max_depth: int = 2,
    keys: list[str] | None = None,
) -> DataFrame:
    """Chunk-graph traversal (core/graph_db.py:516-557): chunks related
    to each seed chunk through SIMILAR_TO (the stored J1 edge set,
    undirected) and HAS_CHUNK (doc -> chunk, i.e. same-document
    siblings) paths of length <= 2. Per related chunk and path shape:

    - depth 1: a direct SIMILAR_TO neighbor, similarity = edge score;
    - depth 2 via two SIMILAR_TO hops: similarity = mean of the two
      edge scores (the reference's reduce/size average), revisiting the
      seed excluded (a Neo4j path cannot reuse its first relationship);
    - depth 2 via the document (HAS_CHUNK up + down): no similarity
      scores on the path -> the reference's distance fallback, 0.2.

    Distinct (chunk, distance, similarity) rows, like the Cypher
    RETURN DISTINCT — the same chunk may legitimately appear with
    several similarities (different intermediate chunks).

    ``seeds``: (seed_id, seed_rank) frame — all seeds traverse in one
    relational job (three joins), no per-seed driver loop. Candidate
    volume is bounded by |seeds| x top-k fan-out, so downstream global
    windows stay small. ``keys`` (e.g. ['query_id']) carries grouping
    columns from ``seeds`` through every branch — the batch twin's
    whole-query-table traversal is the same three joins."""
    kc = list(keys or [])
    und = sim_edges.select("src", "dst", "similarity").unionByName(
        sim_edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "similarity"
        )
    )
    e1 = und.withColumnRenamed("src", "seed_id")
    s = seeds.select(*kc, "seed_id", "seed_rank")
    d1 = s.join(e1, "seed_id").select(
        *kc, "seed_id", "seed_rank", F.col("dst").alias("chunk_id"),
        F.lit(1).alias("distance"), F.col("similarity"),
    )
    parts = [d1]
    if max_depth >= 2:
        hop2 = (
            s.join(e1.select("seed_id", F.col("dst").alias("mid"), F.col("similarity").alias("s1")), "seed_id")
            .join(
                und.select(F.col("src").alias("mid"), F.col("dst").alias("chunk_id"), F.col("similarity").alias("s2")),
                "mid",
            )
            .filter(F.col("chunk_id") != F.col("seed_id"))
            .select(
                *kc, "seed_id", "seed_rank", "chunk_id",
                F.lit(2).alias("distance"),
                F.round((F.col("s1") + F.col("s2")) / 2.0, 6).alias("similarity"),
            )
        )
        cid = chunks.select("chunk_id", "doc_id")
        sib = (
            s.join(cid.withColumnRenamed("chunk_id", "seed_id"), "seed_id")
            .join(cid, "doc_id")
            .filter(F.col("chunk_id") != F.col("seed_id"))
            .select(
                *kc, "seed_id", "seed_rank", "chunk_id",
                F.lit(2).alias("distance"), F.lit(0.2).alias("similarity"),
            )
        )
        parts += [hop2, sib]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def graph_reasoning_enhance(
    retrieved: DataFrame,
    sim_edges: DataFrame,
    chunks: DataFrame,
    top_m: int = 3,
    cap: int = 10,
) -> DataFrame:
    """The reason_with_graph node (rag/nodes/graph_reasoning.py:13-94)
    as one declarative job: expand from the top ``top_m`` retrieved
    chunks via ``related_chunks``, append unseen related chunks in the
    reference's iteration order (seed rank, then distance ASC,
    similarity DESC), stop when the enhanced context reaches ``cap``.

    Documented divergence (repo convention): the reference's
    ``len >= 10`` break sits inside the inner loop, so each LATER seed
    may still append one chunk past the cap; here the cap is strict —
    exactly ``min(cap - n_retrieved, available)`` additions. Ties in
    (distance, similarity) order break by chunk_id (the reference
    leaves Neo4j's tie order unspecified).

    ``retrieved``: (chunk_id, rank) frame, rank 1 = best. Returns the
    retrieved rows (source='retrieved', related_to NULL) plus the
    appended rows (source='graph_expansion', related_to = the seed
    whose expansion added them), each with distance + similarity."""
    n_retrieved = retrieved.count()
    budget = max(0, cap - n_retrieved)
    seeds = (
        retrieved.orderBy("rank").limit(top_m)
        .select(F.col("chunk_id").alias("seed_id"), F.col("rank").alias("seed_rank"))
    )
    cands = (
        related_chunks(sim_edges, chunks, seeds)
        .join(retrieved.select("chunk_id"), "chunk_id", "left_anti")
    )
    order = [F.col("seed_rank"), F.col("distance"), F.desc("similarity"), F.col("chunk_id")]
    # first-occurrence dedup (the reference's seen-set), then the
    # sequential cap — both tiny windows over the bounded candidate set
    first = Window.partitionBy("chunk_id").orderBy(*order)
    seq = Window.orderBy(*order)
    added = (
        cands.withColumn("occ", F.row_number().over(first))
        .filter(F.col("occ") == 1)
        .withColumn("pos", F.row_number().over(seq))
        .filter(F.col("pos") <= budget)
        .select(
            "chunk_id",
            F.lit("graph_expansion").alias("source"),
            F.col("seed_id").alias("related_to"),
            "distance",
            F.round("similarity", 6).alias("similarity"),
        )
    )
    base = retrieved.select(
        "chunk_id",
        F.lit("retrieved").alias("source"),
        F.lit(None).cast("string").alias("related_to"),
        F.lit(0).alias("distance"),
        F.lit(None).cast("double").alias("similarity"),
    )
    return base.unionByName(added)


def batch_graph_reasoning_enhance(
    retrieved: DataFrame,
    sim_edges: DataFrame,
    chunks: DataFrame,
    top_m: int = 3,
    cap: int = 10,
    id_col: str = "query_id",
) -> DataFrame:
    """``graph_reasoning_enhance`` for a WHOLE query table — per query
    identical output (pytest-asserted), one set of jobs for all
    queries: the chunk-graph traversal runs once over the union of all
    queries' seeds (``related_chunks`` with keys=[query_id]), and the
    per-query budget (cap - n_retrieved), first-occurrence dedup, and
    strict sequential cap become query-partitioned windows instead of
    a driver round-trip per query.

    ``retrieved``: (query_id, chunk_id, rank), rank 1 = best per
    query. Returns the per-query enhanced frame keyed by query_id."""
    budgets = retrieved.groupBy(id_col).agg(
        F.greatest(F.lit(0), F.lit(cap) - F.count("*")).alias("_budget")
    )
    seeds = retrieved.filter(F.col("rank") <= top_m).select(
        id_col, F.col("chunk_id").alias("seed_id"), F.col("rank").alias("seed_rank")
    )
    cands = related_chunks(sim_edges, chunks, seeds, keys=[id_col]).join(
        retrieved.select(id_col, "chunk_id"), [id_col, "chunk_id"], "left_anti"
    )
    order = [F.col("seed_rank"), F.col("distance"), F.desc("similarity"), F.col("chunk_id")]
    first = Window.partitionBy(id_col, "chunk_id").orderBy(*order)
    seq = Window.partitionBy(id_col).orderBy(*order)
    added = (
        cands.withColumn("occ", F.row_number().over(first))
        .filter(F.col("occ") == 1)
        .withColumn("pos", F.row_number().over(seq))
        .join(F.broadcast(budgets), id_col)
        .filter(F.col("pos") <= F.col("_budget"))
        .select(
            id_col,
            "chunk_id",
            F.lit("graph_expansion").alias("source"),
            F.col("seed_id").alias("related_to"),
            "distance",
            F.round("similarity", 6).alias("similarity"),
        )
    )
    base = retrieved.select(
        id_col,
        "chunk_id",
        F.lit("retrieved").alias("source"),
        F.lit(None).cast("string").alias("related_to"),
        F.lit(0).alias("distance"),
        F.lit(None).cast("double").alias("similarity"),
    )
    return base.unionByName(added)


def chunks_in_order(chunks: DataFrame, doc_id: str) -> DataFrame:
    """T8 (core/graph_db.py:559-570)."""
    return chunks.filter(F.col("doc_id") == doc_id).orderBy("chunk_index")
