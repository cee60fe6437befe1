"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction query on sf0.001.
``queries()`` — one entry per implemented operator family from
SURVEY.md §2 (+ the training-data operators: dedup, similarity search,
text analysis, multimodal), each a (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL for every
SQL-expressible query (same column names/rounding on both sides).
Non-SQL-expressible ops (the KG pipeline itself, MinHash/SimHash/LSH,
media feature extraction) have no oracle entry -> driver records the
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from graphrag_spark import dedup as gdedup
from graphrag_spark import multimodal, similarity, textstats
from graphrag_spark.corpus import spans_from_flat
from graphrag_spark.pipeline import run_in_memory

N_KG_DOCS = 120  # docs fed to the in-memory KG pipeline queries


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spans_docs(spark: SparkSession, sf_dir: str, n_docs: int = N_KG_DOCS) -> DataFrame:
    flat = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < n_docs)
    return spans_from_flat(flat)


_KG_CACHE: dict[str, dict] = {}


def _kg(spark: SparkSession, sf_dir: str) -> dict:
    """Memoized KG build per sf_dir: several queries() entries read the
    constructed graph; build it once per driver process."""
    if sf_dir not in _KG_CACHE:
        out = run_in_memory(spark, _spans_docs(spark, sf_dir))
        _KG_CACHE[sf_dir] = {
            "chunks": out["chunks"].persist(),
            "nodes": out["nodes"].persist(),
            "mentions": out["mentions"].persist(),
            "triples": out["triples"].persist(),
        }
    return _KG_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG construction over interleaved-span documents derived
    from sf0.001, returning the top entities by importance with their
    strongest relationship (SURVEY.md §7.0 minimum slice)."""
    docs = _spans_docs(spark, "/root/testdata/sf0.001", 150)
    out = run_in_memory(spark, docs)
    nodes = out["nodes"]
    triples = out["triples"]
    strongest = (
        triples.select(F.col("subj").alias("name"), "obj", "pred", "strength")
        .unionByName(triples.select(F.col("obj").alias("name"), F.col("subj").alias("obj"), "pred", "strength"))
        .groupBy("name")
        .agg(F.max_by(F.struct("obj", "pred", "strength"), F.struct("strength", "obj")).alias("s"))
        .select("name", F.col("s.obj").alias("related_to"), F.col("s.strength").alias("strength"))
    )
    return (
        nodes.join(strongest, "name", "left")
        .select("name", "entity_type", "importance", "n_mentions", "related_to", "strength")
        .orderBy(F.desc("importance"), "name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_top_customers(spark, sf_dir):
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


def _q_per_customer_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rk")
    )


def _q_region_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"))
        .orderBy("r_name")
    )


def _q_customer_order_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("priorities"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )


def _q_distinct_words(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 6)
        .distinct()
        .orderBy("word")
        .limit(100)
    )


def _q_entity_ids(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.substring(F.md5(F.lower("text")), 1, 16).alias("entity_id"))


def _q_order_status_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def _q_monthly_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("month")
    )


def _q_quality_bands(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    score = textstats.quality_score(F.col("text"))
    return (
        d.select(
            F.when(score >= 0.8, "high").when(score >= 0.5, "medium").otherwise("low").alias("band"),
            # centile bucket makes the oracle sensitive to the exact
            # penalty formula, not just the 3-way banding
            F.floor(score * 100).cast("int").alias("centile"),
        )
        .groupBy("band", "centile")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("band", "centile")
    )


def _q_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.sum(textstats.token_count_ws(F.col("text"))).alias("tokens_ws"),
            F.sum(textstats.token_count_bpe(F.col("text"))).alias("tokens_bpe"),
        )
        .orderBy("lang")
    )


def _q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(textstats.lang_id(F.col("text")).alias("lang_detected"))
        .groupBy("lang_detected")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_detected")
    )


def _q_fingerprints(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", textstats.fingerprint(F.col("text")).alias("fp"))


def _q_exact_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return gdedup.exact_dedup(d).orderBy("content_hash")


def _q_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").first()
    return similarity.cosine_topk_query(e.filter(F.col("vec_id") != 0), list(qrow[0]), k=10)


def _q_knn_edges(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    # distributed block-pair exact kNN — no single-task global matrix
    pairs = similarity.pairwise_topk_blocked(e, k=3, threshold=0.2, block_rows=512)
    return pairs.orderBy("src", F.desc("similarity"), "dst")


def _q_label_clusters(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg(similarity.norm_col(F.col("embedding").cast("array<double>"))), 6).alias("avg_norm"),
        )
        .orderBy("label")
    )


def _q_semijoin_parts(spark, sf_dir):
    li, p = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    return (
        li.join(p.filter(F.col("p_size") >= 40), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("l_extendedprice"), 2).alias("total_price"))
        .orderBy("l_returnflag")
    )


def _q_antijoin_customers(spark, sf_dir):
    c, o, n = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "nation")
    big = o.filter(F.col("o_totalprice") > 400000)
    inactive = c.join(big, c.c_custkey == big.o_custkey, "left_anti")
    return (
        inactive.join(F.broadcast(n), inactive.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_inactive"))
        .orderBy("n_name")
    )


def _q_union_accounts(spark, sf_dir):
    c, s = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "supplier")
    u = c.select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("acct_id"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    ).unionByName(
        s.select(
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("acct_id"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )
    return (
        u.groupBy("nationkey")
        .agg(F.countDistinct("acct_id").alias("n_accounts"), F.round(F.sum("acctbal"), 2).alias("total_bal"))
        .orderBy("nationkey")
    )


def _q_events_stats(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
        .orderBy("event_type")
    )


def _q_events_user_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("user_id", "event_id", F.round("value", 2).alias("value"), "rk")
    )


def _q_fulltext_docs(spark, sf_dir):
    """T7 analog with a DuckDB oracle: term-frequency ranked documents."""
    d = _t(spark, sf_dir, "documents")
    score = (
        F.regexp_count(F.col("text"), F.lit(r"(?i)\bmerge\b"))
        + F.regexp_count(F.col("text"), F.lit(r"(?i)\bshuffle\b"))
    )
    return (
        d.select("doc_id", F.round(score * 1000.0 / F.greatest(F.length("text"), F.lit(1)), 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


# ------------------------------ rows-only (non-SQL-expressible) queries ----

def _q_kg_triples(spark, sf_dir):
    return _kg(spark, sf_dir)["triples"].select("subj", "pred", "obj", "strength", "n_observations")


def _q_kg_nodes(spark, sf_dir):
    return _kg(spark, sf_dir)["nodes"].select("entity_id", "name", "entity_type", "importance", "n_mentions")


def _q_kg_graph_stats(spark, sf_dir):
    from graphrag_spark import graph_ops

    kg = _kg(spark, sf_dir)
    return graph_ops.graph_stats(kg["nodes"], kg["chunks"], kg["mentions"], kg["triples"])


def _q_kg_extraction_status(spark, sf_dir):
    from graphrag_spark import graph_ops

    kg = _kg(spark, sf_dir)
    return graph_ops.extraction_status(kg["chunks"], kg["mentions"])


def _q_kg_chunk_sim_edges(spark, sf_dir):
    from graphrag_spark import graph_ops

    kg = _kg(spark, sf_dir)
    return graph_ops.chunk_similarity_edges(kg["chunks"], threshold=0.5, k=3)


def _q_kg_entity_sim_edges(spark, sf_dir):
    from graphrag_spark import graph_ops

    kg = _kg(spark, sf_dir)
    return graph_ops.entity_similarity_edges(kg["nodes"], threshold=0.5, k=3)


def _q_kg_beam_paths(spark, sf_dir):
    from graphrag_spark import graph_query

    kg = _kg(spark, sf_dir)
    seeds = [r["subj"] for r in kg["triples"].orderBy(F.desc("strength"), "subj").limit(2).collect()]
    out = graph_query.beam_search_paths(kg["triples"], kg["nodes"], seeds, max_hops=2, beam_size=8)
    # driver contract: flatten path to a scalar string — the harness
    # canonicalizer sorts/hashes column values and can't factorize lists
    return out.select(F.concat_ws(">", "path").alias("path"), "path_score")


def _q_kg_fulltext(spark, sf_dir):
    from graphrag_spark import graph_query

    kg = _kg(spark, sf_dir)
    return graph_query.fulltext_search(kg["chunks"], "partnership rollout", top_k=10)


def _q_ivf_ann(spark, sf_dir):
    from graphrag_spark.similarity import ivf_assign, ivf_topk, train_ivf_centroids

    e = _t(spark, sf_dir, "embeddings")
    C = train_ivf_centroids(e, n_centroids=8)
    assigns = ivf_assign(e, C)
    qrow = e.filter(F.col("vec_id") == 0).select("embedding").first()
    return ivf_topk(e.filter(F.col("vec_id") != 0), list(qrow[0]), C, assigns, k=10, n_probe=3)


def _q_chunk_stats(spark, sf_dir):
    from graphrag_spark.chunking import chunk_documents, with_quality

    d = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc"), F.col("doc_id")).alias("doc_id"), F.col("text").alias("content")
    )
    chunks = with_quality(chunk_documents(d))
    return (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.round(F.avg("quality_score"), 6).alias("avg_quality"),
            F.max("chunk_index").alias("max_index"),
        )
    )


def _q_minhash_near_dups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return gdedup.minhash_lsh_pairs(d, threshold=0.5).orderBy("src", "dst")


def _q_simhash_near_dups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return gdedup.simhash_near_pairs(d, max_hamming=8).orderBy("src", "dst")


def _q_lsh_embedding_dups(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return gdedup.embedding_near_dups(e, threshold=0.35).orderBy("src", "dst")


def _q_media_features(spark, sf_dir):
    docs = _spans_docs(spark, sf_dir)
    media = multimodal.media_table_from_spans(docs)
    return multimodal.extract_media_features(media).select(
        "media_ref", "kind", "width", "height", F.size("features").alias("feature_dim")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": _q_pricing_summary,
        "top_customers": _q_top_customers,
        "per_customer_topk": _q_per_customer_topk,
        "region_rollup": _q_region_rollup,
        "customer_order_rollup": _q_customer_order_rollup,
        "distinct_words": _q_distinct_words,
        "entity_ids": _q_entity_ids,
        "order_status_stats": _q_order_status_stats,
        "monthly_orders": _q_monthly_orders,
        "quality_bands": _q_quality_bands,
        "token_counts": _q_token_counts,
        "lang_id": _q_lang_id,
        "fingerprints": _q_fingerprints,
        "exact_dedup": _q_exact_dedup,
        "cosine_topk": _q_cosine_topk,
        "knn_edges": _q_knn_edges,
        "label_clusters": _q_label_clusters,
        "semijoin_parts": _q_semijoin_parts,
        "antijoin_customers": _q_antijoin_customers,
        "union_accounts": _q_union_accounts,
        "events_stats": _q_events_stats,
        "events_user_topk": _q_events_user_topk,
        "fulltext_docs": _q_fulltext_docs,
        # rows-only (non-SQL-expressible: KG pipeline, sketches, media)
        "kg_triples": _q_kg_triples,
        "kg_nodes": _q_kg_nodes,
        "kg_graph_stats": _q_kg_graph_stats,
        "kg_extraction_status": _q_kg_extraction_status,
        "kg_chunk_sim_edges": _q_kg_chunk_sim_edges,
        "kg_entity_sim_edges": _q_kg_entity_sim_edges,
        "kg_beam_paths": _q_kg_beam_paths,
        "kg_fulltext": _q_kg_fulltext,
        "ivf_ann": _q_ivf_ann,
        "chunk_stats": _q_chunk_stats,
        "minhash_near_dups": _q_minhash_near_dups,
        "simhash_near_dups": _q_simhash_near_dups,
        "lsh_embedding_dups": _q_lsh_embedding_dups,
        "media_features": _q_media_features,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# DuckDB twin of graphrag_spark.chunking._quality_cols — the reference
# _analyze_text_quality formula + penalty set (core/ocr.py:162-258)
_QUALITY_SQL = """
    0.4 * (length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::DOUBLE
           / greatest(length(text), 1))
  + 0.3 * (1 - (length(text) - length(regexp_replace(text, '\\s', '', 'g')))::DOUBLE
               / greatest(length(text), 1))
  + 0.3 * least(
        (len(regexp_extract_all(text, '\\S+'))::DOUBLE
         / greatest(len(list_filter(string_split(text, chr(10)), x -> trim(x) != '')), 1)) / 5.0,
        1.0)
"""

_QUALITY_PENALIZED = f"""
  CASE WHEN length(trim(text)) < 5 THEN 0.0 ELSE
  ({_QUALITY_SQL})
  * (CASE WHEN regexp_matches(text, '[^\\x00-\\x7F]') THEN 0.8 ELSE 1.0 END)
  * (CASE WHEN len(regexp_extract_all(text, '\\b\\w{{1,2}}\\b')) > length(text) * 0.1
          THEN 0.7 ELSE 1.0 END)
  * (CASE WHEN position('   ' in text) > 0 THEN 0.9 ELSE 1.0 END)
  * (CASE WHEN length(text) < 30 THEN 0.6 ELSE 1.0 END)
  END
"""

_LANG_HIT = (
    "len(list_intersect(regexp_split_to_array(lower(text), '\\s+'), {words}))"
)
_LANG_WORDS = {
    code: "[" + ", ".join(f"'{w}'" for w in ws) + "]"
    for code, ws in textstats.LANG_STOPWORDS.items()
}


def oracle_sql() -> dict[str, str]:
    hits = {c: _LANG_HIT.format(words=w) for c, w in _LANG_WORDS.items()}
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_customers": """
            SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 10
        """,
        "per_customer_topk": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rk
            FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
                  FROM orders) WHERE rk <= 3
        """,
        "region_rollup": """
            SELECT r_name, count(*) AS n_customers,
                   round(avg(c_acctbal), 4) AS avg_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "customer_order_rollup": """
            SELECT o_custkey, count(*) AS n_orders,
                   count(DISTINCT o_orderpriority) AS n_priorities,
                   array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities,
                   round(sum(o_totalprice), 2) AS total_spend
            FROM orders GROUP BY o_custkey
        """,
        "distinct_words": """
            SELECT DISTINCT word FROM (
                SELECT unnest(string_split(text, ' ')) AS word FROM documents
            ) WHERE length(word) >= 6 ORDER BY word LIMIT 100
        """,
        "entity_ids": """
            SELECT doc_id, substring(md5(lower(text)), 1, 16) AS entity_id FROM documents
        """,
        "order_status_stats": """
            SELECT o_orderstatus, count(*) AS n_orders,
                   count(DISTINCT o_custkey) AS n_customers,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "monthly_orders": """
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
                   count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1 ORDER BY 1
        """,
        "quality_bands": f"""
            SELECT band, centile, count(*) AS n_docs FROM (
                SELECT CASE WHEN q >= 0.8 THEN 'high'
                            WHEN q >= 0.5 THEN 'medium'
                            ELSE 'low' END AS band,
                       CAST(floor(q * 100) AS INT) AS centile
                FROM (SELECT round(({_QUALITY_PENALIZED}), 6) AS q FROM documents)
            ) GROUP BY band, centile ORDER BY band, centile
        """,
        "token_counts": """
            SELECT lang,
                   CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS tokens_ws,
                   CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS tokens_bpe
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "lang_id": f"""
            SELECT lang_detected, count(*) AS n_docs FROM (
                SELECT CASE
                    WHEN greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']}) = 0 THEN 'und'
                    WHEN {hits['de']} = greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']}) THEN 'de'
                    WHEN {hits['en']} = greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']}) THEN 'en'
                    WHEN {hits['es']} = greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']}) THEN 'es'
                    ELSE 'fr' END AS lang_detected
                FROM documents
            ) GROUP BY 1 ORDER BY 1
        """,
        "fingerprints": """
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
            FROM documents
        """,
        "exact_dedup": """
            SELECT md5(text) AS content_hash, min(doc_id) AS survivor_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)), 6) AS similarity
            FROM embeddings WHERE vec_id <> 0
            ORDER BY similarity DESC, vec_id LIMIT 10
        """,
        "knn_edges": """
            SELECT src, dst, similarity FROM (
                SELECT a.vec_id AS src, b.vec_id AS dst,
                       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS similarity,
                       row_number() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) DESC,
                                    b.vec_id) AS rk
                FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            ) WHERE rk <= 3 AND similarity >= 0.2
            ORDER BY src, similarity DESC, dst
        """,
        "label_clusters": """
            SELECT label, count(*) AS n_vecs,
                   round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 6) AS avg_norm
            FROM embeddings GROUP BY label ORDER BY label
        """,
        "semijoin_parts": """
            SELECT l_returnflag, count(*) AS n_items,
                   round(sum(l_extendedprice), 2) AS total_price
            FROM lineitem
            WHERE EXISTS (SELECT 1 FROM part
                          WHERE p_partkey = l_partkey AND p_size >= 40)
            GROUP BY 1 ORDER BY 1
        """,
        "antijoin_customers": """
            SELECT n_name, count(*) AS n_inactive
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
            GROUP BY 1 ORDER BY 1
        """,
        "union_accounts": """
            SELECT nationkey, count(DISTINCT acct_id) AS n_accounts,
                   round(sum(acctbal), 2) AS total_bal
            FROM (
                SELECT 'c' || c_custkey AS acct_id, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
                UNION ALL
                SELECT 's' || s_suppkey, s_nationkey, s_acctbal FROM supplier
            ) GROUP BY 1 ORDER BY 1
        """,
        "events_stats": """
            SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value,
                   count(DISTINCT user_id) AS n_users,
                   strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "events_user_topk": """
            SELECT user_id, event_id, round(value, 2) AS value, rk
            FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY value DESC, event_id) AS rk
                  FROM events) WHERE rk <= 2
        """,
        "fulltext_docs": """
            SELECT doc_id, score FROM (
                SELECT doc_id,
                       round((len(regexp_extract_all(text, '(?i)\\bmerge\\b'))
                            + len(regexp_extract_all(text, '(?i)\\bshuffle\\b')))
                             * 1000.0 / greatest(length(text), 1), 6) AS score
                FROM documents
            ) WHERE score > 0 ORDER BY score DESC, doc_id LIMIT 20
        """,
    }
