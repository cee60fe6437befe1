"""Structured Streaming: stream/batch equivalence via availableNow."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from graphrag_spark.streaming import (
    incremental_kg_ingest,
    run_windowed_stats_once,
    windowed_event_stats,
)


def test_windowed_stats_stream_equals_batch(spark, sf_dir, tmp_path):
    # file stream sources read directories: stage the events table
    events_path = str(tmp_path / "events_dir")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(events_path)
    got = run_windowed_stats_once(spark, events_path, out_table="event_stats_t")
    # batch twin: same aggregation expressed on a static read
    e = spark.read.parquet(events_path)
    expect = (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value", "approx_users",
        )
    )
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in expect.collect()}
    assert a == b


def test_sessionize_events_stateful(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization: closed sessions respect
    the inactivity gap; event counts are conserved for closed sessions
    + a batch-side oracle check per user."""
    from graphrag_spark.streaming import sessionize_events

    events_path = str(tmp_path / "events_dir")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(events_path)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(events_path)
    )
    q = (
        sessionize_events(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("sessions_t").collect()
    assert got, "expected at least one closed session"
    import pandas as pd

    batch = spark.read.parquet(events_path).select("user_id", "ts", "value").toPandas()
    for r in got[:20]:
        assert r["session_end"] >= r["session_start"]
        u = batch[batch.user_id == r["user_id"]].sort_values("ts")
        in_win = u[(u.ts >= r["session_start"]) & (u.ts <= r["session_end"])]
        assert len(in_win) == r["n_events"]
        assert abs(round(in_win.value.sum(), 2) - r["total_value"]) < 0.02


def test_incremental_kg_ingest_matches_batch(spark, corpus_path, tmp_path):
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_kg_ingest(spark, corpus_path, out_dir, ckpt)
    q.awaitTermination(180)
    got_chunks = spark.read.parquet(f"{out_dir}/chunks")
    from graphrag_spark.chunking import chunk_documents, with_quality
    from graphrag_spark.corpus import document_text

    batch_chunks = with_quality(chunk_documents(document_text(spark.read.parquet(corpus_path))))
    a = {tuple(r) for r in got_chunks.select("chunk_id", "content", "offset").collect()}
    b = {tuple(r) for r in batch_chunks.select("chunk_id", "content", "offset").collect()}
    assert a == b


def test_incremental_ingest_retry_idempotent(spark, corpus_path, tmp_path):
    """A retried micro-batch (same batch_id) must replace its own
    output, not append duplicates — foreachBatch is at-least-once, so
    the per-batch_id overwrite dir is what makes the sink exactly-once."""
    out_dir = str(tmp_path / "retry_out")
    ckpt = str(tmp_path / "retry_ckpt")
    q = incremental_kg_ingest(spark, corpus_path, out_dir, ckpt)
    q.awaitTermination(180)
    before = spark.read.parquet(f"{out_dir}/chunks").count()
    # simulate a retry of batch 0: re-run the same batch function body
    # with the same batch_id over the same input
    from graphrag_spark.chunking import chunk_documents, with_quality
    from graphrag_spark.corpus import document_text

    batch_df = spark.read.parquet(corpus_path)
    chunks = with_quality(chunk_documents(document_text(batch_df)))
    chunks.write.mode("overwrite").parquet(f"{out_dir}/chunks/batch_id=0")
    after = spark.read.parquet(f"{out_dir}/chunks").count()
    assert after == before


def test_stream_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Streaming exact dedup (watermark-bounded state) over a doubled
    event stream must emit exactly the batch-distinct row set."""
    from graphrag_spark.streaming import read_event_stream, stream_dedup

    events_path = str(tmp_path / "dup_events")
    e = spark.read.parquet(f"{sf_dir}/events.parquet").limit(500)
    e.unionAll(e).repartition(4).write.parquet(events_path)  # every row twice

    q = (
        stream_dedup(read_event_stream(spark, events_path), ["event_id"], watermark_col="ts")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_out").count()
    want = spark.read.parquet(events_path).select("event_id").distinct().count()
    assert got == want


def test_register_views_sql_surface(spark, corpus_path):
    """The KG tables must be queryable through plain spark.sql."""
    from graphrag_spark.pipeline import register_views, run_in_memory

    out = run_in_memory(spark, spark.read.parquet(corpus_path))
    views = register_views({"nodes": out["nodes"], "triples": out["triples"]})
    assert set(views) == {"kg_nodes", "kg_triples"}
    row = spark.sql(
        """
        SELECT t.subj, count(*) AS n
        FROM kg_triples t
        JOIN kg_nodes n ON upper(n.name) = upper(t.subj)
        GROUP BY t.subj ORDER BY n DESC, t.subj LIMIT 1
        """
    ).first()
    assert row["n"] >= 1


def test_incremental_fulltext_index_matches_batch(spark, corpus_path, tmp_path):
    """Streaming-maintained index (batch_id=N/tbucket=B accretion) must
    rank queries identically to a one-shot batch build, and the query
    path must still prune on tbucket across batch dirs."""
    from graphrag_spark.chunking import chunk_documents
    from graphrag_spark.corpus import document_text
    from graphrag_spark.graph_query import (
        build_fulltext_postings,
        fulltext_search_index_path,
        write_fulltext_index,
    )
    from graphrag_spark.streaming import incremental_fulltext_index

    inc_dir = str(tmp_path / "ft_inc")
    q = incremental_fulltext_index(
        spark, corpus_path, inc_dir, str(tmp_path / "ckpt_ft"), n_buckets=16
    )
    q.awaitTermination(180)

    batch_dir = str(tmp_path / "ft_batch")
    chunks = chunk_documents(document_text(spark.read.parquet(corpus_path)))
    write_fulltext_index(build_fulltext_postings(chunks), batch_dir, n_buckets=16)

    query = "partnership rollout"
    got = [tuple(r) for r in fulltext_search_index_path(spark, inc_dir, query).collect()]
    want = [tuple(r) for r in fulltext_search_index_path(spark, batch_dir, query).collect()]
    assert got == want and got

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fulltext_search_index_path(spark, inc_dir, query).explain()
    assert "tbucket" in buf.getvalue()


def test_incremental_similarity_edges_match_batch(spark, corpus_path, tmp_path):
    """Edges accreted per micro-batch must equal the one-shot batch
    edge set — valid because J1 candidates are within-document and
    documents arrive whole."""
    from graphrag_spark.chunking import chunk_documents
    from graphrag_spark.corpus import document_text
    from graphrag_spark.graph_ops import chunk_similarity_edges
    from graphrag_spark.streaming import incremental_similarity_edges

    out = str(tmp_path / "sim_edges")
    q = incremental_similarity_edges(
        spark, corpus_path, out, str(tmp_path / "ckpt_sim"), threshold=0.3, k=3
    )
    q.awaitTermination(180)

    chunks = chunk_documents(document_text(spark.read.parquet(corpus_path)))
    want = {
        tuple(r)
        for r in chunk_similarity_edges(chunks, threshold=0.3, k=3).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(out).select("src", "dst", "similarity").collect()
    }
    assert got == want and got


def test_incremental_fulltext_meta_mismatch_raises(spark, tmp_path):
    """ADVICE r3: restarting the fulltext stream with a different
    n_buckets must raise (old batch dirs are bucketed under the old
    modulus; readers would silently drop matches), not overwrite _meta."""
    import pytest as _pytest

    from graphrag_spark.streaming import incremental_fulltext_index

    index_dir = str(tmp_path / "ft_index")
    spark.createDataFrame([(8,)], "n_buckets int").coalesce(1).write.json(
        index_dir + "/_meta"
    )
    with _pytest.raises(ValueError, match="n_buckets=8"):
        incremental_fulltext_index(
            spark,
            str(tmp_path / "stream_src"),
            index_dir,
            str(tmp_path / "ckpt"),
            n_buckets=16,
        )
