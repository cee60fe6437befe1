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
