"""Structured Streaming surfaces.

The reference has no dataflow streaming (its "streaming" is SSE token
streaming of LLM output — rag/graph_rag.py:285-441; UI concern). For a
complete engine we provide the two streaming shapes the corpus needs:

1. ``windowed_event_stats`` — watermarked tumbling-window aggregation
   over the ``events`` table shape (event_id, ts, user_id, event_type,
   value, props), late data bounded by the watermark.
2. ``incremental_kg_ingest`` — micro-batch incremental KG construction:
   a stream of spans documents flows through the *same* batch stages
   (chunk -> extract -> normalize) via foreachBatch, appending to the
   staged parquet tables. Canonicalization remains a periodic batch job
   (CC is iterative and global — the right architecture is streaming
   extraction + scheduled global canonicalize, not a stateful CC).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from . import chunking, extraction
from .corpus import SPANS_SCHEMA, document_text

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_stats(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window per-event-type stats with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def run_windowed_stats_once(spark: SparkSession, events_path: str, out_table: str = "event_stats") -> DataFrame:
    """availableNow one-shot streaming run into a memory sink (used by
    tests to prove stream/batch equivalence). Complete mode so windows
    newer than the watermark are also emitted on the final trigger."""
    q = (
        windowed_event_stats(read_event_stream(spark, events_path))
        .writeStream.format("memory")
        .queryName(out_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(out_table)


def incremental_kg_ingest(
    spark: SparkSession,
    docs_stream_path: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Stream spans-documents -> per-micro-batch chunk + extract stages,
    appended to parquet. Each micro-batch is the same deterministic
    batch code path (no divergent streaming logic to verify)."""
    stream = (
        spark.readStream.schema(SPANS_SCHEMA).option("maxFilesPerTrigger", 8).parquet(docs_stream_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        chunks = chunking.with_quality(chunking.chunk_documents(document_text(batch_df)))
        extracted = extraction.extract_chunks(chunks)
        chunks.write.mode("append").parquet(f"{out_dir}/chunks")
        extracted.write.mode("append").parquet(f"{out_dir}/extracted")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
