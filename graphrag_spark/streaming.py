"""Structured Streaming surfaces.

The reference has no dataflow streaming (its "streaming" is SSE token
streaming of LLM output — rag/graph_rag.py:285-441; UI concern). For a
complete engine we provide the two streaming shapes the corpus needs:

1. ``windowed_event_stats`` — watermarked tumbling-window aggregation
   over the ``events`` table shape (event_id, ts, user_id, event_type,
   value, props), late data bounded by the watermark.
2. ``sessionize_events`` — custom stateful operator
   (``applyInPandasWithState``): per-user inactivity-gap sessions with
   event-time timeouts.
3. ``incremental_kg_ingest`` — micro-batch incremental KG construction:
   a stream of spans documents flows through the *same* batch stages
   (chunk -> extract -> normalize) via foreachBatch, appending to the
   staged parquet tables. Canonicalization remains a periodic batch job
   (CC is iterative and global — the right architecture is streaming
   extraction + scheduled global canonicalize, not a stateful CC).
4. ``incremental_fulltext_index`` / ``incremental_similarity_edges`` —
   index/edge-set MAINTENANCE under append: new documents' posting
   lists and within-doc SIMILAR_TO edges accrete per micro-batch in
   idempotent batch_id dirs, so neither artifact is ever rebuilt from
   the corpus (the 100 TB posture; the reference instead re-scans via
   its backfill CLI, scripts/create_similarities.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.errors import AnalysisException
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


SESSION_GAP_SECONDS = 30 * 60

SESSION_STATE_SCHEMA = "start double, last double, n long, total double"
SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)


def sessionize_events(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Custom stateful operator: per-user session windows with an
    inactivity gap, via ``applyInPandasWithState`` — the pattern for
    stateful semantics Spark's built-in windowed aggs can't express.
    Emits a row per closed session; open sessions close on state
    timeout (event-time + watermark)."""
    import pandas as pd  # noqa: F401  (worker-side import)
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        user_id = key[0]
        if state.hasTimedOut:
            (start, last, n, total) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(int(round(start * 1e6)), unit="us")],
                    "session_end": [pd.Timestamp(int(round(last * 1e6)), unit="us")],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )
            return
        rows = []
        ts_val = []
        for pdf in pdf_iter:
            ts_val.extend(
                zip((pdf["ts"].astype("int64") / 1e9).tolist(), pdf["value"].tolist())
            )
        ts_val.sort()
        cur = state.get if state.exists else None
        for t, v in ts_val:
            if cur is None:
                cur = (float(t), float(t), 1, float(v))
            elif t - cur[1] > gap_seconds:
                rows.append(cur)
                cur = (float(t), float(t), 1, float(v))
            else:
                cur = (cur[0], float(t), cur[2] + 1, cur[3] + float(v))
        if cur is not None:
            state.update(cur)
            # timeout must be strictly beyond the current watermark
            timeout_ms = max(
                int((cur[1] + gap_seconds) * 1000), state.getCurrentWatermarkMs() + 1000
            )
            state.setTimeoutTimestamp(timeout_ms)
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "session_start": [pd.Timestamp(int(round(r[0] * 1e6)), unit="us") for r in rows],
                    "session_end": [pd.Timestamp(int(round(r[1] * 1e6)), unit="us") for r in rows],
                    "n_events": [r[2] for r in rows],
                    "total_value": [round(r[3], 2) for r in rows],
                }
            )

    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedup(
    stream: DataFrame,
    key_cols: list[str],
    watermark_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of dedup.exact_dedup.

    With ``watermark_col`` set, uses ``dropDuplicatesWithinWatermark``
    so the dedup state is BOUNDED by the watermark horizon (the 100 TB
    posture: an unbounded seen-set would grow with the stream forever);
    duplicates arriving within the delay window are suppressed,
    later-than-watermark replays are the source's responsibility (e.g.
    the idempotent batch_id sink below). Without a watermark column it
    falls back to exact unbounded dropDuplicates (test scale only)."""
    if watermark_col is not None:
        return stream.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(key_cols)
    return stream.dropDuplicates(key_cols)


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
        # Idempotent sink: foreachBatch offers at-least-once delivery —
        # a micro-batch retried after a crash re-runs with the SAME
        # batch_id, so each batch writes its own batch_id=N partition
        # dir with overwrite semantics. A retry replaces its own output
        # instead of appending duplicates (exactly-once end to end).
        chunks = chunking.with_quality(chunking.chunk_documents(document_text(batch_df)))
        extracted = extraction.extract_chunks(chunks)
        for name, df in (("chunks", chunks), ("extracted", extracted)):
            df.write.mode("overwrite").parquet(f"{out_dir}/{name}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_fulltext_index(
    spark: SparkSession,
    docs_stream_path: str,
    index_dir: str,
    checkpoint_dir: str,
    n_buckets: int | None = None,
) -> StreamingQuery:
    """Streaming maintenance of the persisted fulltext index — at
    corpus scale the index is never rebuilt, it accretes: each
    micro-batch chunks its documents, builds their posting lists, and
    writes them in the SAME ``tbucket=<b>/`` term-hash layout as
    ``graph_query.write_fulltext_index``, under an idempotent
    ``batch_id=<n>/`` prefix (a retried micro-batch overwrites its own
    partition instead of appending duplicates — same exactly-once
    recipe as ``incremental_kg_ingest``).

    Readers need no rebuild step: ``fulltext_search_index_path`` prunes
    on the ``tbucket`` partition column across every batch dir (Spark's
    partition discovery handles the two-level batch_id/tbucket layout)
    and drops the extra ``batch_id`` column. Duplicate documents across
    batches would duplicate postings — feed the stream through
    ``stream_dedup`` upstream when the source can replay.

    ``_meta`` (the pruning modulus) is written once at FIRST setup and
    validated on every restart: existing batch dirs are bucketed under
    the original modulus, so restarting with a different ``n_buckets``
    would silently drop matches for readers pruning with the new one —
    a mismatch raises instead of overwriting."""
    from .graph_query import N_TERM_BUCKETS, build_fulltext_postings

    nb = int(n_buckets or N_TERM_BUCKETS)
    # only a MISSING _meta means "fresh index" — a corrupt file or a
    # permission error must propagate, not silently bypass the
    # n_buckets mismatch guard below by overwriting _meta
    try:
        existing = spark.read.json(index_dir + "/_meta").collect()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        existing = []
    if existing:
        old_nb = int(existing[0]["n_buckets"])
        if old_nb != nb:
            raise ValueError(
                f"incremental_fulltext_index: index at {index_dir} was built "
                f"with n_buckets={old_nb}; restarting with n_buckets={nb} "
                "would misbucket existing batches (readers prune with one "
                "modulus). Rebuild the index or pass the original value."
            )
    else:
        spark.createDataFrame([(nb,)], "n_buckets int").coalesce(1).write.mode(
            "overwrite"
        ).json(index_dir + "/_meta")

    stream = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(docs_stream_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        chunks = chunking.chunk_documents(document_text(batch_df))
        postings = build_fulltext_postings(chunks).withColumn(
            "tbucket", F.pmod(F.xxhash64("term"), F.lit(nb)).cast("int")
        )
        postings.repartition("tbucket").sortWithinPartitions("term").write.mode(
            "overwrite"
        ).partitionBy("tbucket").parquet(f"{index_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def incremental_similarity_edges(
    spark: SparkSession,
    docs_stream_path: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.7,
    k: int = 5,
) -> StreamingQuery:
    """Streaming twin of the similarity backfill CLI
    (scripts/create_similarities.py + core/graph_db.py:239-341): J1
    SIMILAR_TO edges are WITHIN-document, and streamed documents arrive
    whole, so each micro-batch computes its own documents' edges with
    the exact batch operator (graph_ops.chunk_similarity_edges) and
    appends them under an idempotent ``batch_id=<n>/`` dir — the edge
    set stays current without ever re-scanning the corpus, and a
    retried micro-batch replaces its own output.

    Readers union the batch dirs (``spark.read.parquet(out_dir)``);
    per-chunk top-k holds globally because a chunk's candidate set
    (its document's other chunks) is fully contained in its batch."""
    from .graph_ops import chunk_similarity_edges

    stream = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(docs_stream_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        chunks = chunking.chunk_documents(document_text(batch_df))
        edges = chunk_similarity_edges(chunks, threshold=threshold, k=k)
        edges.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
