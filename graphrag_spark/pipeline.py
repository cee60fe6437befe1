"""End-to-end KG-construction pipeline with per-stage lineage + resume.

Stage DAG (all DataFrame jobs, each committed to its own parquet dir):

  documents(spans) ──> chunks ──> extracted ──> entities ──> cmap
                                     │                        │
                                     └────────> triples <─────┤
                                                mentions <────┤
                                                nodes    <────┘

Each committed stage appends rows to a ``_lineage`` table (stage,
stage_hash, partition_id, doc_id_min, doc_id_max, row_count,
committed_at). A rerun recomputes a stage only when its stage hash
(params + upstream hash) has no committed match — that is the
kill/resume contract (BASELINE.json north_star; SURVEY.md §4 item 4).

The reference runs this flow per-document with asyncio/threads
(ingestion/document_processor.py:394-750); here every stage is one
distributed job and document parallelism is Spark task parallelism.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import chunking, extraction, linking, materialize, normalize
from .corpus import document_text

LINEAGE_SCHEMA = (
    "stage string, stage_hash string, partition_id int, doc_id_min string, "
    "doc_id_max string, row_count long, committed_at double"
)


def run_in_memory(
    spark: SparkSession,
    docs: DataFrame,
    chunk_size: int = chunking.CHUNK_SIZE,
    overlap: int = chunking.CHUNK_OVERLAP,
    extractor=None,
) -> dict[str, DataFrame]:
    """Checkpoint-free pipeline composition (tests / flagship query):
    same stages as KGPipeline.run but as one lazy DataFrame graph.

    ``extractor`` (r3 VERDICT item 3) plugs a custom extraction stage —
    typically ``extraction.llm_extractor(respond_fn)``, the reference's
    batched LLM call (core/entity_extraction.py:448-472) — in place of
    the deterministic occurrence matcher. A custom extractor is a
    callable ``chunks_df -> DataFrame`` emitting either long-format
    EXTRACT_SCHEMA rows (``output_format = 'long'``, the LLM contract)
    or OCCURRENCE_SCHEMA rows (``output_format = 'occurrences'``).
    The default (None) path is unchanged: ONE Python extraction pass
    emits mention *occurrences* (with positions) and is the only cached
    intermediate; per-chunk entity rows and the quadratic relationship
    expansion are derived relationally (JVM-side, map-side partial
    aggregation) — bit-equivalent to the det_extract contract path
    (tested).

    Long-format extractors route rels through the self-discovering
    normalize_rels + build_triples path: an open-vocabulary LLM may
    emit relationship targets that never appear as entities, so the
    rel surface set cannot be assumed a subset of the mention surface
    map (the occurrence contract guarantees that; an LLM does not)."""
    from .embeddings import embed_chunks

    chunks_base = chunking.with_quality(
        chunking.chunk_documents(document_text(docs), chunk_size, overlap)
    )
    # persisted chunk rows carry their embedding like the reference's
    # chunk nodes (core/graph_db.py:174-203); extraction reads the
    # narrow base columns so the vector never rides through that shuffle
    chunks = chunks_base.join(
        embed_chunks(chunks_base).select("chunk_id", "embedding"), "chunk_id"
    )
    fmt = getattr(extractor, "output_format", "occurrences") if extractor else "occurrences"
    # The extraction cache is persisted ALREADY HASH-PARTITIONED BY
    # chunk_id (r6, guide §2.4 "remove shuffles outright"): every hot
    # consumer clusters on a chunk_id-prefixed key — the per-chunk
    # entity dedup groupBys, the quadratic rels self-join (equi-join on
    # chunk_id: co-partitioned cache sides merge with NO exchange), the
    # per-chunk pair-count aggregation that feeds triples, and the
    # mentions-sink distinct. One up-front exchange of the occurrence
    # rows at cache time replaces one exchange per consumer over the
    # 4x-larger expanded frames (InMemoryRelation preserves the cached
    # plan's output partitioning, verified in plans/r06).
    if fmt == "occurrences":
        if extractor is None:
            # fused chunk+scan pass (r6, guide §4.1): identical
            # occurrence rows, but chunk text never round-trips through
            # the JVM between two MapInPandas stages
            occ = extraction.extract_occurrences_from_docs(
                document_text(docs), chunk_size, overlap
            ).repartition("chunk_id").persist()
        else:
            occ = extractor(chunks_base).repartition("chunk_id").persist()
        mentions_raw = extraction.entities_from_occurrences(occ)
        rels_raw = extraction.rels_from_occurrences(occ)
        extracted = mentions_raw.unionByName(rels_raw)
        # surface map from raw occurrences: same distinct surface set as
        # mentions_raw but skips re-running its groupBy
        smap = normalize.materialize_surface_map(occ)
    else:
        occ = extractor(chunks_base).repartition("chunk_id").persist()
        mentions_raw = occ.filter(F.col("kind") == "entity")
        rels_raw = occ.filter(F.col("kind") == "rel")
        extracted = occ
        smap = normalize.materialize_surface_map(mentions_raw)
    mentions_norm = normalize.normalize_mentions(mentions_raw, smap).persist()
    rels_norm = normalize.normalize_rels(rels_raw, smap if fmt == "occurrences" else None)
    # persisted: canonical_map references this frame THREE times (CC
    # edges, members, reps) across two separate actions — the union-find
    # edge collect materializes the cache once and the cmap
    # materialization then reads it instead of re-running the salted
    # dedup + link chain (~20 AQE jobs -> ~6 at sf0.01, and the 4N-side
    # per-job overhead is exactly where small-amplify scaling
    # efficiency goes; the frame is one row per distinct surface key,
    # i.e. vocabulary-bounded)
    entities = linking.link_entities(
        linking.dedup_entities(mentions_norm), linking.alias_dictionary(spark)
    ).persist()
    cmap = materialize.canonical_map(entities).persist()
    if fmt == "occurrences":
        # triples resolve straight from raw OCCURRENCES via the
        # pre-composed surface->canonical map (r6): resolution is
        # broadcast-joined once below the quadratic pair expansion, the
        # pair-count aggregation keys on dense int surface ids, and no
        # join touches the grouped pair frame at all; rels_norm stays
        # available lazily for consumers of the normalized view
        s2c = materialize.surface_to_canonical_map(smap, cmap)
        triples = materialize.build_triples_from_occurrences(occ, s2c)
    else:
        triples = materialize.build_triples(rels_norm, cmap)
    return {
        "chunks": chunks,
        "extracted": extracted,
        "entities": entities,
        "cmap": cmap,
        "mentions_norm": mentions_norm,
        "rels_norm": rels_norm,
        "nodes": materialize.build_nodes(cmap),
        "mentions": materialize.build_mentions(mentions_norm, cmap),
        "triples": triples,
    }


@dataclass
class KGPipeline:
    spark: SparkSession
    corpus_path: str
    work_dir: str
    chunk_size: int = chunking.CHUNK_SIZE
    chunk_overlap: int = chunking.CHUNK_OVERLAP
    salt_buckets: int = linking.SALT_BUCKETS
    buckets: int = 32
    # Catalog seam: set to e.g. "local.kg" (Iceberg catalog on a real
    # cluster — snapshot-committing V2 writes) or "<db>" on the built-in
    # session catalog (saveAsTable fallback, tested by
    # tests/test_pipeline_pr.py) to write stage tables
    # ("<prefix>.<stage>") instead of raw parquet dirs; see
    # materialize.write_table.
    iceberg_prefix: str | None = None
    # Extractor seam (r3 VERDICT item 3): a callable chunks_df -> rows
    # in EXTRACT_SCHEMA (output_format='long', e.g.
    # extraction.llm_extractor(...)) or OCCURRENCE_SCHEMA
    # (output_format='occurrences'). None = the deterministic matcher.
    # ``extractor_tag`` names the extractor in the stage-hash
    # fingerprint so resume never reuses stages extracted by a
    # different extractor — REQUIRED to change when swapping extractors
    # between runs against the same work_dir.
    extractor: object = None
    extractor_tag: str | None = None
    stage_times: dict[str, float] = field(default_factory=dict)

    # ------------------------------------------------------------------ util

    def _path(self, stage: str) -> str:
        return os.path.join(self.work_dir, stage)

    def _lineage_path(self) -> str:
        return os.path.join(self.work_dir, "_lineage")

    def _params_fingerprint(self) -> str:
        return json.dumps(
            {
                "chunk_size": self.chunk_size,
                "chunk_overlap": self.chunk_overlap,
                "salt_buckets": self.salt_buckets,
                "corpus": self.corpus_path,
                "extractor": self.extractor_tag
                or ("det" if self.extractor is None else "custom"),
                "v": 3,  # v3: extracted stage commits narrow occurrence rows
            },
            sort_keys=True,
        )

    def stage_hash(self, stage: str, upstream: str) -> str:
        return hashlib.md5(f"{stage}|{upstream}|{self._params_fingerprint()}".encode()).hexdigest()

    def _fs_exists(self, path: str) -> bool:
        """Existence check via the Hadoop FileSystem API — honors the
        path's scheme (file://, s3a://, hdfs://), unlike os.path.exists
        which silently returns False for object stores and would
        degrade resume to full recompute on a cluster."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def _committed(self) -> dict[str, str]:
        """stage -> most recently committed stage_hash.

        Lineage is append-only: a stage recomputed under different
        params leaves both hashes in the table. Resolving by latest
        committed_at pins resume to the hash that matches the data
        actually sitting in the stage dir (the newest write), so
        reverting params can never silently reuse stale output."""
        try:
            rows = (
                self.spark.read.parquet(self._lineage_path())
                .groupBy("stage")
                .agg(F.max_by("stage_hash", "committed_at").alias("stage_hash"))
                .collect()
            )
        except Exception:
            return {}
        return {r["stage"]: r["stage_hash"] for r in rows}

    def _commit(self, stage: str, stage_hash: str, df: DataFrame, doc_col: str | None, table: str | None = None) -> None:
        """Append per-partition lineage rows for a just-written stage."""
        out = self._read_stage(self._path(stage), table)
        if doc_col is not None and doc_col in out.columns:
            stats = out.groupBy(F.spark_partition_id().alias("partition_id")).agg(
                F.min(doc_col).alias("doc_id_min"),
                F.max(doc_col).alias("doc_id_max"),
                F.count("*").alias("row_count"),
            )
        else:
            stats = out.agg(F.count("*").alias("row_count")).select(
                F.lit(-1).alias("partition_id"),
                F.lit(None).cast("string").alias("doc_id_min"),
                F.lit(None).cast("string").alias("doc_id_max"),
                "row_count",
            )
        now = float(time.time())
        lineage = stats.select(
            F.lit(stage).alias("stage"),
            F.lit(stage_hash).alias("stage_hash"),
            "partition_id",
            "doc_id_min",
            "doc_id_max",
            "row_count",
            F.lit(now).alias("committed_at"),
        )
        lineage.write.mode("append").parquet(self._lineage_path())

    def _run_stage(
        self,
        stage: str,
        upstream_hash: str,
        build,
        doc_col: str | None = "doc_id",
        resume: bool = True,
        partition_by: list[str] | None = None,
        bucket_col: str | None = None,
    ) -> tuple[DataFrame, str]:
        h = self.stage_hash(stage, upstream_hash)
        path = self._path(stage)
        table = f"{self.iceberg_prefix}.{stage}" if self.iceberg_prefix else None
        if resume and self._committed().get(stage) == h and self._stage_output_exists(path, table):
            return self._read_stage(path, table), h
        t0 = time.time()
        df = build()
        # single writer seam (hash-bucket layout + optional Iceberg)
        materialize.write_table(
            df, path, partition_by=partition_by,
            buckets=self.buckets if bucket_col else None,
            bucket_col=bucket_col, iceberg_table=table,
        )
        self._commit(stage, h, df, doc_col, table)
        self.stage_times[stage] = time.time() - t0
        return self._read_stage(path, table), h

    def _read_stage(self, path: str, table: str | None) -> DataFrame:
        if table is not None:
            return self.spark.read.table(table)
        return self.spark.read.parquet(path)

    def _stage_output_exists(self, path: str, table: str | None) -> bool:
        if table is not None:
            return bool(self.spark.catalog.tableExists(table))
        return self._fs_exists(os.path.join(path, "_SUCCESS"))

    # ---------------------------------------------------------------- stages

    def run(self, resume: bool = True) -> dict[str, DataFrame]:
        spark = self.spark
        docs = spark.read.parquet(self.corpus_path)

        from .embeddings import embed_chunks

        def _build_chunks() -> DataFrame:
            base = chunking.with_quality(
                chunking.chunk_documents(document_text(docs), self.chunk_size, self.chunk_overlap)
            )
            # stored chunk rows carry their embedding (reference
            # core/graph_db.py:174-203); downstream stages that don't
            # need the vector are protected by parquet column pruning
            return base.join(embed_chunks(base).select("chunk_id", "embedding"), "chunk_id")

        chunks, h_chunks = self._run_stage("chunks", "root", _build_chunks, resume=resume)

        # occurrence rows are the checkpointed extraction artifact —
        # ~5x fewer rows than the long entity+rel format, and the rel
        # expansion is re-derived relationally on resume. A custom
        # extractor (the seam) replaces this stage; its committed rows
        # are whatever format it emits, tagged into the stage hash.
        extract_fn = self.extractor or extraction.extract_occurrences
        fmt = getattr(self.extractor, "output_format", "occurrences") if self.extractor else "occurrences"
        extracted, h_ex = self._run_stage(
            "extracted", h_chunks, lambda: extract_fn(chunks), resume=resume
        )

        if fmt == "occurrences":
            mentions_raw = extraction.entities_from_occurrences(extracted)
            rels_raw = extraction.rels_from_occurrences(extracted)
            smap = normalize.materialize_surface_map(extracted)
        else:
            mentions_raw = extracted.filter(F.col("kind") == "entity")
            rels_raw = extracted.filter(F.col("kind") == "rel")
            smap = normalize.materialize_surface_map(mentions_raw)
        mentions_norm = normalize.normalize_mentions(mentions_raw, smap)

        entities, h_ent = self._run_stage(
            "entities",
            h_ex,
            lambda: linking.link_entities(
                linking.dedup_entities(mentions_norm, self.salt_buckets),
                linking.alias_dictionary(spark),
            ),
            doc_col=None,
            resume=resume,
        )

        cmap, h_cmap = self._run_stage(
            "cmap", h_ent, lambda: materialize.canonical_map(entities), doc_col=None, resume=resume
        )

        nodes, _ = self._run_stage(
            "nodes", h_cmap, lambda: materialize.build_nodes(cmap), doc_col=None, resume=resume,
            partition_by=["entity_type"],
        )
        # broadcast the canonical map only while it provably fits —
        # with an open-vocabulary extractor the map grows with distinct
        # entities and a forced broadcast would OOM at corpus scale
        bc_map = cmap.count() <= materialize.BROADCAST_MAP_MAX_ROWS
        mentions, _ = self._run_stage(
            "mentions", h_cmap,
            lambda: materialize.build_mentions(mentions_norm, cmap, broadcast_map=bc_map),
            resume=resume, bucket_col="entity_id",
        )
        # fused surface->canonical resolution (2 joins instead of 4 over
        # the pair frame); s2c inherits smap's materialization state so
        # the open-vocabulary fallback stays a shuffle join. Composed
        # inside the stage lambda so a resume hit skips its collect.
        # Long-format (LLM) extractors take the self-discovering
        # normalize_rels path instead: their rel targets need not be a
        # subset of the mention surface map (see run_in_memory).
        if fmt == "occurrences":
            build_triples = lambda: materialize.build_triples_from_occurrences(  # noqa: E731
                extracted, materialize.surface_to_canonical_map(smap, cmap), broadcast_map=bc_map
            )
        else:
            build_triples = lambda: materialize.build_triples(  # noqa: E731
                normalize.normalize_rels(rels_raw), cmap, broadcast_map=bc_map
            )
        triples, _ = self._run_stage(
            "triples", h_cmap, build_triples,
            doc_col=None, resume=resume, bucket_col="subj",
        )

        return {
            "chunks": chunks,
            "extracted": extracted,
            "entities": entities,
            "cmap": cmap,
            "nodes": nodes,
            "mentions": mentions,
            "triples": triples,
        }


def register_views(tables: dict[str, DataFrame], prefix: str = "kg_") -> list[str]:
    """Expose the KG tables to the Spark SQL surface as temp views
    (``kg_nodes``, ``kg_triples``, ...), so every reference query has a
    plain-SQL entry point (``spark.sql("SELECT ... FROM kg_triples")``)
    optimized by Catalyst exactly like the DataFrame API."""
    names = []
    for name, df in tables.items():
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        names.append(view)
    return names
