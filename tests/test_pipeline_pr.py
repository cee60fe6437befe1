"""End-to-end triple P/R harness (SURVEY.md §5.2 item 4) + resume tests
(item 6): the Spark pipeline must match the pure-Python reference-port
oracle with P/R >= 0.95 (BASELINE.json gate; in practice we hold 1.0),
and a rerun must skip committed stages and produce identical tables."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from graphrag_spark.oracle.refport import precision_recall, run_oracle, triple_keys
from graphrag_spark.pipeline import KGPipeline


@pytest.fixture(scope="module")
def pipeline_out(spark, corpus_path, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("work"))
    p = KGPipeline(spark, corpus_path, wd)
    out = p.run()
    return p, out, wd


def test_triple_pr_vs_oracle(pipeline_out, doc_rows):
    _, out, _ = pipeline_out
    ours = triple_keys(
        [r.asDict() for r in out["triples"].select("subj", "pred", "obj").collect()]
    )
    ref = triple_keys(run_oracle(doc_rows).triples)
    p, r = precision_recall(ours, ref)
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_nodes_match_oracle_entities(pipeline_out, doc_rows):
    _, out, _ = pipeline_out
    oracle = run_oracle(doc_rows)
    got = {r["name"].upper() for r in out["nodes"].select("name").collect()}
    want = {oracle.cmap[k].upper() for k, _etype in oracle.entities}
    inter = len(got & want)
    assert inter / max(len(got), 1) >= 0.95
    assert inter / max(len(want), 1) >= 0.95


def test_persisted_embedding_columns(pipeline_out):
    """Stored chunks and nodes carry an embedding column like the
    reference's chunk/entity nodes (core/graph_db.py:174-203, 799-829),
    so query-time similarity reads stored vectors."""
    from graphrag_spark.embeddings import EMBED_DIM

    _, out, _ = pipeline_out
    for table in ("chunks", "nodes"):
        assert "embedding" in out[table].columns, table
        row = out[table].select(F.size("embedding").alias("d")).first()
        assert row["d"] == EMBED_DIM, table


def test_lineage_written(pipeline_out, spark):
    _, _, wd = pipeline_out
    lin = spark.read.parquet(os.path.join(wd, "_lineage"))
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"chunks", "extracted", "entities", "cmap", "nodes", "mentions", "triples"} <= stages
    assert lin.filter(F.col("row_count") <= 0).count() == 0
    # chunks lineage carries doc ranges for partition-level resume audits
    chunk_rows = lin.filter(F.col("stage") == "chunks").collect()
    assert any(r["doc_id_min"] is not None for r in chunk_rows)


def test_resume_skips_committed_stages(pipeline_out, spark, corpus_path):
    p, out, wd = pipeline_out
    before = {r["stage"]: r["committed_at"] for r in spark.read.parquet(os.path.join(wd, "_lineage")).collect()}
    p2 = KGPipeline(spark, corpus_path, wd)
    out2 = p2.run()
    # no stage re-ran: no new lineage commits
    after_df = spark.read.parquet(os.path.join(wd, "_lineage"))
    assert after_df.count() == len(
        [1 for _ in spark.read.parquet(os.path.join(wd, "_lineage")).collect()]
    )
    assert p2.stage_times == {}, f"stages re-ran: {p2.stage_times}"
    assert out2["triples"].count() == out["triples"].count()


def test_resume_recomputes_after_kill(pipeline_out, spark, corpus_path, tmp_path_factory):
    """Simulated kill: copy work dir, destroy a late stage + its lineage,
    rerun -> only downstream stages recompute, final triples identical."""
    p, out, wd = pipeline_out
    wd2 = str(tmp_path_factory.mktemp("work_resume"))
    shutil.copytree(wd, wd2, dirs_exist_ok=True)
    # drop the triples stage output (simulates dying mid-write)
    shutil.rmtree(os.path.join(wd2, "triples"))
    lin = spark.read.parquet(os.path.join(wd2, "_lineage")).filter(F.col("stage") != "triples")
    lin_rows = lin.collect()
    shutil.rmtree(os.path.join(wd2, "_lineage"))
    spark.createDataFrame(lin_rows, lin.schema).write.parquet(os.path.join(wd2, "_lineage"))

    p3 = KGPipeline(spark, corpus_path, wd2)
    out3 = p3.run()
    assert set(p3.stage_times) == {"triples"}, f"unexpected recompute: {p3.stage_times}"
    a = {tuple(r) for r in out["triples"].select("subj", "pred", "obj", "strength").collect()}
    b = {tuple(r) for r in out3["triples"].select("subj", "pred", "obj", "strength").collect()}
    assert a == b


def test_resume_param_revert_recomputes(spark, corpus_path, tmp_path_factory):
    """Append-only lineage holds BOTH hashes after a stage is recomputed
    under different params. Reverting params must NOT hash-match the
    stale commit (the stage dir holds the newer run's output): resume
    has to re-run the stage, and the final output must equal a fresh
    run at the reverted params."""
    wd = str(tmp_path_factory.mktemp("work_revert"))
    out1 = KGPipeline(spark, corpus_path, wd, chunk_size=1000).run()
    n1 = out1["chunks"].count()

    out2 = KGPipeline(spark, corpus_path, wd, chunk_size=500).run()
    n2 = out2["chunks"].count()
    assert n2 != n1  # params actually changed the output

    p3 = KGPipeline(spark, corpus_path, wd, chunk_size=1000)
    out3 = p3.run()
    assert "chunks" in p3.stage_times, "stale lineage hash silently reused"
    assert out3["chunks"].count() == n1


def test_hub_entities_exist(pipeline_out):
    """Zipfian injection must produce real hub skew (exercises the
    salted aggregation path meaningfully)."""
    _, out, _ = pipeline_out
    top = (
        out["nodes"].orderBy(F.desc("n_mentions")).select("n_mentions").limit(1).collect()[0][0]
    )
    med = out["nodes"].approxQuantile("n_mentions", [0.5], 0.01)[0]
    assert top >= 20 * max(med, 1), f"no hub skew: top={top} median={med}"


def test_non_broadcast_map_path_identical(spark, corpus_path):
    """With the broadcast hint off and auto-broadcast disabled, the
    mention/triple joins must take the shuffle path and produce
    identical output — proves the conditional-broadcast fallback
    (the 100 TB open-vocabulary posture) is correct."""
    import contextlib
    import io

    from graphrag_spark import materialize
    from graphrag_spark.pipeline import run_in_memory

    docs = spark.read.parquet(corpus_path)
    out = run_in_memory(spark, docs)
    with_bc = {
        (r["subj"], r["pred"], r["obj"])
        for r in out["triples"].select("subj", "pred", "obj").collect()
    }
    def plan_broadcasts(df) -> int:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue().count("BroadcastHashJoin")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = materialize.build_triples(out["rels_norm"], out["cmap"], broadcast_map=True)
        t = materialize.build_triples(out["rels_norm"], out["cmap"], broadcast_map=False)
        # exactly the two cmap-side joins stop broadcasting; the
        # explicitly-bounded surface/alias map broadcasts upstream of
        # rels_norm/cmap legitimately remain
        assert plan_broadcasts(t) == plan_broadcasts(hinted) - 2
        without_bc = {(r["subj"], r["pred"], r["obj"]) for r in t.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert with_bc == without_bc


def test_catalog_backend_pipeline_and_resume(spark, corpus_path, tmp_path_factory):
    """The catalog seam, exercised end to end on the built-in session
    catalog (saveAsTable fallback of materialize.write_table): same
    triples as the parquet path, stage tables in the catalog, and a
    rerun skips every committed stage."""
    wd = str(tmp_path_factory.mktemp("work_cat"))
    spark.sql("CREATE DATABASE IF NOT EXISTS kgcat")
    try:
        p = KGPipeline(spark, corpus_path, wd, iceberg_prefix="kgcat")
        out = p.run()
        assert spark.catalog.tableExists("kgcat.triples")
        assert spark.catalog.tableExists("kgcat.nodes")
        n_triples = out["triples"].count()
        assert n_triples > 0
        # table-backed resume: all stages skipped, identical table
        p2 = KGPipeline(spark, corpus_path, wd, iceberg_prefix="kgcat")
        out2 = p2.run()
        assert p2.stage_times == {}
        assert out2["triples"].count() == n_triples
        # parity with the parquet path
        wd_pq = str(tmp_path_factory.mktemp("work_pq"))
        out_pq = KGPipeline(spark, corpus_path, wd_pq).run()
        t_cat = {tuple(r) for r in out["triples"].select("subj", "pred", "obj").collect()}
        t_pq = {tuple(r) for r in out_pq["triples"].select("subj", "pred", "obj").collect()}
        assert t_cat == t_pq
    finally:
        spark.sql("DROP DATABASE IF EXISTS kgcat CASCADE")


def test_fused_triples_equivalent(spark, corpus_path):
    """r3 VERDICT item 2: the fused surface->canonical resolution (2
    broadcast joins over the pair frame) must be row-identical to the
    two-step normalize_rels + build_triples path on every column."""
    from graphrag_spark import materialize
    from graphrag_spark.pipeline import run_in_memory

    out = run_in_memory(spark, spark.read.parquet(corpus_path))
    fused = {
        (r["subj"], r["pred"], r["obj"]): (
            r["strength"], tuple(r["source_chunks"]), r["n_observations"]
        )
        for r in out["triples"].collect()
    }
    legacy_df = materialize.build_triples(out["rels_norm"], out["cmap"])
    legacy = {
        (r["subj"], r["pred"], r["obj"]): (
            r["strength"], tuple(r["source_chunks"]), r["n_observations"]
        )
        for r in legacy_df.collect()
    }
    assert fused == legacy


def test_occurrence_fused_triples_equivalent(spark, corpus_path):
    """r6: build_triples_from_occurrences (resolution below the pair
    expansion, int-keyed pair counts) must be row-identical on every
    column to the composition it replaces
    (rels_from_occurrences -> build_triples_fused)."""
    from graphrag_spark import chunking, extraction, linking, materialize, normalize
    from graphrag_spark.pipeline import document_text

    docs = spark.read.parquet(corpus_path)
    chunks = chunking.with_quality(chunking.chunk_documents(document_text(docs)))
    occ = extraction.extract_occurrences(chunks).persist()
    smap = normalize.materialize_surface_map(occ)
    mentions_norm = normalize.normalize_mentions(
        extraction.entities_from_occurrences(occ), smap
    )
    entities = linking.link_entities(
        linking.dedup_entities(mentions_norm), linking.alias_dictionary(spark)
    )
    cmap = materialize.canonical_map(entities)
    s2c = materialize.surface_to_canonical_map(smap, cmap)

    def key(r):
        return (
            r["subj"], r["pred"], r["obj"], r["strength"],
            tuple(r["source_chunks"]), r["n_observations"],
        )

    a = sorted(map(key, materialize.build_triples_from_occurrences(occ, s2c).collect()))
    b = sorted(
        map(
            key,
            materialize.build_triples_fused(
                extraction.rels_from_occurrences(occ), s2c
            ).collect(),
        )
    )
    occ.unpersist()
    assert a and a == b


def test_surface_map_cap_fallback(spark, corpus_path, monkeypatch):
    """r3 VERDICT item 5: past the materialization cap the pipeline
    degrades to shuffle joins (flagged, warned) instead of aborting —
    and produces identical triples."""
    import warnings

    from graphrag_spark import normalize
    from graphrag_spark.pipeline import run_in_memory

    docs = spark.read.parquet(corpus_path)
    want = {
        (r["subj"], r["pred"], r["obj"])
        for r in run_in_memory(spark, docs)["triples"].select("subj", "pred", "obj").collect()
    }

    monkeypatch.setattr(normalize, "_MAX_SURFACE_MAP_ROWS", 5)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = run_in_memory(spark, docs)
        smap_like = out["triples"]
        got = {
            (r["subj"], r["pred"], r["obj"])
            for r in smap_like.select("subj", "pred", "obj").collect()
        }
    assert any("exceeds 5 rows" in str(w.message) for w in rec)
    assert got == want


def test_pluggable_llm_extractor_pr(spark, corpus_path, doc_rows, tmp_path_factory):
    """r3 VERDICT item 3: plugging a response-function extractor
    (extraction.llm_extractor) into BOTH pipeline entry points passes
    the P/R harness; the long-format route produces the same triples
    as the deterministic occurrence route."""
    from graphrag_spark.extraction import llm_extractor
    from graphrag_spark.pipeline import run_in_memory

    def _fake_llm(prompt: str) -> str:
        # Test 'LLM': recovers the chunk text from the reference prompt
        # template and answers with the deterministic extractor's
        # pipe-format response, exercising the whole prompt -> response
        # -> parse contract path. Nested so cloudpickle ships it BY
        # VALUE to executors (a test-module global would be pickled by
        # reference to a module workers can't import).
        from graphrag_spark.extraction import det_extract_response

        text = prompt.split("**Text to analyze**:\n", 1)[1].rsplit("\n\n**Output**:", 1)[0]
        return det_extract_response(text)

    docs = spark.read.parquet(corpus_path)
    out = run_in_memory(spark, docs, extractor=llm_extractor(_fake_llm))
    ours = triple_keys(
        [r.asDict() for r in out["triples"].select("subj", "pred", "obj").collect()]
    )
    ref = triple_keys(run_oracle(doc_rows).triples)
    p, r = precision_recall(ours, ref)
    assert (p, r) == (1.0, 1.0), (p, r)

    # staged pipeline through the same seam (+ resume under the tag)
    wd = str(tmp_path_factory.mktemp("work_llm"))
    pl = KGPipeline(
        spark, corpus_path, wd,
        extractor=llm_extractor(_fake_llm), extractor_tag="fake-llm",
    )
    out2 = pl.run()
    t1 = {(x["subj"], x["pred"], x["obj"]) for x in out["triples"].select("subj", "pred", "obj").collect()}
    t2 = {(x["subj"], x["pred"], x["obj"]) for x in out2["triples"].select("subj", "pred", "obj").collect()}
    assert t1 == t2
    pl2 = KGPipeline(
        spark, corpus_path, wd,
        extractor=llm_extractor(_fake_llm), extractor_tag="fake-llm",
    )
    pl2.run()
    assert pl2.stage_times == {}, "resume under the extractor tag must skip all stages"


def test_fused_triples_skips_broadcast_past_cap(spark):
    """Round 5 (r4 ADVICE): when the composed surface->canonical map
    fell back past the driver-materialization cap (flagged
    _graphrag_materialized=False), build_triples_fused must NOT force a
    broadcast of the unbounded map, regardless of broadcast_map."""
    from graphrag_spark import materialize

    rels = spark.createDataFrame(
        [("a", "b", 0.9, "d", "c1")],
        "name string, type_or_target string, score double, description string, chunk_id string",
    )
    s2c = spark.createDataFrame(
        [("a", "Alpha"), ("b", "Beta")], "surface string, canonical_name string"
    )
    s2c._graphrag_materialized = False
    analyzed = (
        materialize.build_triples_fused(rels, s2c, broadcast_map=True)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ResolvedHint" not in analyzed

    s2c_ok = spark.createDataFrame(
        [("a", "Alpha"), ("b", "Beta")], "surface string, canonical_name string"
    )
    analyzed_ok = (
        materialize.build_triples_fused(rels, s2c_ok, broadcast_map=True)
        ._jdf.queryExecution().analyzed().toString()
    )
    assert "ResolvedHint" in analyzed_ok
