"""spark-submit entrypoint for the KG-construction pipeline.

Cluster usage (BASELINE.json packaging contract):

    python tools/make_pyfiles.py              # builds kgpipe.zip
    spark-submit --py-files kgpipe.zip run_pipeline.py \
        --flat-docs s3://.../documents.parquet \
        --work-dir  s3://.../kg_work \
        --master    yarn

Local sandbox:

    python run_pipeline.py --flat-docs /root/testdata/sf0.1/documents.parquet \
        --work-dir /tmp/kg_work --master 'local[32]'

The job is resumable: rerunning with the same work dir skips every
stage whose lineage hash is already committed.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from graphrag_spark.corpus import write_corpus
from graphrag_spark.pipeline import KGPipeline
from graphrag_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flat-docs", required=True, help="flat documents.parquet (doc_id,text)")
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument(
        "--catalog-prefix",
        default=None,
        help="write stage tables to '<prefix>.<stage>' instead of raw "
        "parquet dirs: an Iceberg catalog name+namespace on a real "
        "cluster (snapshot-committing V2 writes), or a session-catalog "
        "database (saveAsTable fallback; created if missing)",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="graphrag-kg-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    corpus_path = os.path.join(args.work_dir, "corpus")
    # Hadoop FS existence check: honors s3a://, hdfs:// work dirs (the
    # os.path.exists shortcut is always False there and would rewrite
    # the corpus on every run)
    jvm = spark._jvm
    success = jvm.org.apache.hadoop.fs.Path(os.path.join(corpus_path, "_SUCCESS"))
    fs = success.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(success):
        write_corpus(spark, args.flat_docs, corpus_path, buckets=args.buckets)

    if args.catalog_prefix and "." not in args.catalog_prefix:
        # bare database name on the session catalog
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {args.catalog_prefix}")

    t0 = time.time()
    pipe = KGPipeline(
        spark,
        corpus_path,
        os.path.join(args.work_dir, "work"),
        buckets=args.buckets,
        iceberg_prefix=args.catalog_prefix,
    )
    out = pipe.run(resume=not args.no_resume)
    n_triples = out["triples"].count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "triples": n_triples,
                "nodes": out["nodes"].count(),
                "wall_sec": round(wall, 2),
                "triples_per_sec": round(n_triples / max(wall, 1e-9), 1),
                "stage_times": {k: round(v, 2) for k, v in pipe.stage_times.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
