from __future__ import annotations

import os

import pytest

from graphrag_spark.corpus import SPANS_SCHEMA, generate_doc_spans
from graphrag_spark.session import get_spark

N_TEST_DOCS = 80


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="graphrag-tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def doc_rows():
    """Deterministic spans docs (python-side) for oracle comparison."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 30
    return [
        (f"doc{i:06d}", generate_doc_spans(i, base))
        for i in range(N_TEST_DOCS)
    ]


@pytest.fixture(scope="session")
def corpus_path(spark, doc_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "documents")
    spark.createDataFrame(doc_rows, SPANS_SCHEMA).repartition(8).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
