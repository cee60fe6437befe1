"""Text analysis operators (native expressions)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from graphrag_spark.textstats import (
    document_profile,
    fingerprint,
    lang_id,
    minshingle_fingerprint,
    token_count_bpe,
    token_count_ws,
)


@pytest.fixture(scope="module")
def texts_df(spark):
    rows = [
        (1, "the cat and the dog sat on the mat in the sun"),
        (2, "der hund und die katze sind nicht mit der maus"),
        (3, "le chat et la souris sont dans la maison pour le dîner"),
        (4, "el perro y el gato no son una amenaza para los pájaros"),
        (5, "zzz qqq www"),
        (6, "Hello, world! It's a test."),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def test_lang_id(spark, texts_df):
    got = {r["id"]: r["lang"] for r in texts_df.select("id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "und"


def test_token_counts(spark, texts_df):
    r = texts_df.filter("id = 6").select(
        token_count_ws(F.col("text")).alias("ws"),
        token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()[0]
    # "Hello, world! It's a test." -> 5 ws tokens
    assert r["ws"] == 5
    # bpe-ish: Hello , world ! It ' s a test . -> 10
    assert r["bpe"] == 10


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Some  Text\nHere"), (2, "some text here"), (3, " SOME TEXT HERE ")],
        "id int, text string",
    )
    fps = [r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_minshingle_fingerprint_stability(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h")], "id int, text string")
    a = df.select(minshingle_fingerprint(F.col("text")).alias("m")).collect()[0]["m"]
    b = df.select(minshingle_fingerprint(F.col("text")).alias("m")).collect()[0]["m"]
    assert a == b and a is not None


def test_document_profile_shape(spark, texts_df):
    prof = document_profile(texts_df)
    rows = prof.collect()
    assert {"tokens_ws", "tokens_bpe", "lang_detected", "quality", "fp"} <= set(prof.columns)
    for r in rows:
        assert 0.0 <= r["quality"] <= 1.0
