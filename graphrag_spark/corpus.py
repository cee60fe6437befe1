"""Deterministic interleaved-document spans corpus generator.

Builds the BASELINE.json input_hint table
``documents(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``
as a *distributed Spark job* (mapInPandas over the driver-provided flat
``documents.parquet``), so corpus generation itself scales: each row is
generated from an RNG seeded only by (SEED, doc_id) — embarrassingly
parallel, no driver-side loop, no collect.

Interleaving semantics mirror the reference's OCR page loop
(core/ocr.py:739-817): ordered text spans interleaved with media spans,
array order = reading order, media spans carry an opaque ``media_ref``
and empty text. Entity mentions are injected from the seeded vocabulary
(vocab.py) with Zipfian frequency so hub-entity skew is real
(SURVEY.md §4: exercises salted aggregation).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from .vocab import SEED, aliases_by_entity, build_vocabulary

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)
SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

MEDIA_KINDS = ["image", "diagram", "scanned_page", "table"]
MEDIA_PROB = 0.25

_TEMPLATES = [
    "{a} announced a partnership with {b}.",
    "{a} is closely linked to {b} in recent filings.",
    "According to the report, {a} depends on {b}.",
    "{a} and {b} collaborated during the rollout.",
    "Analysts connected {a} with {b} last quarter.",
]
_SOLO_TEMPLATES = [
    "{a} was mentioned prominently.",
    "The review highlighted {a} in detail.",
    "{a} remains central to the initiative.",
]


def _doc_rng(doc_id: int) -> np.random.RandomState:
    return np.random.RandomState((SEED * 1_000_003 + int(doc_id) * 7919) % (2**31 - 1))


def _pick_entities(rng: np.random.RandomState, n: int, n_vocab: int) -> list[int]:
    """Zipfian entity index sample — low indices are hub entities."""
    idx = rng.zipf(1.3, size=n)
    return [int(i - 1) % n_vocab for i in idx]


def generate_doc_spans(doc_id: int, base_text: str) -> list[dict]:
    """Pure deterministic span generation for one document."""
    entities, aliases = build_vocabulary()
    # group alias surface forms per canonical entity index
    rng = _doc_rng(doc_id)
    n_spans = int(rng.randint(1, 13))
    spans: list[dict] = []
    offset = 0
    media_i = 0
    words = base_text.split() if base_text else ["filler"]
    for si in range(n_spans):
        if rng.rand() < MEDIA_PROB and si > 0:
            spans.append(
                {
                    "kind": MEDIA_KINDS[int(rng.randint(len(MEDIA_KINDS)))],
                    "text": "",
                    "media_ref": f"media://doc{doc_id:06d}/{media_i}",
                    "offset": offset,
                }
            )
            media_i += 1
            continue
        # text span: soup sentences + injected mention sentences
        target_len = int(rng.randint(200, 4001))
        parts: list[str] = []
        cur = 0
        while cur < target_len:
            if rng.rand() < 0.45:
                k = int(rng.randint(1, 4))
                ents = _pick_entities(rng, k + 1, len(entities))
                e_objs = [entities[i] for i in ents]
                # surface form: pick one alias variant of each entity
                amap = aliases_by_entity()
                names = []
                for e in e_objs:
                    variants = amap.get(e.canonical_name)
                    if variants:
                        names.append(variants[int(rng.randint(len(variants)))].alias)
                    else:
                        names.append(e.canonical_name)
                # occasionally mention a low-value decoy that the
                # importance<0.3 filter must drop downstream
                from .vocab import DECOYS
                if rng.rand() < 0.12:
                    names[-1] = DECOYS[int(rng.randint(len(DECOYS)))]
                if k >= 1 and names[0] != names[1]:
                    t = _TEMPLATES[int(rng.randint(len(_TEMPLATES)))]
                    sent = t.format(a=names[0], b=names[1])
                else:
                    t = _SOLO_TEMPLATES[int(rng.randint(len(_SOLO_TEMPLATES)))]
                    sent = t.format(a=names[0])
            else:
                w0 = int(rng.randint(0, max(1, len(words) - 12)))
                nw = int(rng.randint(5, 13))
                sent = " ".join(words[w0 : w0 + nw]) + "."
            parts.append(sent)
            cur += len(sent) + 1
            # paragraph break sometimes (exercises the \n\n separator)
            if rng.rand() < 0.25:
                parts.append("\n")
        text = " ".join(parts).replace(" \n ", "\n\n")[: target_len + 400]
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": offset})
        offset += len(text) + 2  # reading-order join is "\n\n" (ocr.py:817)
    if not spans or all(s["kind"] != "text" for s in spans):
        spans.append({"kind": "text", "text": " ".join(words[:50]) + ".", "media_ref": "", "offset": offset})
    return spans


def build_spans_corpus(spark: SparkSession, flat_documents_path: str) -> DataFrame:
    """Distributed corpus build: driver flat documents.parquet -> spans table."""
    return spans_from_flat(spark.read.parquet(flat_documents_path))


def spans_from_flat(flat_df: DataFrame) -> DataFrame:
    """Flat (doc_id:int64, text) rows -> spans table (mapInPandas).

    The flat table is tiny on disk (one parquet file at test SFs), so
    the scan would be 1 partition and generation single-threaded —
    ensure_parallelism rebalances before the UDF."""
    from .session import ensure_parallelism

    flat = ensure_parallelism(flat_df.select("doc_id", "text"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                out.append(
                    {
                        "doc_id": f"doc{int(doc_id):06d}",
                        "spans": generate_doc_spans(int(doc_id), text or ""),
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "spans"])

    return flat.mapInPandas(gen, schema=SPANS_SCHEMA)


def document_text(spans_df: DataFrame) -> DataFrame:
    """Assemble reading-order document text from text spans — the Spark
    analog of the reference's '\\n\\n'.join over ordered page content
    (core/ocr.py:817). Native expressions only (no Python)."""
    return spans_df.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.filter("spans", lambda s: s["kind"] == F.lit("text")),
                lambda s: s["text"],
            ),
            "\n\n",
        ).alias("content"),
        "spans",
    )


def write_corpus(spark: SparkSession, flat_documents_path: str, out_path: str, buckets: int = 32) -> None:
    """Materialize the spans corpus with a doc_id hash-bucket partition
    column: balanced files and partition-pruned per-doc lookups (true
    join co-location would need bucketed tables — see
    materialize.write_table's Iceberg branch)."""
    df = build_spans_corpus(spark, flat_documents_path)
    df = df.withColumn("doc_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)).cast("int"))
    df.write.mode("overwrite").partitionBy("doc_bucket").parquet(out_path)
