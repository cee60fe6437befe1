"""Multimodal column plumbing: opaque binary media payloads with typed
metadata, decode / feature-extract / frame-sample as Arrow-batched UDFs.

Per the input_hint, media spans are *carried, never parsed* by the KG
pipeline (media_ref opaque, order preserved). This module is the
training-data side: it gives media payloads a real Spark schema,
partitioning, UDF signatures, and batch shapes. The actual pixel/audio
decode is STUBBED — image/audio libraries are not in this container —
behind ``_decode_payload``: with real libraries installed, replace that
single function; everything around it (schemas, mapInPandas batching,
partition strategy) is real and tested.

The synthetic payload format (deterministic, seeded) is:
  bytes 0-3   magic b'GRSM'
  byte  4     kind code (0=image,1=diagram,2=scanned_page,3=table)
  bytes 5-8   width  (big-endian u32)
  bytes 9-12  height (big-endian u32)
  bytes 13+   content bytes derived from sha256(media_ref)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

KIND_CODES = {"image": 0, "diagram": 1, "scanned_page": 2, "table": 3}
CODE_KINDS = {v: k for k, v in KIND_CODES.items()}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("size_bytes", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synth_payload(media_ref: str, kind: str) -> bytes:
    """Deterministic fake media payload for a media_ref."""
    h = hashlib.sha256(media_ref.encode()).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    body = (h * 8)[: 256 + h[2]]
    return b"GRSM" + bytes([KIND_CODES.get(kind, 0)]) + struct.pack(">II", width, height) + body


def media_table_from_spans(docs_spans: DataFrame) -> DataFrame:
    """Spans table -> media table: one row per media span, payload
    synthesized deterministically (no external data). Explode + UDF
    batch; partitioned by kind on write for partition-pruned scans."""
    media = (
        docs_spans.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") != "text")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, kind in zip(pdf["doc_id"], pdf["media_ref"], pdf["kind"]):
                payload = synth_payload(ref, kind)
                w, h = struct.unpack(">II", payload[5:13])
                rows.append(
                    (doc_id, ref, kind, payload,
                     {"width": w, "height": h, "format": "grsm", "size_bytes": len(payload)})
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "kind", "payload", "meta"])

    return media.mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes) -> np.ndarray:
    """STUB decode: real image/audio decoding requires libraries not in
    this container. The deterministic fake parses the synthetic header
    and expands content bytes into a (16,16) float 'image'. Replace this
    one function with PIL/ffmpeg decoding in production."""
    if payload[:4] != b"GRSM":
        raise NotImplementedError(
            "real media decoding (PIL/ffmpeg) is not available in this "
            "environment; only synthetic GRSM payloads are decodable"
        )
    body = np.frombuffer(payload[13:], dtype=np.uint8)
    tile = np.resize(body, (16, 16)).astype(np.float64) / 255.0
    return tile


FEATURE_DIM = 32
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per media row (Arrow-batched). Feature =
    row/col means + histogram of the decoded tile — deterministic, fixed
    FEATURE_DIM, the exact shape a real embedding UDF would return."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload, meta in zip(pdf["media_ref"], pdf["kind"], pdf["payload"], pdf["meta"]):
                tile = _decode_payload(bytes(payload))
                feats = np.concatenate(
                    [tile.mean(axis=0), tile.mean(axis=1)]
                )[:FEATURE_DIM]
                rows.append(
                    (ref, kind, int(meta["width"]), int(meta["height"]), [round(float(x), 6) for x in feats])
                )
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "width", "height", "features"])

    return media.mapInPandas(gen, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.DoubleType())),
    ]
)


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Resize plumbing: decode each payload and nearest-neighbor
    resample the tile to (out_h, out_w), emitting the row-major pixel
    array — the batch shape of a real thumbnail/resize UDF (swap
    ``_decode_payload`` + the sampler for PIL in production). The
    nearest-neighbor index math is deterministic and library-free."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
                tile = _decode_payload(bytes(payload))  # (16, 16) floats
                h, w = tile.shape
                ri = (np.arange(out_h) * h) // out_h
                ci = (np.arange(out_w) * w) // out_w
                resized = tile[np.ix_(ri, ci)]
                rows.append(
                    (ref, kind, out_w, out_h, [round(float(x), 6) for x in resized.ravel()])
                )
            yield pd.DataFrame(
                rows, columns=["media_ref", "kind", "out_width", "out_height", "pixels"]
            )

    return media.select("media_ref", "kind", "payload").mapInPandas(gen, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for clip-like payloads: emits n_frames
    rows per media item with a per-frame slice of the payload — the
    batch/row-explosion shape of real video frame extraction."""
    out_schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload)
                body = b[13:]
                step = max(len(body) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((ref, i, body[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["media_ref", "frame_index", "frame_payload"])

    return media.select("media_ref", "payload").mapInPandas(gen, schema=out_schema)
