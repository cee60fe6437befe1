"""Multimodal plumbing: schemas, batching, determinism (decode stubbed)."""

from __future__ import annotations

import numpy as np
import pytest

from graphrag_spark.multimodal import (
    FEATURE_DIM,
    _decode_payload,
    extract_media_features,
    frame_sample,
    media_table_from_spans,
    synth_payload,
)


@pytest.fixture(scope="module")
def media_df(spark, corpus_path):
    return media_table_from_spans(spark.read.parquet(corpus_path))


def test_media_table_schema(media_df):
    rows = media_df.collect()
    assert rows, "corpus must yield media spans"
    for r in rows[:20]:
        assert r["payload"][:4] == b"GRSM"
        assert r["meta"]["width"] >= 64 and r["meta"]["height"] >= 64
        assert r["meta"]["size_bytes"] == len(r["payload"])
        assert r["kind"] in {"image", "diagram", "scanned_page", "table"}


def test_payload_deterministic():
    assert synth_payload("media://x/0", "image") == synth_payload("media://x/0", "image")
    assert synth_payload("media://x/0", "image") != synth_payload("media://x/1", "image")


def test_decode_stub_rejects_unknown():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"JPEGnotreally")


def test_feature_extraction(media_df):
    feats = extract_media_features(media_df).collect()
    for r in feats[:20]:
        assert len(r["features"]) == FEATURE_DIM
        assert all(np.isfinite(x) for x in r["features"])
    # determinism across runs
    again = extract_media_features(media_df).collect()
    assert {r["media_ref"]: tuple(r["features"]) for r in feats} == {
        r["media_ref"]: tuple(r["features"]) for r in again
    }


def test_frame_sample(media_df):
    frames = frame_sample(media_df.limit(5), n_frames=4).collect()
    by_ref = {}
    for r in frames:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_index"])
    for ref, idxs in by_ref.items():
        assert sorted(idxs) == [0, 1, 2, 3]


def test_resize_media(media_df):
    """Nearest-neighbor resize: output shape, determinism, and value
    provenance (every resized pixel exists in the decoded source tile)."""
    import numpy as np

    from graphrag_spark.multimodal import _decode_payload, resize_media

    out = resize_media(media_df, out_w=8, out_h=8)
    rows = out.collect()
    assert rows
    payloads = {r["media_ref"]: bytes(r["payload"]) for r in media_df.collect()}
    for r in rows[:10]:
        assert r["out_width"] == 8 and r["out_height"] == 8
        assert len(r["pixels"]) == 64
        src = {round(float(x), 6) for x in _decode_payload(payloads[r["media_ref"]]).ravel()}
        assert set(r["pixels"]) <= src
    again = {r["media_ref"]: r["pixels"] for r in resize_media(media_df, 8, 8).collect()}
    for r in rows:
        assert again[r["media_ref"]] == r["pixels"]
