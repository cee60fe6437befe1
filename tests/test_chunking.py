"""Chunker conformance (SURVEY.md §5.2 item 2).

The recursive splitter is the #1 determinism risk: chunk boundaries
drive everything downstream. Golden + property tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from graphrag_spark.chunking import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    recursive_split,
    split_with_offsets,
)


def test_empty_and_short():
    assert recursive_split("") == []
    assert recursive_split("hello") == ["hello"]
    assert recursive_split("  ") == []


def test_paragraph_split_golden():
    text = "para one here.\n\npara two here.\n\npara three here."
    chunks = recursive_split(text, chunk_size=20, overlap=5)
    # every paragraph fits; separators keep paragraphs intact
    assert chunks == ["para one here.", "para two here.", "para three here."]


def test_exact_boundary_golden():
    text = "a" * 1000
    chunks = recursive_split(text)
    assert chunks == ["a" * 1000]


def test_oversized_no_separator():
    text = "x" * 2500
    chunks = recursive_split(text, chunk_size=1000, overlap=200)
    assert all(len(c) <= 1000 for c in chunks)
    # overlap carry-over: consecutive chunks share a suffix/prefix
    assert len(chunks) >= 3
    joined = "".join(chunks)
    assert set(joined) == {"x"}


def test_word_split_overlap():
    words = " ".join(f"w{i:03d}" for i in range(300))
    chunks = recursive_split(words, chunk_size=100, overlap=30)
    assert all(len(c) <= 100 for c in chunks)
    # full coverage: every word appears in some chunk
    covered = set()
    for c in chunks:
        covered.update(c.split())
    assert covered == set(words.split())
    # overlap: consecutive chunks share at least one word
    for a, b in zip(chunks, chunks[1:]):
        assert set(a.split()) & set(b.split())


def test_unicode_preserved():
    text = "héllo wörld éé " * 100
    chunks = recursive_split(text, chunk_size=50, overlap=10)
    assert all(len(c) <= 50 for c in chunks)
    assert any("héllo" in c for c in chunks)


def test_offsets_match_reference_trace():
    """Offsets must equal the reference's tracking loop
    (core/chunking.py:69-78) — including its fallback behavior on
    overlapping chunks, where the stored offset is the previous chunk's
    end rather than the true start position."""
    from graphrag_spark.oracle.lc_splitter import reference_offsets

    for text in [
        ("Sentence one is here. " * 20 + "\n\n") * 10,
        "unique words " + " ".join(f"tok{i}" for i in range(800)),
        "x" * 2500,
    ]:
        pairs = split_with_offsets(text, 300, 60)
        chunks = [c for c, _ in pairs]
        assert [o for _, o in pairs] == reference_offsets(text, chunks)


LC_GOLDEN_TEXTS = [
    "",
    "short",
    "a" * 5000,
    ("word " * 500).strip(),
    "para one.\n\npara two is a bit longer.\n\n" * 60,
    "line\n" * 800,
    " ".join(f"w{i}" for i in range(2000)),
    "x" * 999 + " " + "y" * 999,
    "\n\n\n\nleading seps",
    "trailing seps\n\n\n\n",
    "nospacesatallhere" * 200,
    ("abc " * 300 + "\n\n") * 5,
    "mixed\n\npara\nline and words " * 120,
]


def test_langchain_conformance_golden():
    """recursive_split must be byte-identical to the independent trace
    of LangChain's RecursiveCharacterTextSplitter (the splitter the
    reference configures, core/chunking.py:21-25) at the reference
    config and at small configs that stress merge/overlap edges."""
    from graphrag_spark.oracle.lc_splitter import lc_split_text

    for text in LC_GOLDEN_TEXTS:
        for cs, ov in [(1000, 200), (100, 20), (50, 10), (37, 9)]:
            assert recursive_split(text, cs, ov) == lc_split_text(text, cs, ov), (cs, ov, text[:60])


@settings(max_examples=120, deadline=None)
@given(
    st.text(alphabet="abc \n.", min_size=0, max_size=4000),
    st.integers(min_value=20, max_value=400),
)
def test_langchain_conformance_property(text, chunk_size):
    from graphrag_spark.oracle.lc_splitter import lc_split_text

    overlap = chunk_size // 5
    assert recursive_split(text, chunk_size, overlap) == lc_split_text(text, chunk_size, overlap)


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="ab \n.", min_size=0, max_size=3000),
    st.integers(min_value=20, max_value=200),
)
def test_property_size_and_coverage(text, chunk_size):
    overlap = chunk_size // 5
    chunks = recursive_split(text, chunk_size=chunk_size, overlap=overlap)
    for c in chunks:
        assert len(c) <= chunk_size
        assert c.strip() == c and c != ""
    # non-whitespace content is preserved (stripping only removes ws)
    assert sum(len(c.replace(" ", "").replace("\n", "")) for c in chunks) >= len(
        text.replace(" ", "").replace("\n", "")
    ) - 0  # every non-ws char must land in >=1 chunk
    nonws = len(text.replace(" ", "").replace("\n", ""))
    got = sum(len(c.replace(" ", "").replace("\n", "")) for c in chunks)
    assert got >= nonws


def test_determinism():
    text = "deterministic input " * 200
    assert recursive_split(text) == recursive_split(text)
    assert split_with_offsets(text) == split_with_offsets(text)


def test_chunk_id_contract(spark, corpus_path):
    """chunk ids follow f'{doc_id}_chunk_{i}' (reference core/chunking.py:99)."""
    from graphrag_spark.chunking import chunk_documents
    from graphrag_spark.corpus import document_text

    docs = spark.read.parquet(corpus_path)
    chunks = chunk_documents(document_text(docs)).limit(50).collect()
    for r in chunks:
        assert r["chunk_id"] == f"{r['doc_id']}_chunk_{r['chunk_index']}"
        assert 0 <= r["offset"]
        assert r["chunk_size"] == len(r["content"])
        assert len(r["content"]) <= CHUNK_SIZE
        assert CHUNK_OVERLAP < CHUNK_SIZE


QUALITY_EDGE_TEXTS = [
    "",
    "ab",
    "tiny",
    "short but ok text here",
    "x " * 400,  # fragmented words
    "normal paragraph with several reasonable words per line\n" * 5,
    "spaced   out   text   with   triple   gaps",
    "café résumé über",  # non-ASCII artifacts
    "A1 b2 c3 " * 50,
    "\n\n\n\n",
    "word\n" * 40,  # 1 word per line
    "x" * 2000,
    "lots of punctuation !!! ??? ;;; ::: --- ...",
]


def test_quality_score_matches_reference_trace(spark):
    """The native Spark quality columns must equal the pure-Python trace
    of the reference's _analyze_text_quality (core/ocr.py:162-258) —
    same base formula, same penalty set, same needs_review rule."""
    import pyspark.sql.functions as F

    from graphrag_spark.chunking import _quality_cols, py_quality_analysis

    df = spark.createDataFrame([(t,) for t in QUALITY_EDGE_TEXTS], "content string")
    cols = _quality_cols(F.col("content"))
    rows = df.select(
        "content", cols["quality_score"].alias("q"), cols["needs_review"].alias("nr")
    ).collect()
    for r in rows:
        want = py_quality_analysis(r["content"])
        assert abs(r["q"] - want["quality_score"]) < 1e-6, (
            f"score mismatch for {r['content']!r}: spark={r['q']} py={want['quality_score']}"
        )
        assert r["nr"] == want["needs_review"], f"needs_review mismatch for {r['content']!r}"
