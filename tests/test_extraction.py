"""Extractor contract tests (SURVEY.md §5.2 item 3): the pipe-format
response contract, parse clamping, determinism, and Spark/oracle
agreement of the extraction stage."""

from __future__ import annotations

from graphrag_spark.extraction import (
    REL_DESCRIPTION,
    det_extract_response,
    parse_extraction_response,
)


def test_parse_clamps_scores():
    resp = (
        "ENTITIES:\n"
        "- Name: Foo Bar | Type: ORG | Importance: 7.5 | Description: d\n"
        "RELATIONSHIPS:\n"
        "- Source: Foo Bar | Target: Baz Qux | Strength: 99 | Description: r\n"
    )
    ents, rels = parse_extraction_response(resp)
    assert ents[0]["importance"] == 1.0
    assert rels[0]["strength"] == 1.0


def test_parse_ignores_malformed_lines():
    resp = "ENTITIES:\ngarbage\n- Name: incomplete |\nRELATIONSHIPS:\nnope\n"
    ents, rels = parse_extraction_response(resp)
    assert ents == [] and rels == []


def test_extractor_deterministic():
    text = "Alice Brightwell announced a partnership with Quantum Dynamics Corp."
    assert det_extract_response(text) == det_extract_response(text)


def test_extractor_finds_known_entities():
    from graphrag_spark.vocab import build_vocabulary

    entities, _ = build_vocabulary()
    a, b = entities[0].canonical_name, entities[1].canonical_name
    text = f"{a} is closely linked to {b} in recent filings."
    ents, rels = parse_extraction_response(det_extract_response(text))
    names = {e["name"] for e in ents}
    assert a in names and b in names
    assert any(
        {r["source"], r["target"]} == {a, b} and r["description"] == REL_DESCRIPTION
        for r in rels
    )


def test_no_match_empty_sections():
    ents, rels = parse_extraction_response(det_extract_response("zzz qqq 123"))
    assert ents == [] and rels == []


def test_word_boundary_matching():
    """An alias inside a longer word must not match."""
    from graphrag_spark.vocab import build_vocabulary

    entities, _ = build_vocabulary()
    name = entities[0].canonical_name
    ents, _ = parse_extraction_response(det_extract_response(f"xx{name}yy"))
    assert name not in {e["name"] for e in ents}
