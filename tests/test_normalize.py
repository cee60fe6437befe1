"""Native-expression normalization must agree exactly with the pure
Python twin used by the oracle (they implement reference
entity_extraction.py:223-298 once each)."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from graphrag_spark.normalize import (
    is_low_value_col,
    norm_name_col,
    norm_type_col,
    py_is_low_value,
    py_norm_name,
    py_norm_type,
)
from graphrag_spark.vocab import TYPE_ALIASES, aliases_as_rows


def test_norm_name_examples():
    cases = {
        "  Quantum   Dynamics Corp  ": "Quantum Dynamics Corp",
        "Helix Labs (ref)": "Helix Labs",
        "Greta Takahashi,": "Greta Takahashi",
        "sub-floor insulation": "subfloor insulation",
        "Sub Floor": "subfloor",
        "weird*chars&here!": "weirdcharshere",
        "": "",
        # interior parentheticals are removed (replaced by a space),
        # not just trailing ones (entity_extraction.py:242-244)
        "Quantum (QD) Dynamics": "Quantum Dynamics",
        "sub structure report": "substructure report",
        # '.' is in the keep set — trailing dots survive like the
        # reference's output
        "Helix Labs.": "Helix Labs.",
    }
    for raw, want in cases.items():
        assert py_norm_name(raw) == want, raw


def test_norm_type_examples():
    assert py_norm_type("org") == "ORGANIZATION"
    assert py_norm_type("People") == "PERSON"
    assert py_norm_type("HUMAN (primary)") == "PERSON"
    assert py_norm_type("unknown-thing") == "CONCEPT"
    assert py_norm_type("") == "CONCEPT"
    # reference algorithm branches (entity_extraction.py:248-271):
    # unmapped parenthesized type falls back to its pre-paren base only
    # when the base is canonical
    assert py_norm_type("PERSON (AUTHOR ROLE)") == "PERSON"
    assert py_norm_type("GIZMO (THING)") == "CONCEPT"
    # '**TYPE**' star stripping
    assert py_norm_type("**LOCATION**") == "LOCATION"
    assert py_norm_type("**WIDGET**") == "CONCEPT"


def test_spark_matches_python_on_alias_corpus(spark):
    rows = [(a, t) for a, _, t, _ in aliases_as_rows()]
    df = spark.createDataFrame(rows, "raw_name string, raw_type string")
    got = df.select(
        "raw_name",
        "raw_type",
        norm_name_col(F.col("raw_name")).alias("n"),
        norm_type_col(F.col("raw_type")).alias("t"),
    ).collect()
    for r in got:
        assert r["n"] == py_norm_name(r["raw_name"]), r["raw_name"]
        assert r["t"] == py_norm_type(r["raw_type"]), r["raw_type"]


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=60), st.floats(min_value=0, max_value=1))
def test_low_value_python_total(name, imp):
    # py filter must never raise on arbitrary input
    py_is_low_value(py_norm_name(name), "CONCEPT", imp)


def test_low_value_spark_matches_python(spark):
    names = [
        "the", "Data", "12", "1234", "xy", "Various things here",
        "Quantum Dynamics Corp", "information", "processing", "General idea",
        "Concept", "Alice Brightwell",
    ]
    rows = [(n, t, i) for n in names for t in ["CONCEPT", "PERSON"] for i in [0.1, 0.5, 0.9]]
    df = spark.createDataFrame(rows, "name string, etype string, importance double")
    got = df.select(
        "name", "etype", "importance",
        is_low_value_col(F.col("name"), F.col("etype"), F.col("importance")).alias("low"),
    ).collect()
    for r in got:
        assert r["low"] == py_is_low_value(r["name"], r["etype"], r["importance"]), (
            r["name"], r["etype"], r["importance"],
        )


def test_type_map_covers_all_canonical():
    assert set(TYPE_ALIASES.values()) == {
        "PERSON", "ORGANIZATION", "LOCATION", "EVENT", "CONCEPT",
        "TECHNOLOGY", "PRODUCT", "DOCUMENT", "DATE", "MONEY",
    }
