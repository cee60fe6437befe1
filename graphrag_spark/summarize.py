"""Summarizer-side scalar operators (SURVEY.md §2.8 X9-X11).

The reference's document summarizer post-processes LLM output
(core/document_summarizer.py:218-285): X9 extract the first JSON object
from a free-text response with a greedy DOTALL regex + fallback, X10
normalize hashtags (strip, prepend '#'), X11 truncate at a sentence
boundary (rfind '.') when past a length cap, plus document-type
validation against a closed vocabulary (:264-267).

All implemented twice with identical behavior: native Spark Column
expressions (codegen, no Python in the hot path) and pure-Python twins
used by tests. DOCUMENT_TYPES is the reference's validation vocabulary
(configuration data, document_summarizer.py:14-146).
"""

from __future__ import annotations

import json
import re

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column

DOCUMENT_TYPES = [
    "quote", "invoice", "receipt", "purchase_order", "contract", "agreement",
    "report", "financial_report", "research_report", "business_report",
    "technical_report", "resume", "cv", "cover_letter", "insurance_document",
    "insurance_policy", "claim_form", "medical_record", "prescription",
    "legal_document", "court_document", "deed", "will", "power_of_attorney",
    "academic_paper", "thesis", "dissertation", "article", "blog_post",
    "news_article", "press_release", "whitepaper", "specification",
    "technical_specification", "manual", "user_manual", "guide", "tutorial",
    "presentation", "slide_deck", "proposal", "business_proposal",
    "project_proposal", "grant_proposal", "memo", "memorandum", "letter",
    "business_letter", "email", "form", "application_form",
    "registration_form", "tax_form", "financial_statement", "balance_sheet",
    "income_statement", "cash_flow_statement", "budget", "forecast", "plan",
    "business_plan", "project_plan", "marketing_plan", "strategy_document",
    "policy_document", "procedure_document", "sop", "checklist", "schedule",
    "calendar", "agenda", "minutes", "meeting_minutes", "transcript",
    "interview_transcript", "certificate", "diploma", "license", "permit",
    "warranty", "guarantee", "specification_sheet", "datasheet", "brochure",
    "catalog", "flyer", "pamphlet", "booklet", "book", "ebook", "chapter",
    "section", "reference_document", "documentation", "api_documentation",
    "code_documentation", "readme", "changelog", "release_notes",
    "announcement", "notice", "notification", "alert", "bulletin",
    "newsletter", "journal_entry", "log", "record", "note", "annotation",
    "comment", "review", "feedback", "survey", "questionnaire", "assessment",
    "evaluation", "test", "exam", "quiz", "worksheet", "assignment",
    "homework", "syllabus", "curriculum", "lesson_plan", "lecture_notes",
    "study_guide", "reference_sheet", "cheat_sheet", "other",
]

_JSON_RE = r"(?s)\{.*\}"
_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("summary", T.StringType()),
        T.StructField("document_type", T.StringType()),
        T.StructField("hashtags", T.ArrayType(T.StringType())),
    ]
)


# ------------------------------------------------------------------- X9

def extract_summary_json_col(response: Column, max_summary_length: int = 100) -> Column:
    """X9 (document_summarizer.py:246-257): pull the first-{..last-}
    JSON object out of a free-text LLM response; on no match or invalid
    JSON, fall back to (response[:max_summary_length], 'other', [])."""
    json_str = F.regexp_extract(response, _JSON_RE, 0)
    # Spark's Jackson parser is lenient about trailing text after the
    # first object ('{..} junk {..}' parses), but the reference's
    # json.loads is strict. Wrapping in [..] turns trailing garbage
    # into a hard syntax error, and a strict parse of the greedy span
    # yields exactly one element; allowSingleQuotes matches json.loads.
    arr = F.from_json(
        F.concat(F.lit("["), json_str, F.lit("]")),
        T.ArrayType(_SUMMARY_SCHEMA),
        {"allowSingleQuotes": "false"},
    )
    parsed = F.element_at(arr, 1)
    fallback = F.struct(
        F.substring(response, 1, max_summary_length).alias("summary"),
        F.lit("other").alias("document_type"),
        F.array().cast("array<string>").alias("hashtags"),
    )
    bad = (json_str == "") | arr.isNull() | (F.size(arr) != 1) | parsed.isNull()
    return F.when(bad, fallback).otherwise(
        F.struct(
            F.coalesce(parsed["summary"], F.lit("")).alias("summary"),
            F.coalesce(parsed["document_type"], F.lit("other")).alias("document_type"),
            F.coalesce(parsed["hashtags"], F.array().cast("array<string>")).alias("hashtags"),
        )
    )


def py_extract_summary_json(response: str, max_summary_length: int = 100) -> dict:
    m = re.search(_JSON_RE, response or "")
    result = None
    if m:
        try:
            result = json.loads(m.group())
        except (ValueError, TypeError):
            result = None
    if not isinstance(result, dict):
        return {
            "summary": (response or "")[:max_summary_length],
            "document_type": "other",
            "hashtags": [],
        }
    return {
        "summary": result.get("summary") or "",
        "document_type": result.get("document_type") or "other",
        "hashtags": result.get("hashtags") or [],
    }


# ------------------------------------------------------------------- X10

def clean_hashtags_col(tags: Column) -> Column:
    """X10 (document_summarizer.py:269-276): strip each tag and prepend
    '#' when missing."""
    return F.transform(
        tags,
        lambda t: F.when(F.trim(t).startswith("#"), F.trim(t)).otherwise(
            F.concat(F.lit("#"), F.trim(t))
        ),
    )


def py_clean_hashtags(tags: list) -> list[str]:
    out = []
    for tag in tags:
        if isinstance(tag, str):
            tag = tag.strip()
            if not tag.startswith("#"):
                tag = "#" + tag
            out.append(tag)
    return out


# ------------------------------------------------- doc-type validation

def valid_document_type_col(dtype: Column) -> Column:
    """document_summarizer.py:259-267: lower+strip, closed-vocabulary
    membership, 'other' default."""
    cleaned = F.lower(F.trim(dtype))
    return F.when(cleaned.isin(DOCUMENT_TYPES), cleaned).otherwise(F.lit("other"))


def py_valid_document_type(dtype: str) -> str:
    cleaned = (dtype or "other").lower().strip()
    return cleaned if cleaned in DOCUMENT_TYPES else "other"


# ------------------------------------------------------------------- X11

def truncate_at_sentence_col(text: Column, hard_max: int, min_period_pos: int) -> Column:
    """X11 (document_summarizer.py:219-224, 279-285): when text exceeds
    ``hard_max``, cut to ``hard_max`` chars, then pull back to the last
    '.' if that period sits past ``min_period_pos`` (keeps truncation
    from eating most of the text)."""
    cut = F.substring(text, 1, hard_max)
    # 0-based index of the LAST '.' in `cut` (-1 when absent), matching
    # Python's rfind so the condition is the reference's verbatim
    rpos = F.instr(F.reverse(cut), ".")
    last_period = F.when(rpos > 0, F.length(cut) - rpos).otherwise(F.lit(-1))
    pulled = F.when(
        last_period > min_period_pos, F.substring(cut, 1, last_period + 1)
    ).otherwise(cut)
    return F.when(F.length(text) > hard_max, pulled).otherwise(text)


def py_truncate_at_sentence(text: str, hard_max: int, min_period_pos: int) -> str:
    if len(text or "") <= hard_max:
        return text or ""
    cut = text[:hard_max]
    last_period = cut.rfind(".")
    if last_period > min_period_pos:
        return cut[: last_period + 1]
    return cut
