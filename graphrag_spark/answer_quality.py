"""Answer quality scoring — the reference's heuristic rubric
(core/quality_scorer.py:22-120, 190-285) as native column expressions.

The reference tries one LLM judging call and falls back to these
deterministic component heuristics; the heuristic path is the one
reproduced here (the LLM path is an external service, like extraction).
Components (0-100 each): context_relevance (answer/context word-set
overlap), answer_completeness (query-term coverage + length),
factual_grounding (the reference reuses the relevance heuristic),
coherence (sentence structure), citation_quality (source count vs
answer length). Weighted total (0.30/0.25/0.25/0.10/0.10) + a
confidence label from component variance (quality_scorer.py:299-320).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

QUALITY_WEIGHTS = {
    "context_relevance": 0.30,
    "answer_completeness": 0.25,
    "factual_grounding": 0.25,
    "coherence": 0.10,
    "citation_quality": 0.10,
}


def _word_set(text: Column) -> Column:
    """Python ``set(text.lower().split())`` as a distinct string array."""
    return F.array_distinct(
        F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    )


def context_relevance_col(answer: Column, context: Column) -> Column:
    """quality_scorer.py:190-207: word-set overlap of answer vs the
    context text, scaled x150 capped at 100; 50 when either is empty."""
    aw = _word_set(answer)
    cw = _word_set(context)
    overlap = F.size(F.array_intersect(aw, cw)) / F.size(aw)
    return F.when(
        (F.size(aw) == 0) | (F.size(cw) == 0), F.lit(50.0)
    ).otherwise(F.least(overlap * 150, F.lit(100.0)))


def completeness_col(answer: Column, query: Column) -> Column:
    """quality_scorer.py:209-222: query-term coverage (0.6) + length
    score capped at 500 chars (0.4), scaled to 0-100."""
    qw = _word_set(query)
    aw = _word_set(answer)
    coverage = F.size(F.array_intersect(qw, aw)) / F.greatest(F.size(qw), F.lit(1))
    length_score = F.least(F.length(answer) / 500.0, F.lit(1.0))
    return (coverage * 0.6 + length_score * 0.4) * 100


def coherence_col(answer: Column) -> Column:
    """quality_scorer.py:224-238: length + sentence-count + average
    sentence-length banding."""
    sents = F.filter(
        F.transform(F.split(answer, r"\."), lambda s: F.trim(s)), lambda s: s != ""
    )
    n = F.size(sents)
    length_score = F.least(F.length(answer) / 500.0, F.lit(1.0)) * 30
    count_score = F.least(n / F.lit(3.0), F.lit(1.0)) * 30
    avg_len = F.length(answer) / F.greatest(n, F.lit(1))
    band = F.when((avg_len > 20) & (avg_len < 200), F.lit(40.0)).otherwise(F.lit(20.0))
    return F.when(n == 0, F.lit(40.0)).otherwise(length_score + count_score + band)


def citation_quality_col(answer: Column, n_sources: Column) -> Column:
    """quality_scorer.py:240-271: source count vs answer length
    proportionality; 50 when no sources."""
    base = F.least(n_sources * 15.0, F.lit(80.0))
    expected = F.greatest(n_sources * 100, F.lit(1))
    ratio = F.length(answer) / expected
    bonus = (
        F.when((ratio >= 0.5) & (ratio <= 2.0), F.lit(20.0))
        .when(((ratio >= 0.3) & (ratio < 0.5)) | ((ratio > 2.0) & (ratio <= 3.0)), F.lit(10.0))
        .otherwise(F.lit(0.0))
    )
    return F.when(n_sources == 0, F.lit(50.0)).otherwise(F.least(base + bonus, F.lit(100.0)))


def answer_quality(
    df: DataFrame,
    answer_col: str = "answer",
    query_col: str = "query",
    context_col: str = "context",
    sources_col: str = "n_sources",
) -> DataFrame:
    """Adds component scores, the weighted total (rounded to 1 like the
    reference), and the variance-based confidence label."""
    a, q, c = F.col(answer_col), F.col(query_col), F.col(context_col)
    n = F.col(sources_col)
    rel = context_relevance_col(a, c)
    comp = completeness_col(a, q)
    ground = context_relevance_col(a, c)  # reference reuses the relevance heuristic
    coh = coherence_col(a)
    cit = citation_quality_col(a, n)
    total = (
        rel * QUALITY_WEIGHTS["context_relevance"]
        + comp * QUALITY_WEIGHTS["answer_completeness"]
        + ground * QUALITY_WEIGHTS["factual_grounding"]
        + coh * QUALITY_WEIGHTS["coherence"]
        + cit * QUALITY_WEIGHTS["citation_quality"]
    )
    scores = F.array(rel, comp, ground, coh, cit)
    mean = F.aggregate(scores, F.lit(0.0), lambda acc, s: acc + s) / 5.0
    var = F.aggregate(scores, F.lit(0.0), lambda acc, s: acc + (s - mean) * (s - mean)) / 5.0
    confidence = (
        F.when(var < 100, "high").when(var < 400, "medium").otherwise("low")
    )
    return df.select(
        "*",
        F.round(rel, 1).alias("context_relevance"),
        F.round(comp, 1).alias("answer_completeness"),
        F.round(ground, 1).alias("factual_grounding"),
        F.round(coh, 1).alias("coherence"),
        F.round(cit, 1).alias("citation_quality"),
        F.round(total, 1).alias("total_score"),
        confidence.alias("confidence"),
    )


# ---------------------------------------------------------------- py twin

def py_answer_quality(answer: str, query: str, context: str, n_sources: int) -> dict:
    """Pure-Python trace of the reference heuristics — the test oracle."""
    aw = set(answer.lower().split())
    cw = set(context.lower().split())
    if not cw or not aw:
        rel = 50.0
    else:
        rel = min(len(aw & cw) / len(aw) * 150, 100)
    qw = set(query.lower().split())
    coverage = len(qw & aw) / max(len(qw), 1)
    comp = (coverage * 0.6 + min(len(answer) / 500, 1.0) * 0.4) * 100
    ground = rel
    sents = [s.strip() for s in answer.split(".") if s.strip()]
    if not sents:
        coh = 40.0
    else:
        avg = len(answer) / max(len(sents), 1)
        coh = (
            min(len(answer) / 500, 1.0) * 30
            + min(len(sents) / 3, 1.0) * 30
            + (40 if 20 < avg < 200 else 20)
        )
    if n_sources == 0:
        cit = 50.0
    else:
        base = min(n_sources * 15, 80)
        ratio = len(answer) / max(n_sources * 100, 1)
        if 0.5 <= ratio <= 2.0:
            base += 20
        elif 0.3 <= ratio < 0.5 or 2.0 < ratio <= 3.0:
            base += 10
        cit = min(base, 100)
    scores = [rel, comp, ground, coh, cit]
    total = sum(
        s * w
        for s, w in zip(
            scores,
            [0.30, 0.25, 0.25, 0.10, 0.10],
        )
    )
    mean = sum(scores) / len(scores)
    var = sum((s - mean) ** 2 for s in scores) / len(scores)
    conf = "high" if var < 100 else ("medium" if var < 400 else "low")
    return {
        "context_relevance": round(rel, 1),
        "answer_completeness": round(comp, 1),
        "factual_grounding": round(ground, 1),
        "coherence": round(coh, 1),
        "citation_quality": round(cit, 1),
        "total_score": round(total, 1),
        "confidence": conf,
    }
