"""Token-budget request splitting (reference core/token_manager.py:
26-316, core/llm.py:542-616) — batch preparation for LLM calls at
corpus scale.

Token counting uses the reference's documented fallback approximation
(``max(1, len(text)//4)``, token_manager.py:132-144 — tiktoken is an
optional dependency there and absent here); the packing semantics are
the reference's greedy loop exactly: per query, chunks are packed in
order into batches of at most ``available = budget - query_tokens -
system_tokens`` tokens, and a chunk larger than the whole budget is
truncated into its own batch.

Batchless cases are represented as ZERO output rows (the row-based
contract has no "empty batch" row): an empty retrieval yields no rows,
and a query whose own tokens (+system) exceed the budget yields no
rows — callers that must distinguish "over-budget query" from "empty
retrieval" should pre-check ``approx_tokens(query) + system_tokens >=
context_size - RESERVED_TOKENS``. (The reference emits one
``(query, [], n)`` sentinel batch for an empty retrieval,
token_manager.py:221-316 — a list-based contract; the divergence is
deliberate and documented here.)

Spark shape: the packer is inherently sequential PER QUERY (batch
boundaries depend on the running total), so it runs as
``applyInPandas`` per query group — groups are top-k retrievals
(tens of rows), while parallelism across queries is unbounded.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

RESERVED_TOKENS = 1000  # token_manager.py:68-73


def approx_tokens(text: str) -> int:
    """Reference fallback token estimate (token_manager.py:144)."""
    if not text:
        return 0
    return max(1, len(text) // 4)


def py_split_batches(
    query: str,
    contents: list[str],
    context_size: int,
    system_tokens: int = 0,
) -> list[tuple[int, str, bool]]:
    """Pure-Python trace of split_context_chunks (token_manager.py:
    221-316): [(batch_id, content, truncated)]."""
    max_chunk_tokens = context_size - RESERVED_TOKENS
    available = max_chunk_tokens - approx_tokens(query) - system_tokens
    if available <= 0:
        return []
    out: list[tuple[int, str, bool]] = []
    batch = 0
    current = 0
    used_current = False
    for content in contents:
        t = approx_tokens(content)
        if t > available:
            # oversized chunk: close the open batch, emit a lone
            # truncated batch (truncate by the 4-chars/token estimate)
            if used_current:
                batch += 1
            out.append((batch, content[: available * 4], True))
            batch += 1
            current = 0
            used_current = False
            continue
        if current + t > available:
            if used_current:
                batch += 1
            current = t
        else:
            current += t
        out.append((batch, content, False))
        used_current = True
    return out


def _batch_schema(id_type: T.DataType) -> T.StructType:
    """Output schema preserving the caller's query_id type (long ids
    from synthetic tables, string ids from the batch serving family)."""
    return T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("batch_id", T.IntegerType()),
            T.StructField("chunk_index", T.IntegerType()),
            T.StructField("content", T.StringType()),
            T.StructField("truncated", T.BooleanType()),
        ]
    )


BATCH_SCHEMA = _batch_schema(T.LongType())


def token_batches(
    retrieved: DataFrame,
    context_size: int = 8192,
    system_tokens: int = 0,
) -> DataFrame:
    """(query_id, query, chunk_index, content) -> one row per chunk with
    its assigned LLM-request batch_id (order = chunk_index within
    query). Each batch fits the token budget; downstream the batches
    group into per-request prompts. query_id keeps its input type."""

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (query_id,) = key
        pdf = pdf.sort_values("chunk_index")
        query = pdf["query"].iloc[0] if len(pdf) else ""
        packed = py_split_batches(query, list(pdf["content"]), context_size, system_tokens)
        rows = []
        for (batch_id, content, truncated), idx in zip(packed, pdf["chunk_index"]):
            rows.append((query_id, batch_id, int(idx), content, truncated))
        return pd.DataFrame(
            rows, columns=["query_id", "batch_id", "chunk_index", "content", "truncated"]
        )

    schema = _batch_schema(retrieved.schema["query_id"].dataType)
    return retrieved.groupBy("query_id").applyInPandas(pack, schema=schema)
