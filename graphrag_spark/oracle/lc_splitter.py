"""Independent trace of LangChain's ``RecursiveCharacterTextSplitter``.

The reference configures this splitter for all chunking
(core/chunking.py:21-25: separators ["\\n\\n", "\\n", " ", ""],
chunk_size/chunk_overlap from settings, all other parameters at their
defaults: keep_separator=True, strip_whitespace=True,
length_function=len, is_separator_regex=False).

LangChain itself is not installable in this environment, so this module
re-implements the published algorithm (langchain_text_splitters/
character.py ``RecursiveCharacterTextSplitter._split_text`` and
base.py ``TextSplitter._merge_splits`` — public Apache-2.0 code) as an
independent pure-Python trace. It is used ONLY as a test oracle:
``graphrag_spark.chunking.recursive_split`` (the engine's own
implementation) is property- and golden-tested against it, replacing
the round-1 self-verification gap flagged in VERDICT.md ("What's
missing" #1).

Also here: ``reference_offsets`` — the exact offset-tracking loop the
reference runs over the splitter output (core/chunking.py:69-78).
"""

from __future__ import annotations

import re

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]


def _split_text_with_regex(text: str, separator: str, keep_separator: bool) -> list[str]:
    """Trace of langchain_text_splitters.character._split_text_with_regex
    with is_separator_regex=False (separator arrives pre-escaped)."""
    if separator:
        if keep_separator:
            # parentheses keep the delimiters in the result; the
            # separator is re-attached to the START of the following
            # piece (keep_separator=True / "start" semantics)
            _splits = re.split(f"({separator})", text)
            splits = [_splits[i] + _splits[i + 1] for i in range(1, len(_splits), 2)]
            if len(_splits) % 2 == 0:
                splits += _splits[-1:]
            splits = [_splits[0]] + splits
        else:
            splits = re.split(separator, text)
    else:
        splits = list(text)
    return [s for s in splits if s != ""]


def _join_docs(docs: list[str], separator: str) -> str | None:
    """TextSplitter._join_docs with strip_whitespace=True (default)."""
    text = separator.join(docs).strip()
    return text if text != "" else None


def _merge_splits(splits: list[str], separator: str, chunk_size: int, chunk_overlap: int) -> list[str]:
    """Trace of TextSplitter._merge_splits — the greedy merge with
    separator-length accounting and overlap carry-over pop loop."""
    separator_len = len(separator)
    docs: list[str] = []
    current_doc: list[str] = []
    total = 0
    for d in splits:
        _len = len(d)
        if total + _len + (separator_len if len(current_doc) > 0 else 0) > chunk_size:
            if len(current_doc) > 0:
                doc = _join_docs(current_doc, separator)
                if doc is not None:
                    docs.append(doc)
                # keep popping while we exceed the overlap budget, or
                # while adding d would still overflow a non-empty window
                while total > chunk_overlap or (
                    total + _len + (separator_len if len(current_doc) > 0 else 0) > chunk_size
                    and total > 0
                ):
                    total -= len(current_doc[0]) + (separator_len if len(current_doc) > 1 else 0)
                    current_doc = current_doc[1:]
        current_doc.append(d)
        total += _len + (separator_len if len(current_doc) > 1 else 0)
    doc = _join_docs(current_doc, separator)
    if doc is not None:
        docs.append(doc)
    return docs


def lc_split_text(
    text: str,
    chunk_size: int,
    chunk_overlap: int,
    separators: list[str] | None = None,
) -> list[str]:
    """Trace of RecursiveCharacterTextSplitter._split_text /
    split_text with keep_separator=True."""
    separators = DEFAULT_SEPARATORS if separators is None else separators

    def _go(t: str, seps: list[str]) -> list[str]:
        final_chunks: list[str] = []
        separator = seps[-1]
        new_separators: list[str] = []
        for i, _s in enumerate(seps):
            _sep = re.escape(_s)
            if _s == "":
                separator = _s
                break
            if re.search(_sep, t):
                separator = _s
                new_separators = seps[i + 1 :]
                break
        splits = _split_text_with_regex(t, re.escape(separator), keep_separator=True)
        good_splits: list[str] = []
        merge_sep = ""  # keep_separator=True -> separators ride on the pieces
        for s in splits:
            if len(s) < chunk_size:
                good_splits.append(s)
            else:
                if good_splits:
                    final_chunks.extend(_merge_splits(good_splits, merge_sep, chunk_size, chunk_overlap))
                    good_splits = []
                if not new_separators:
                    final_chunks.append(s)
                else:
                    final_chunks.extend(_go(s, new_separators))
        if good_splits:
            final_chunks.extend(_merge_splits(good_splits, merge_sep, chunk_size, chunk_overlap))
        return final_chunks

    if not text:
        return []
    return _go(text, separators)


def reference_offsets(text: str, chunks: list[str]) -> list[int]:
    """The reference's offset-tracking loop, verbatim semantics
    (core/chunking.py:69-78): find each chunk at/after the END of the
    previous chunk; fall back to the running offset when not found.
    Note overlapping chunks re-start BEFORE the previous end, so the
    find usually misses and the fallback offset (previous end) is what
    the reference actually stores — parity requires reproducing that."""
    out: list[int] = []
    current = 0
    for c in chunks:
        idx = text.find(c, current)
        if idx == -1:
            idx = current
        out.append(idx)
        current = idx + len(c)
    return out
