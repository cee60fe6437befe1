"""Pure-Python oracle: an independent, in-process implementation of the
reference pipeline's semantics (no Spark), used as the triple P/R
comparison target (FIXTURES.md §4, BASELINE.md correctness gate).

It follows the reference's extraction path step-for-step:
parse (entity_extraction.py:389-434) -> normalize (:223-271) ->
low-value filter (:273-298) -> per-chunk dedup (:300-338) -> global
dedup + upper-key (:552-557) -> both-endpoints semijoin (:564-566) ->
unordered pair grouping (:567-571) with last-writer-wins survivor
(core/graph_db.py:1023-1028), extended with the same alias-dictionary
linking + connected-components canonicalization the Spark pipeline
performs (north_star). The deterministic extractor and the pipe-format
parser are *shared* with the Spark pipeline by design — they are the
stand-in for the LLM contract; everything downstream is implemented
independently (plain dicts + union-find vs. DataFrames).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from ..chunking import split_with_offsets
from ..extraction import det_extract_response, parse_extraction_response
from ..normalize import py_is_low_value, py_norm_name, py_norm_type
from ..vocab import aliases_as_rows


def _alias_dict() -> dict[str, tuple[str, str, float]]:
    """alias_key -> (canonical_name, canonical_type, prior); duplicate
    keys resolved by max (prior, canonical_name) — mirrors
    linking.alias_dictionary."""
    d: dict[str, tuple[str, str, float]] = {}
    for alias, canonical, etype, prior in aliases_as_rows():
        key = py_norm_name(alias).lower()
        cur = d.get(key)
        cand = (canonical, py_norm_type(etype), float(prior))
        if cur is None or (cand[2], cand[0]) > (cur[2], cur[0]):
            d[key] = cand
    return d


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = self.find(p)
        return self.parent[x]

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-label union for determinism (matches label propagation)
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


@dataclass
class OracleResult:
    entities: dict[tuple[str, str], dict] = field(default_factory=dict)  # (name_key, type) -> merged entity
    cmap: dict[str, str] = field(default_factory=dict)  # name_key -> canonical name
    triples: list[dict] = field(default_factory=list)
    mentions: list[tuple[str, str]] = field(default_factory=list)  # (chunk_id, name_key)


def run_oracle(docs: list[tuple[str, list[dict]]], chunk_size: int = 1000, overlap: int = 200) -> OracleResult:
    """docs: [(doc_id, spans)] with span dicts (kind, text, media_ref,
    offset). Returns the reference-semantics KG."""
    res = OracleResult()
    per_chunk_entities: list[dict] = []  # rows after per-chunk dedup
    raw_rels: list[dict] = []

    for doc_id, spans in docs:
        content = "\n\n".join(s["text"] for s in spans if s["kind"] == "text")
        for i, (chunk, _off) in enumerate(split_with_offsets(content, chunk_size, overlap)):
            chunk_id = f"{doc_id}_chunk_{i}"
            ents, rels = parse_extraction_response(det_extract_response(chunk))
            # normalize + low-value filter (per mention)
            norm_rows = []
            for e in ents:
                name = py_norm_name(e["name"])
                etype = py_norm_type(e["type"])
                if not name or py_is_low_value(name, etype, e["importance"]):
                    continue
                norm_rows.append(
                    {
                        "chunk_id": chunk_id,
                        "name": name,
                        "name_key": name.lower(),
                        "type": etype,
                        "importance": e["importance"],
                        "description": e["description"],
                    }
                )
            # E9: per-chunk dedup keyed (name_key, type) — the
            # reference's dedup key (entity_extraction.py:306-310)
            by_key: dict[tuple[str, str], list[dict]] = defaultdict(list)
            for r in norm_rows:
                by_key[(r["name_key"], r["type"])].append(r)
            for (key, etype), rows in by_key.items():
                best = max(rows, key=lambda r: (r["importance"], r["name"]))
                per_chunk_entities.append(
                    {
                        "chunk_id": chunk_id,
                        "name_key": key,
                        "name": best["name"],
                        "type": etype,
                        "importance": sum(r["importance"] for r in rows) / len(rows),
                        "description": max(
                            (r["description"] for r in rows), key=lambda d: (len(d), d)
                        ),
                    }
                )
            for r in rels:
                src = py_norm_name(r["source"])
                dst = py_norm_name(r["target"])
                if not src or not dst or src == dst:
                    continue
                raw_rels.append(
                    {
                        "chunk_id": chunk_id,
                        "src_key": src.lower(),
                        "dst_key": dst.lower(),
                        "strength": r["strength"],
                        "description": r["description"],
                    }
                )

    # E10/E11: global dedup keyed (name_key, type) — reference
    # entity_extraction.py:552-557 runs the same (name, type)-keyed
    # _deduplicate_entities over the whole document's entity list
    groups: dict[tuple[str, str], list[dict]] = defaultdict(list)
    for r in per_chunk_entities:
        groups[(r["name_key"], r["type"])].append(r)
    for (key, etype), rows in groups.items():
        res.entities[(key, etype)] = {
            "name_key": key,
            "display_name": min(r["name"] for r in rows),
            "entity_type": etype,
            "importance": round(sum(r["importance"] for r in rows) / len(rows), 6),
            "description": max((r["description"] for r in rows), key=lambda d: (len(d), d)),
            "source_chunks": sorted({r["chunk_id"] for r in rows}),
            "n_mentions": len(rows),
        }
        for r in rows:
            res.mentions.append((r["chunk_id"], key))

    # alias linking (J3) — the dictionary is keyed by surface name only
    adict = _alias_dict()
    linked: dict[tuple[str, str], dict] = {}
    for (key, _etype), ent in res.entities.items():
        hit = adict.get(key)
        linked[(key, _etype)] = {
            **ent,
            "canonical_name": hit[0] if hit else ent["display_name"],
            "canonical_type": hit[1] if hit else ent["entity_type"],
            "link_score": hit[2] if hit else 0.5,
            "dictionary_hit": hit is not None,
        }

    # connected components (G2) over surface->canonical edges
    uf = _UnionFind()
    for (key, _etype), ent in linked.items():
        uf.union(key, ent["canonical_name"].lower())
    comp_members: dict[str, list[dict]] = defaultdict(list)
    for (key, _etype), ent in linked.items():
        comp_members[uf.find(key)].append(ent)
    for comp, members in comp_members.items():
        rep = max(
            members,
            key=lambda m: (
                int(m["dictionary_hit"]),
                m["link_score"],
                round(m["importance"], 6),
                m["canonical_name"],
            ),
        )
        for m in members:
            res.cmap[m["name_key"]] = rep["canonical_name"]

    # E12/E13/A7: semijoin + unordered pair grouping, last-writer-wins
    pair_groups: dict[tuple[str, str], list[dict]] = defaultdict(list)
    for r in raw_rels:
        subj = res.cmap.get(r["src_key"])
        obj = res.cmap.get(r["dst_key"])
        if subj is None or obj is None or subj == obj:
            continue
        lo, hi = sorted([subj.upper(), obj.upper()])
        pair_groups[(lo, hi)].append({**r, "subj": subj, "obj": obj})
    for (_lo, _hi), rows in pair_groups.items():
        w = max(rows, key=lambda r: (r["strength"], r["description"], r["subj"], r["chunk_id"]))
        res.triples.append(
            {
                "subj": w["subj"],
                "pred": w["description"],
                "obj": w["obj"],
                "strength": w["strength"],
                "source_chunks": sorted({r["chunk_id"] for r in rows}),
            }
        )
    return res


def triple_keys(triples: list[dict]) -> set[tuple[str, str, str]]:
    """Unordered-pair triple identity for P/R (SURVEY.md §2 A7)."""
    out = set()
    for t in triples:
        lo, hi = sorted([t["subj"].upper(), t["obj"].upper()])
        out.add((lo, t["pred"], hi))
    return out


def precision_recall(
    ours: set[tuple[str, str, str]], ref: set[tuple[str, str, str]]
) -> tuple[float, float]:
    if not ours or not ref:
        return (0.0, 0.0)
    tp = len(ours & ref)
    return tp / len(ours), tp / len(ref)
