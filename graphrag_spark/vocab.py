"""Deterministic entity vocabulary + alias dictionary (seed=42).

Mirrors FIXTURES.md §2: ~2000 canonical entities across the reference's
10 canonical entity types (reference: core/entity_extraction.py:115-126),
1-5 surface-form aliases per entity constructed to exercise the
reference's normalization rules (entity_extraction.py:223-271), plus
low-value decoys that the importance<0.3 filter must drop
(entity_extraction.py:273-298).

Everything is generated from fixed word lists with a seeded RNG — no
external data. The alias dictionary is the broadcast side of the
entity-link join (SURVEY.md §2 J3).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

SEED = 42

CANONICAL_TYPES = [
    "PERSON",
    "ORGANIZATION",
    "LOCATION",
    "EVENT",
    "CONCEPT",
    "TECHNOLOGY",
    "PRODUCT",
    "DOCUMENT",
    "DATE",
    "MONEY",
]

# Messy type strings the extractor may emit -> canonical type, modeled on
# the reference's 60+-entry mapping table (entity_extraction.py:151-217).
TYPE_ALIASES: dict[str, str] = {
    "PERSON": "PERSON",
    "PEOPLE": "PERSON",
    "INDIVIDUAL": "PERSON",
    "HUMAN": "PERSON",
    "ORG": "ORGANIZATION",
    "ORGANIZATION": "ORGANIZATION",
    "ORGANISATION": "ORGANIZATION",
    "COMPANY": "ORGANIZATION",
    "CORPORATION": "ORGANIZATION",
    "INSTITUTION": "ORGANIZATION",
    "AGENCY": "ORGANIZATION",
    "LOCATION": "LOCATION",
    "PLACE": "LOCATION",
    "CITY": "LOCATION",
    "COUNTRY": "LOCATION",
    "REGION": "LOCATION",
    "GPE": "LOCATION",
    "EVENT": "EVENT",
    "MEETING": "EVENT",
    "CONFERENCE": "EVENT",
    "INCIDENT": "EVENT",
    "CONCEPT": "CONCEPT",
    "IDEA": "CONCEPT",
    "TOPIC": "CONCEPT",
    "THEORY": "CONCEPT",
    "TECHNOLOGY": "TECHNOLOGY",
    "TECH": "TECHNOLOGY",
    "SOFTWARE": "TECHNOLOGY",
    "SYSTEM": "TECHNOLOGY",
    "PLATFORM": "TECHNOLOGY",
    "TOOL": "TECHNOLOGY",
    "PRODUCT": "PRODUCT",
    "SERVICE": "PRODUCT",
    "DEVICE": "PRODUCT",
    "DOCUMENT": "DOCUMENT",
    "REPORT": "DOCUMENT",
    "PAPER": "DOCUMENT",
    "FILE": "DOCUMENT",
    "CONTRACT": "DOCUMENT",
    "DATE": "DATE",
    "TIME": "DATE",
    "YEAR": "DATE",
    "PERIOD": "DATE",
    "MONEY": "MONEY",
    "CURRENCY": "MONEY",
    "AMOUNT": "MONEY",
    "PRICE": "MONEY",
    "COST": "MONEY",
}
# Parenthesized variants the fixture extractor emits (" (primary)"),
# enumerated in the table exactly as the reference enumerates the
# parenthetical forms its LLM emits (entity_extraction.py:151-217) —
# the normalization *algorithm* only falls back to pre-paren base
# types when they are already canonical.
TYPE_ALIASES.update({f"{k} (PRIMARY)": v for k, v in list(TYPE_ALIASES.items())})

_FIRST = [
    "Alice", "Boris", "Carmen", "Dmitri", "Elena", "Farid", "Greta",
    "Hiro", "Ines", "Jonas", "Katya", "Luis", "Mira", "Nadia", "Omar",
    "Priya", "Quentin", "Rosa", "Stefan", "Tara", "Ulrich", "Vera",
    "Wendell", "Ximena", "Yusuf", "Zara",
]
_LAST = [
    "Anderov", "Brightwell", "Calloway", "Dunmore", "Eriksen", "Falkner",
    "Grimaldi", "Holloway", "Ivankov", "Jessup", "Kowalski", "Larkspur",
    "Moreno", "Novak", "Oyelaran", "Petrov", "Quinley", "Rasmussen",
    "Sorenson", "Takahashi", "Underwood", "Vasquez", "Whitfield",
    "Yamamoto", "Zielinski",
]
_ORG_A = [
    "Quantum", "Apex", "Borealis", "Cobalt", "Delta", "Ember", "Falcon",
    "Granite", "Helix", "Ion", "Juniper", "Krypton", "Lumen", "Meridian",
    "Nimbus", "Orchid", "Pinnacle", "Radian", "Summit", "Titan",
    "Umbra", "Vertex", "Willow", "Zenith",
]
_ORG_B = [
    "Dynamics", "Systems", "Analytics", "Industries", "Holdings",
    "Robotics", "Networks", "Ventures", "Biotech", "Logistics",
    "Materials", "Energy", "Capital", "Labs", "Aerospace", "Foundry",
]
_ORG_SUFFIX = ["Corp", "Inc", "Ltd", "Group", "LLC", "Co"]
_LOC_A = [
    "North", "South", "East", "West", "Upper", "Lower", "New", "Old",
    "Port", "Lake", "Mount", "Fort",
]
_LOC_B = [
    "Haverton", "Brindlemere", "Caskwell", "Dorchester", "Eastvale",
    "Fenwick", "Galloway", "Harrowgate", "Ironbridge", "Juneberry",
    "Kingsford", "Larchmont", "Mirefield", "Northam", "Oakhurst",
    "Pembrook", "Quarryville", "Ravenswood", "Silverton", "Thornbury",
]
_TECH = [
    "Engine", "Framework", "Protocol", "Pipeline", "Compiler", "Kernel",
    "Runtime", "Scheduler", "Optimizer", "Allocator", "Codec", "Cache",
]
_CONCEPT = [
    "Resilience", "Throughput", "Latency", "Scalability", "Consistency",
    "Durability", "Availability", "Efficiency", "Redundancy", "Integrity",
    "Observability", "Elasticity",
]
_EVENT_B = ["Summit", "Symposium", "Expo", "Forum", "Congress", "Workshop"]
_PRODUCT_B = ["Station", "Module", "Array", "Console", "Sensor", "Drive"]

# Low-value decoy surface forms the pipeline must filter out
# (reference low-value patterns, entity_extraction.py:129-148).
DECOYS = [
    "the system", "this document", "various items", "some people",
    "it", "they", "data", "information", "12", "overview",
]


@dataclass(frozen=True)
class Entity:
    canonical_name: str
    entity_type: str
    importance: float  # base importance prior in [0,1]


@dataclass(frozen=True)
class Alias:
    alias: str
    canonical_name: str
    entity_type: str
    prior: float


def _messy_type(rng: np.random.RandomState, canonical: str) -> str:
    """Pick a messy surface type string that normalizes to `canonical`."""
    options = [k for k, v in TYPE_ALIASES.items() if v == canonical]
    s = options[int(rng.randint(len(options)))]
    style = int(rng.randint(4))
    if style == 0:
        return s.lower()
    if style == 1:
        return s.capitalize()
    if style == 2:
        return s + " (primary)"
    return s


def _alias_variants(rng: np.random.RandomState, name: str) -> list[str]:
    """Surface-form variants exercising normalization rules
    (whitespace collapse, punctuation strip, parentheticals —
    entity_extraction.py:223-246)."""
    variants = [name]
    n_extra = int(rng.randint(0, 4))
    pool = []
    pool.append(name + " (ref)")
    pool.append("  " + name.replace(" ", "  ") + " ")
    pool.append(name + ",")
    pool.append(name.upper())
    rng.shuffle(pool)
    variants.extend(pool[:n_extra])
    # de-dup preserving order
    seen: set[str] = set()
    out = []
    for v in variants:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


@lru_cache(maxsize=1)
def build_vocabulary(n_entities: int = 2000) -> tuple[list[Entity], list[Alias]]:
    """Build the deterministic canonical-entity list + alias dictionary."""
    rng = np.random.RandomState(SEED)
    entities: list[Entity] = []
    seen_names: set[str] = set()
    draws = [0]
    max_draws = n_entities * 200  # hard guard against name-space exhaustion

    def add(name: str, etype: str) -> None:
        draws[0] += 1
        if draws[0] > max_draws:
            raise RuntimeError("vocabulary name space exhausted — widen word lists")
        if name in seen_names:
            return
        seen_names.add(name)
        imp = round(0.4 + 0.6 * float(rng.rand()), 2)
        entities.append(Entity(name, etype, imp))

    quota = {
        "PERSON": 0.2, "ORGANIZATION": 0.2, "LOCATION": 0.15,
        "TECHNOLOGY": 0.1, "CONCEPT": 0.1, "PRODUCT": 0.08,
        "EVENT": 0.07, "DOCUMENT": 0.05, "DATE": 0.03, "MONEY": 0.02,
    }
    counts = {t: int(n_entities * q) for t, q in quota.items()}
    while len(entities) < counts["PERSON"]:
        add(f"{_FIRST[int(rng.randint(len(_FIRST)))]} {_LAST[int(rng.randint(len(_LAST)))]}", "PERSON")
    target = counts["PERSON"] + counts["ORGANIZATION"]
    while len(entities) < target:
        name = f"{_ORG_A[int(rng.randint(len(_ORG_A)))]} {_ORG_B[int(rng.randint(len(_ORG_B)))]} {_ORG_SUFFIX[int(rng.randint(len(_ORG_SUFFIX)))]}"
        add(name, "ORGANIZATION")
    _loc_sfx = ["", " Heights", " Valley", " Falls", " Crossing", " Bay"]
    target += counts["LOCATION"]
    while len(entities) < target:
        add(
            f"{_LOC_A[int(rng.randint(len(_LOC_A)))]} {_LOC_B[int(rng.randint(len(_LOC_B)))]}"
            f"{_loc_sfx[int(rng.randint(len(_loc_sfx)))]}",
            "LOCATION",
        )
    target += counts["TECHNOLOGY"]
    while len(entities) < target:
        add(
            f"{_ORG_A[int(rng.randint(len(_ORG_A)))]} {_TECH[int(rng.randint(len(_TECH)))]} v{int(rng.randint(1, 10))}",
            "TECHNOLOGY",
        )
    _con_sfx = ["Principle", "Doctrine", "Model", "Paradigm", "Pattern", "Index"]
    target += counts["CONCEPT"]
    while len(entities) < target:
        add(
            f"{_CONCEPT[int(rng.randint(len(_CONCEPT)))]} {_CONCEPT[int(rng.randint(len(_CONCEPT)))]} "
            f"{_con_sfx[int(rng.randint(len(_con_sfx)))]}",
            "CONCEPT",
        )
    target += counts["PRODUCT"]
    while len(entities) < target:
        add(f"{_ORG_A[int(rng.randint(len(_ORG_A)))]} {_PRODUCT_B[int(rng.randint(len(_PRODUCT_B)))]} {int(rng.randint(1, 30))}", "PRODUCT")
    target += counts["EVENT"]
    while len(entities) < target:
        add(f"{_LOC_B[int(rng.randint(len(_LOC_B)))]} {_EVENT_B[int(rng.randint(len(_EVENT_B)))]} {1990 + int(rng.randint(40))}", "EVENT")
    target += counts["DOCUMENT"]
    while len(entities) < target:
        add(f"{_CONCEPT[int(rng.randint(len(_CONCEPT)))]} Report {int(rng.randint(100, 999))}", "DOCUMENT")
    target += counts["DATE"]
    while len(entities) < target:
        add(f"Q{int(rng.randint(1, 5))} {1990 + int(rng.randint(40))} Quarter", "DATE")
    while len(entities) < n_entities:
        add(f"{int(rng.randint(1, 900))} Million Fund", "MONEY")

    aliases: list[Alias] = []
    for e in entities:
        for v in _alias_variants(rng, e.canonical_name):
            aliases.append(Alias(v, e.canonical_name, _messy_type(rng, e.entity_type), e.importance))
    # decoys: low prior -> extractor emits them with importance<0.3 and
    # the low-value filter must remove them
    for d in DECOYS:
        aliases.append(Alias(d, d.title(), "CONCEPT", 0.1))
    return entities, aliases


def entity_id(name: str) -> str:
    """Reference entity id: md5(name.lower())[:16]
    (ingestion/document_processor.py:123-125)."""
    return hashlib.md5(name.lower().encode("utf-8")).hexdigest()[:16]


def aliases_as_rows(n_entities: int = 2000) -> list[tuple[str, str, str, float]]:
    _, aliases = build_vocabulary(n_entities)
    return [(a.alias, a.canonical_name, a.entity_type, a.prior) for a in aliases]


@lru_cache(maxsize=1)
def aliases_by_entity(n_entities: int = 2000) -> dict[str, list[Alias]]:
    """canonical_name -> its alias surface forms (corpus injection picks
    among these; whitespace-mess variants are excluded from injection —
    they stay in the dictionary to exercise the broadcast-join side)."""
    _, aliases = build_vocabulary(n_entities)
    out: dict[str, list[Alias]] = {}
    for a in aliases:
        if a.alias.strip() != a.alias or "  " in a.alias:
            continue
        out.setdefault(a.canonical_name, []).append(a)
    return out
