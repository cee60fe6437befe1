"""Dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

import pytest

from graphrag_spark.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    normalized_exact_dedup,
    simhash_near_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees "
) * 6


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, BASE.replace("lazy", "sleepy")),  # near dup
        (4, "completely different content about spark shuffle partitions " * 10),
        (5, "  " + BASE.upper() + "  "),  # normalized dup of 1
        (6, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs_df):
    got = {r["survivor_id"]: r["n_dups"] for r in exact_dedup(docs_df).collect()}
    assert got[1] == 2  # docs 1,2 identical
    assert sum(got.values()) == 6


def test_normalized_exact_dedup(spark, docs_df):
    got = {r["survivor_id"]: r["n_dups"] for r in normalized_exact_dedup(docs_df).collect()}
    assert got[1] == 3  # 1,2,5 collapse after case/ws normalization


def test_ngram_jaccard_bounds():
    assert ngram_jaccard(BASE, BASE) == 1.0
    assert ngram_jaccard(BASE, "zzz yyy xxx www vvv") == 0.0
    near = ngram_jaccard(BASE, BASE.replace("lazy", "sleepy"))
    assert 0.5 < near < 1.0


def test_minhash_finds_near_dups(spark, docs_df):
    pairs = {(r["src"], r["dst"]): r["est_jaccard"] for r in minhash_lsh_pairs(docs_df, threshold=0.5).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup found
    for (a, b) in pairs:
        assert {a, b} != {4, 6}
    assert not any(4 in p or 6 in p for p in pairs)


def test_minhash_estimate_tracks_true_jaccard(spark, docs_df):
    pairs = {(r["src"], r["dst"]): r["est_jaccard"] for r in minhash_lsh_pairs(docs_df, threshold=0.3).collect()}
    true_j = ngram_jaccard(BASE, BASE.replace("lazy", "sleepy"))
    est = pairs.get((1, 3)) or pairs.get((2, 3))
    assert est is not None
    assert abs(est - true_j) < 0.25  # 64-perm estimator tolerance


def test_simhash_near_pairs(spark, docs_df):
    got = {(r["src"], r["dst"]): r["hamming"] for r in simhash_near_pairs(docs_df, max_hamming=10).collect()}
    assert got.get((1, 2)) == 0  # identical docs
    assert (1, 5) not in got or got[(1, 5)] > 0  # case change shifts words
    near = got.get((1, 3))
    assert near is not None and near <= 10


def test_embedding_lsh_recall(spark):
    """SRP-LSH near-dup recall on planted near-duplicate pairs: with the
    default 8x8 banding, a pair at cosine ~0.98 collides in >=1 band
    with probability ~0.9998, so planted recall must be near-total.
    (This op is probabilistic by design — it is the one dedup path the
    driver checks rows-only, so the recall property is pinned here.)"""
    import numpy as np

    from graphrag_spark.dedup import embedding_near_dups

    rng = np.random.RandomState(0)
    base = rng.randn(40, 64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        w = v + 0.02 * rng.randn(64)
        w /= np.linalg.norm(w)
        rows.append((1000 + i, w.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in embedding_near_dups(df, threshold=0.95).collect()
    }
    planted = {(i, 1000 + i) for i in range(40)}
    recall = len(got & planted) / len(planted)
    assert recall >= 0.9, recall
    # every emitted pair is exact-verified >= threshold: no false accepts
    for s, d in got:
        va = dict(rows)[s]
        vb = dict(rows)[d]
        assert float(np.dot(va, vb)) >= 0.95 - 1e-9


def test_minhash_single_row_bands_full_recall(spark, docs_df):
    """bands == num_perm (single-row bands) must emit EXACTLY the
    brute-force pair set at the threshold (pigeonhole guarantee used by
    the driver oracle)."""
    from graphrag_spark.dedup import minhash_pairs_from_signatures, minhash_signatures

    sigs = minhash_signatures(docs_df)
    rows = {r["id"]: r["signature"] for r in sigs.collect()}
    brute = set()
    for a in rows:
        for b in rows:
            if a < b:
                est = sum(x == y for x, y in zip(rows[a], rows[b])) / 64.0
                if est >= 0.5:
                    brute.add((a, b))
    got = {
        (r["src"], r["dst"])
        for r in minhash_pairs_from_signatures(sigs, bands=64, threshold=0.5).collect()
    }
    assert got == brute


def test_simhash128_full_recall_and_fewer_collisions(spark):
    """128-bit banded search must emit EXACTLY the brute-force pair set
    at the radius (pigeonhole recall), and its bands must not produce
    more candidates than the 64-bit path on the same corpus."""
    import numpy as np

    from graphrag_spark.dedup import simhash128_near_pairs, simhash128_signatures

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    for d in range(60):
        words = [vocab[rng.randint(len(vocab))] for _ in range(80)]
        rows.append((d, " ".join(words)))
        if d % 4 == 0:  # planted near-dup: flip a couple of words
            mutated = list(words)
            mutated[3] = vocab[rng.randint(len(vocab))]
            rows.append((1000 + d, " ".join(mutated)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sig = {r["id"]: (r["sim_lo"], r["sim_hi"]) for r in simhash128_signatures(df).collect()}
    def ham(a, b):
        return bin((a[0] ^ b[0]) & ((1 << 64) - 1)).count("1") + bin(
            (a[1] ^ b[1]) & ((1 << 64) - 1)
        ).count("1")

    brute = {
        (a, b)
        for a in sig
        for b in sig
        if a < b and ham(sig[a], sig[b]) <= 12
    }
    got = {
        (r["src"], r["dst"])
        for r in simhash128_near_pairs(df, max_hamming=12).collect()
    }
    assert got == brute
    assert any(True for _ in brute), "corpus planted no near-dups at radius 12"


def test_ngram_jaccard_pairs_exact(spark, docs_df):
    """The inverted-index set-similarity join must equal the pairwise
    ngram_jaccard primitive on every candidate pair."""
    from graphrag_spark.dedup import ngram_jaccard_pairs_from_shingles, shingle_sets

    texts = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    got = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in ngram_jaccard_pairs_from_shingles(shingle_sets(docs_df), threshold=0.3).collect()
    }
    brute = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = ngram_jaccard(texts[a], texts[b])
            if j >= 0.3:
                brute[(a, b)] = round(j, 6)
    assert got == brute


def test_minhash_pairs_empty_signatures(spark):
    """Empty input must yield an empty pair frame, not a crash
    (ADVICE r2: .first() returned None before num_perm was read)."""
    from graphrag_spark.dedup import minhash_pairs_from_signatures

    empty = spark.createDataFrame([], "id long, signature array<long>")
    out = minhash_pairs_from_signatures(empty, bands=16, threshold=0.8)
    assert out.columns == ["src", "dst", "est_jaccard"]
    assert out.count() == 0


def test_simhash128_tight_radius_full_word_bands(spark, docs_df):
    """max_hamming <= 1 gives 2 bands of 64 bits each; the band mask
    must not build lit(2^64-1) (ADVICE r2: LongType overflow). The
    banded result must still equal brute force at the radius."""
    from graphrag_spark.dedup import (
        simhash128_pairs_from_signatures,
        simhash128_signatures,
    )

    sigs = simhash128_signatures(docs_df)
    sig = {r["id"]: (r["sim_lo"], r["sim_hi"]) for r in sigs.collect()}

    def ham(a, b):
        return bin((a[0] ^ b[0]) & ((1 << 64) - 1)).count("1") + bin(
            (a[1] ^ b[1]) & ((1 << 64) - 1)
        ).count("1")

    for radius in (0, 1):
        brute = {(a, b) for a in sig for b in sig if a < b and ham(sig[a], sig[b]) <= radius}
        got = {
            (r["src"], r["dst"])
            for r in simhash128_pairs_from_signatures(sigs, max_hamming=radius).collect()
        }
        assert got == brute
    # docs 1/2 are exact dups, so radius 0 must find at least that pair
    assert (1, 2) in {(a, b) for a in sig for b in sig if a < b and ham(sig[a], sig[b]) == 0}


def test_ngram_prefix_filter_bounds_hot_shingle(spark):
    """A planted ubiquitous shingle must NOT produce O(n^2) candidate
    pairs under the prefix filter (VERDICT r2 'hot-shingle fan-out'),
    and the verified result must still equal brute force (recall is
    deterministic at the threshold — see _prefix_index)."""
    import numpy as np

    from graphrag_spark.dedup import (
        _prefix_index,
        ngram_jaccard,
        ngram_jaccard_pairs_from_shingles,
        shingle_sets,
    )

    rng = np.random.RandomState(7)
    vocab = [f"tok{i}" for i in range(500)]
    hot = "the quick brown"  # appears in EVERY doc
    rows = []
    for d in range(80):
        words = [vocab[rng.randint(len(vocab))] for _ in range(60)]
        rows.append((d, hot + " " + " ".join(words)))
    rows.append((900, rows[0][1]))  # planted near-dup of doc 0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingle_sets(df)

    t = 0.5
    pref = _prefix_index(sh, t)
    n_docs = df.count()
    # candidate pairs from the prefix index
    cand = (
        pref.withColumnRenamed("id", "src")
        .join(pref.withColumnRenamed("id", "dst"), "s")
        .filter("src < dst")
        .select("src", "dst")
        .distinct()
        .count()
    )
    all_pairs = n_docs * (n_docs - 1) // 2
    # every doc shares the hot shingles; a full index would make every
    # pair a candidate — the prefix index must prune a large fraction
    assert cand < all_pairs * 0.75, (cand, all_pairs)

    got = {
        (r["src"], r["dst"]): r["jaccard"]
        for r in ngram_jaccard_pairs_from_shingles(sh, threshold=t).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    ids = sorted(texts)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            j = ngram_jaccard(texts[a], texts[b])
            if j >= t:
                brute[(a, b)] = round(j, 6)
    assert got == brute and (0, 900) in got


def test_prefix_length_exact_at_float_boundary(spark):
    """ADVICE r3: ceil over the float product 0.55*20 =
    11.000000000000002 would give prefix 9 instead of the lemma's 10 —
    the epsilon inside _prefix_index must keep the full bound."""
    from graphrag_spark.dedup import _prefix_index

    sh = spark.createDataFrame(
        [("d0", [float(i) for i in range(1, 21)])], "id string, shingles array<double>"
    )
    # |A|=20, t=0.55: prefix = 20 - ceil(11.0) + 1 = 10
    assert _prefix_index(sh, 0.55).count() == 10
    # and an exactly-at-threshold pair is still found end-to-end:
    # |A|=|B|=20, |A∩B|=15 -> J = 15/25 = 0.6 exactly
    a = [float(i) for i in range(1, 21)]
    b = [float(i) for i in range(6, 26)]
    sh2 = spark.createDataFrame(
        [("a", a), ("b", b)], "id string, shingles array<double>"
    )
    from graphrag_spark.dedup import ngram_jaccard_pairs_from_shingles

    got = ngram_jaccard_pairs_from_shingles(sh2, threshold=0.6).collect()
    assert [(r["src"], r["dst"], r["jaccard"]) for r in got] == [("a", "b", 0.6)]
