"""Document deduplication family for large-scale training-data curation.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band ->
bucket-join), SimHash (64-bit, banded hamming search), n-gram Jaccard
verification, and embedding-cosine near-dup (delegates to
similarity.lsh_bucket_pairs).

Scale posture: every method is shuffle-bounded by O(n * bands) candidate
generation rather than O(n^2); verification joins only touch candidate
pairs. Signatures are computed in Arrow-batched pandas UDFs (numpy
vectorized over the permutation axis); band-bucket grouping is a native
groupBy so AQE can coalesce/split it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from .vocab import SEED

# Mersenne prime 2^31 - 1: with a, b < p and x reduced mod p, the
# product a*x < 2^62 fits exactly in int64, so (a*x + b) % p is the
# true universal hash family — the round-1 2^61-1 variant wrapped the
# multiply mod 2^64 first, which is deterministic but not (a*x+b) mod p
# and weakened the unbiased-Jaccard-estimator property.
_MERSENNE = (1 << 31) - 1


# --------------------------------------------------------------- exact dedup

def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one surviving id per distinct text.
    Output: content_hash, survivor_id, n_dups."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("survivor_id"), F.count("*").alias("n_dups"))
    )


def normalized_exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup over whitespace/case-normalized content."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        docs.select(F.md5(norm).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("survivor_id"), F.count("*").alias("n_dups"))
    )


# ------------------------------------------------------------------ shingles

def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Word n-gram shingles -> stable 64-bit hashes.

    Uses pandas' keyed siphash (``pd.util.hash_array``) — C-vectorized
    and stable across processes/executors (Python's builtin ``hash`` is
    per-process salted and must never be used here)."""
    words = text.split()
    if len(words) < n:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return pd.util.hash_array(np.asarray(shingles, dtype=object), categorize=False)


def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """(id, shingles: array<long>) — the DISTINCT word n-gram shingle
    hashes per document (sorted for deterministic storage)."""
    schema = T.StructType(
        [
            T.StructField("id", docs.schema[id_col].dataType),
            T.StructField("shingles", T.ArrayType(T.LongType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                h = np.unique(_shingle_hashes(text or "", shingle_n).astype(np.int64))
                rows.append((did, h.tolist()))
            yield pd.DataFrame(rows, columns=["id", "shingles"])

    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def _prefix_index(sh: DataFrame, threshold: float) -> DataFrame:
    """Prefix-filtered inverted index (id, s): only the first
    ``|A| - ceil(t*|A|) + 1`` shingles of each (hash-sorted) shingle
    set are indexed.

    Recall argument (the prefix filtering principle, SSJoin/AllPairs):
    under any global total order — here the shingle hash value;
    ``shingle_sets`` stores arrays sorted ascending — if J(A,B) >= t
    then |A∩B| >= ceil(t*max(|A|,|B|)), and two sets with |A∩B| >= a
    must share an element within their ``(|X| - a + 1)``-prefixes
    (if a set's prefix misses B entirely, at most |X| - prefix_len =
    a - 1 < a elements remain to intersect). Taking the per-set bound
    a_X = ceil(t*|X|) — each true pair satisfies |A∩B| >= max(a_A,
    a_B), and the smaller-a side's prefix is only LONGER than the
    lemma needs — every qualifying pair collides on at least one
    indexed shingle: deterministic 100% recall at the threshold.

    The epsilon inside the ceil guards the float product: for
    thresholds whose double repr exceeds the rational value (0.55*20 =
    11.000000000000002) a bare ceil would overshoot by one and shorten
    the prefix below the lemma's bound; subtracting 1e-9 can only ever
    LENGTHEN the prefix (always recall-safe)."""
    n = F.size("shingles")
    plen = (n - F.ceil(n * F.lit(float(threshold)) - F.lit(1e-9)) + 1).cast("int")
    return sh.select(
        F.col("id"), F.explode(F.slice("shingles", F.lit(1), plen)).alias("s")
    )


def ngram_jaccard_pairs_from_shingles(sh: DataFrame, threshold: float = 0.5) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via a PREFIX-FILTERED
    inverted shingle index: index only the ``(1-t)*|A|+1`` smallest
    shingle hashes per doc (see ``_prefix_index`` for the recall
    proof), self-join on the shingle for candidate pairs, then verify
    each candidate exactly with a native ``array_intersect`` over the
    full (distinct, sorted) shingle arrays:
    J = |A∩B| / (|A|+|B|-|A∩B|).

    Scale posture: candidate generation shuffles O(sum of prefix
    lengths) index rows — at t=0.5 about half the former full index —
    and a ubiquitous "stop shingle" ("the quick brown") only fans out
    the self-join when it lands inside a prefix, which under the hash
    order happens for ~(1-t) of the docs containing it instead of all
    of them; verification touches candidate pairs only, each at
    O(|A|+|B|) via the JVM-side array intersect, never an all-pairs
    matrix and never the former per-pair exploded-row groupBy. For
    adversarial hot shingles, re-ranking the global order by ascending
    document frequency (rarest first — one extra df-aggregate pass)
    pushes frequent shingles out of every prefix; documented option,
    not needed at current corpus profiles."""
    pref = _prefix_index(sh, threshold)
    cand = (
        pref.withColumnRenamed("id", "src")
        .join(pref.withColumnRenamed("id", "dst"), "s")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    verified = (
        cand.join(sh.select(F.col("id").alias("src"), F.col("shingles").alias("sa")), "src")
        .join(sh.select(F.col("id").alias("dst"), F.col("shingles").alias("sb")), "dst")
        .select(
            "src",
            "dst",
            F.size(F.array_intersect("sa", "sb")).alias("inter"),
            F.size("sa").alias("na"),
            F.size("sb").alias("nb"),
        )
    )
    jac = F.round(
        F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
    )
    return (
        verified.select("src", "dst", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact n-gram Jaccard similarity (verification primitive)."""
    sa = set(_shingle_hashes(a, n).tolist())
    sb = set(_shingle_hashes(b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


# -------------------------------------------------------------- MinHash LSH

def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature: array<long>) — MinHash over word n-gram shingles.

    Permutations are (a*x + b) mod p universal hashes, vectorized over
    the permutation axis with numpy inside an Arrow batch.
    """
    rng = np.random.RandomState(SEED)
    A = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    B = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)

    schema = T.StructType(
        [
            T.StructField("id", docs.schema[id_col].dataType),
            T.StructField("signature", T.ArrayType(T.LongType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sh = (_shingle_hashes(text or "", shingle_n) % np.uint64(_MERSENNE)).astype(np.int64)
                if len(sh) == 0:
                    rows.append((did, [0] * num_perm))
                    continue
                # (num_perm, n_shingles) mod-p min per permutation;
                # a*x < 2^62 — exact in int64, no wraparound
                vals = (A[:, None] * sh[None, :] + B[:, None]) % _MERSENNE
                rows.append((did, vals.min(axis=1).tolist()))
            yield pd.DataFrame(rows, columns=["id", "signature"])

    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs: minhash -> banded buckets -> bucket join ->
    signature-level Jaccard estimate filter.

    Output: (src, dst, est_jaccard). est_jaccard = fraction of agreeing
    minhash components (unbiased Jaccard estimator).

    Recall guarantee: a pair with est >= threshold disagrees on at most
    (1-threshold)*num_perm components; if ``bands`` exceeds that count
    (only possible with single-row bands, bands == num_perm), at least
    one band must collide — deterministic 100% recall at the threshold.
    Fewer/wider bands give the classic probabilistic S-curve (cheaper
    shuffle, the 100 TB default).
    """
    sigs = minhash_signatures(docs, id_col, text_col, num_perm, shingle_n)
    return minhash_pairs_from_signatures(sigs, bands=bands, threshold=threshold)


def minhash_pairs_from_signatures(
    sigs: DataFrame, bands: int = 16, threshold: float = 0.7
) -> DataFrame:
    """Banded LSH pair generation over a precomputed (id, signature)
    frame (see minhash_lsh_pairs for the recall guarantee).

    ``ensure_parallelism`` (r6): a compact signature file scans as one
    partition, serializing the banding explode and every join probe;
    the adaptive repartition is a no-op at real scale."""
    from .session import ensure_parallelism

    first = sigs.select(F.size("signature").alias("n")).first()
    if first is None:  # empty input: no signatures, no pairs
        spark = sigs.sparkSession
        return spark.createDataFrame(
            [], T.StructType(
                [
                    T.StructField("src", sigs.schema["id"].dataType),
                    T.StructField("dst", sigs.schema["id"].dataType),
                    T.StructField("est_jaccard", T.DoubleType()),
                ]
            )
        )
    num_perm = int(first["n"])
    rows_per_band = num_perm // bands
    sigs = ensure_parallelism(sigs)

    # band/bucket rows carry ONLY the id: shipping the full signature
    # array through bands-per-row explode + self-join multiplies the
    # shuffle by ~bands x sig_len; signatures are re-joined once per
    # side onto the deduplicated candidate pairs instead
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band).cast("string")
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    left = banded.select("band", "bucket", F.col("id").alias("src"))
    right = banded.select("band", "bucket", F.col("id").alias("dst"))
    cand_ids = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    cands = (
        cand_ids.join(
            sigs.select(F.col("id").alias("src"), F.col("signature").alias("sig_a")), "src"
        ).join(
            sigs.select(F.col("id").alias("dst"), F.col("signature").alias("sig_b")), "dst"
        )
    )
    est = cands.select(
        "src",
        "dst",
        F.round(
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / F.lit(float(num_perm)),
            6,
        ).alias("est_jaccard"),
    )
    return est.filter(F.col("est_jaccard") >= threshold)


# ------------------------------------------------------------------- SimHash

def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word hashes (unweighted)."""
    schema = T.StructType(
        [
            T.StructField("id", docs.schema[id_col].dataType),
            T.StructField("simhash", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sh = _shingle_hashes(text or "", 1)
                if len(sh) == 0:
                    rows.append((did, 0))
                    continue
                bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                sig = int(((v >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
                rows.append((did, sig - (1 << 64) if sig >= (1 << 63) else sig))
            yield pd.DataFrame(rows, columns=["id", "simhash"])

    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via banded
    buckets (any identical band -> candidate; exact hamming verify).

    The band count is derived from ``max_hamming``: with ``b`` bands, a
    pair differing in ``<= b - 1`` bits must share at least one intact
    band (pigeonhole), so ``b = max_hamming + 1`` guarantees 100%
    recall at the requested radius — the round-1 fixed 4x16 banding
    silently missed pairs beyond hamming 3."""
    sigs = simhash_signatures(docs, id_col, text_col)
    return simhash_pairs_from_signatures(sigs, max_hamming=max_hamming)


def simhash_pairs_from_signatures(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Banded hamming search over a precomputed (id, simhash) frame
    (see simhash_near_pairs for the pigeonhole recall guarantee).

    Execution shape (r6, guide §2.3/§2.4): the hamming verify runs
    IN THE JOIN STAGE, before any dedup — hot buckets (template-heavy
    corpora concentrate simhash bands) make the raw join output
    quadratic in the hottest bucket, and the previous
    dropDuplicates-then-filter order hash-aggregated that entire
    candidate stream (19M rows at 50k docs) before throwing ~all of it
    away. Filtering first keeps the dedup input at O(true pairs).
    ``ensure_parallelism`` guards the probe side: a compact signature
    file scans as one partition, which would serialize the whole
    candidate generation."""
    from .session import ensure_parallelism

    sigs = ensure_parallelism(sigs)
    bands = min(max(max_hamming + 1, 2), 32)  # >=2-bit bands
    band_structs = []
    for b in range(bands):
        start = b * 64 // bands
        width = (b + 1) * 64 // bands - start
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), start)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bucket"),
            )
        )
    banded = sigs.select(
        "id", "simhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = banded.select("band", "bucket", F.col("id").alias("src"), F.col("simhash").alias("ha"))
    right = banded.select("band", "bucket", F.col("id").alias("dst"), F.col("simhash").alias("hb"))
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


_SIMHASH_KEY_HI = "graphrag-simhash"  # 16-byte siphash key for the hi word


def simhash128_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """128-bit SimHash as two 64-bit words (independent siphash keys).

    The corpus-scale variant: at a fixed band count b (pigeonhole:
    b = max_hamming + 1), band width grows from 64/b to 128/b bits, so
    the random band-collision rate drops by ~2^(64/b) — e.g. at
    max_hamming=8 (9 bands), ~7-bit bands become ~14-bit bands, cutting
    false candidates ~100x. The trade: hamming radius semantics are
    over 128 bits (a tighter similarity threshold per bit)."""
    schema = T.StructType(
        [
            T.StructField("id", docs.schema[id_col].dataType),
            T.StructField("sim_lo", T.LongType()),
            T.StructField("sim_hi", T.LongType()),
        ]
    )

    def word_sig(hashes: np.ndarray) -> int:
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        sig = int(((v >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").split()
                arr = np.asarray(words if words else [""], dtype=object)
                lo = pd.util.hash_array(arr, categorize=False)
                hi = pd.util.hash_array(arr, hash_key=_SIMHASH_KEY_HI, categorize=False)
                rows.append((did, word_sig(lo), word_sig(hi)))
            yield pd.DataFrame(rows, columns=["id", "sim_lo", "sim_hi"])

    return docs.select(id_col, text_col).mapInPandas(gen, schema=schema)


def _slice_bits_128(lo: F.Column, hi: F.Column, start: int, end: int) -> F.Column:
    """Bits [start, end) of the 128-bit value (hi:lo) as a long (the
    band value may be negative for full-word bands — it is only ever
    used as an opaque bucket key) — native bitwise column ops, handles
    word-straddling and full-64-bit bands (width == 64 must not build
    lit(2^64 - 1): that overflows LongType; a full word needs no mask)."""
    width = end - start
    if end <= 64:
        sh = F.shiftrightunsigned(lo, start)
        return sh if width >= 64 else sh.bitwiseAND(F.lit((1 << width) - 1))
    if start >= 64:
        sh = F.shiftrightunsigned(hi, start - 64)
        return sh if width >= 64 else sh.bitwiseAND(F.lit((1 << width) - 1))
    lo_part = F.shiftrightunsigned(lo, start)  # top (64-start) bits of lo
    hi_part = hi.bitwiseAND(F.lit((1 << (end - 64)) - 1))
    return lo_part.bitwiseOR(F.shiftleft(hi_part, 64 - start))


def simhash128_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs with 128-bit hamming <= max_hamming. Same banded
    pigeonhole scheme as the 64-bit path (b = max_hamming + 1 bands
    guarantee 100% recall), with ~2x wider bands — the 100 TB
    configuration (see simhash128_signatures)."""
    return simhash128_pairs_from_signatures(
        simhash128_signatures(docs, id_col, text_col), max_hamming=max_hamming
    )


def simhash128_pairs_from_signatures(sigs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Banded 128-bit hamming search over a precomputed
    (id, sim_lo, sim_hi) frame. Same r6 execution shape as the 64-bit
    path: hamming verify inside the join stage, dedup only true pairs
    (see simhash_pairs_from_signatures)."""
    from .session import ensure_parallelism

    sigs = ensure_parallelism(sigs)
    bands = min(max(max_hamming + 1, 2), 32)
    band_structs = []
    for b in range(bands):
        start = b * 128 // bands
        end = (b + 1) * 128 // bands
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                _slice_bits_128(F.col("sim_lo"), F.col("sim_hi"), start, end).alias("bucket"),
            )
        )
    banded = sigs.select(
        "id", "sim_lo", "sim_hi", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "sim_lo", "sim_hi", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = banded.select("band", "bucket", F.col("id").alias("src"), F.col("sim_lo").alias("la"), F.col("sim_hi").alias("ha"))
    right = banded.select("band", "bucket", F.col("id").alias("dst"), F.col("sim_lo").alias("lb"), F.col("sim_hi").alias("hb"))
    hamming = F.bit_count(F.col("la").bitwiseXOR(F.col("lb"))) + F.bit_count(
        F.col("ha").bitwiseXOR(F.col("hb"))
    )
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------- embedding near-dup

def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing."""
    from .similarity import lsh_bucket_pairs

    return lsh_bucket_pairs(embeddings, threshold=threshold, id_col=id_col, vec_col=vec_col)
