"""Canonicalization: connected components via iterative label propagation.

The reference's only build-time canonicalization is exact-key merge
(core/entity_extraction.py:552-557) plus soft aliasing through
SIMILAR_TO edges (core/graph_db.py:343-425). Per the north star we
extend this into true canonicalization: connected components over the
union of exact-key edges, alias-dictionary edges, and (optionally)
high-similarity edges — computed as a hand-rolled, DataFrame-only
label-propagation loop (no GraphFrames dependency, no RDDs).

Algorithm: every node starts labeled with itself; each iteration
propagates the min label across edges in both directions and
re-aggregates per node; stop when no label changes. For alias-star
graphs the diameter is ~2, so convergence is fast; the loop
``localCheckpoint()``s each iteration to cut the growing lineage
(SURVEY.md §4 item 1). The min-aggregation runs as an explicit salted
two-phase reduce so a hub component's messages don't all land on one
reducer (SURVEY.md §4 item 2); AQE skew handling stays on as backstop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

CC_SALT_BUCKETS = 16
MAX_ITERATIONS = 25

# Below this many edges the salted two-phase reduce is pure overhead
# (an extra shuffle per iteration on a graph that fits in a handful of
# partitions); above it, hub components would otherwise funnel all
# their messages through single reducers.
SALT_MIN_EDGES = 1_000_000


def _two_phase_min(df: DataFrame, key: str, value: str, salt_buckets: int) -> DataFrame:
    """groupBy(key).min(value), salted (two-phase) when salt_buckets>1."""
    if salt_buckets <= 1:
        return df.groupBy(key).agg(F.min(value).alias(value))
    return (
        df.withColumn("salt", F.pmod(F.xxhash64(key, value), F.lit(salt_buckets)).cast("int"))
        .groupBy(key, "salt")
        .agg(F.min(value).alias(value))
        .groupBy(key)
        .agg(F.min(value).alias(value))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    salt_buckets: int = CC_SALT_BUCKETS,
    max_iterations: int = MAX_ITERATIONS,
    cc_partitions: int | None = None,
) -> DataFrame:
    """edges(src, dst) -> (node, component) where component = min node id
    reachable. Deterministic for any input order.

    ``cc_partitions`` sizes the loop's shuffles to the *component
    graph* (distinct surfaces/aliases — vocabulary-bounded), not the
    corpus: the loop runs ~4 jobs per iteration, and running each over
    the session's corpus-sized partition count wastes seconds per job
    on empty-task scheduling. Auto-sized from the deduplicated edge
    count when not given."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    bidir = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    bidir = bidir.localCheckpoint(eager=True)
    n_edges = bidir.count()
    if cc_partitions is None:
        cc_partitions = max(2, min(256, n_edges // 100_000 + 2))
    if n_edges < SALT_MIN_EDGES and salt_buckets == CC_SALT_BUCKETS:
        # vocabulary-sized graph: skip the extra phase (an explicit
        # salt_buckets argument is honored — tests force the salted path)
        salt_buckets = 1

    spark = edges.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(cc_partitions))
    try:
        bidir = bidir.repartition(cc_partitions, "src").localCheckpoint(eager=True)

        labels = (
            bidir.select(F.col("src").alias("node"))
            .union(bidir.select(F.col("dst").alias("node")))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint(eager=True)
        )

        for _ in range(max_iterations):
            # neighbor labels flowing along edges + own label
            msgs = (
                bidir.join(labels, bidir.src == labels.node)
                .select(F.col("dst").alias("node"), F.col("component"))
                .union(labels.select("node", "component"))
            )
            new_labels = _two_phase_min(msgs, "node", "component", salt_buckets)
            # pointer doubling: jump to the label's own label (<= label,
            # since labels are monotone non-increasing) -> O(log diameter)
            # iterations instead of O(diameter)
            lbl2 = new_labels.select(
                F.col("node").alias("cnode"), F.col("component").alias("ccomp")
            )
            new_labels = (
                new_labels.join(lbl2, new_labels.component == lbl2.cnode, "left")
                .select("node", F.coalesce("ccomp", "component").alias("component"))
            )
            new_labels = new_labels.localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return labels.select("node", "component")
