import sys, io, contextlib; sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from graphrag_spark.session import get_spark
from graphrag_spark.corpus import spans_from_flat
from graphrag_spark.pipeline import run_in_memory
import __spark_entry__ as em

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"

def plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

sections = []
docs = spans_from_flat(spark.read.parquet(f"{sf}/documents.parquet").filter(F.col("doc_id") < 50))
out = run_in_memory(spark, docs)
sections.append(("KG triples build (extraction -> normalize -> link -> canonicalize -> pair-group)",
  "Key properties: BroadcastHashJoin for surface map / canonical map / alias dictionary; "
  "ObjectHashAggregate with partial_* (map-side combine) for the pair grouping; "
  "the quadratic pair expansion feeds straight into a partial aggregate in the same stage.",
  plan(out["triples"])))
sections.append(("Pricing summary (A1/A8 analog)",
  "Whole-stage codegen spans the scan->partial agg; only grouped columns + aggregates read (ReadSchema pruned).",
  plan(em.queries()["pricing_summary"](spark, sf))))
sections.append(("Broadcast dimension join (J3 analog)",
  "Both nation and region broadcast; no shuffle of the customer side.",
  plan(em.queries()["region_rollup"](spark, sf))))
sections.append(("Pushdown check: filter + projection reach the scan",
  "PushedFilters + pruned ReadSchema on the parquet scan.",
  plan(spark.read.parquet(f"{sf}/orders.parquet").filter("o_totalprice > 400000").select("o_custkey","o_totalprice"))))
sections.append(("Cosine top-k (T1) — native zip_with/aggregate scoring",
  "Scoring is a codegen'd projection over the scan; TakeOrderedAndProject caps the sort at k.",
  plan(em.queries()["cosine_topk"](spark, sf))))
sections.append(("Exact global kNN (knn_edges) — block-pair decomposition",
  "No single-task O(n^2) stage: rows replicate to nb block-pair groups "
  "(applyInPandas per pair), then a per-src window merges local top-k. "
  "Per-task memory O((n/nb)^2); shuffle O(n*nb).",
  plan(em.queries()["knn_edges"](spark, sf))))
sections.append(("G6 strength-decay expansion (kg_decay_expansion)",
  "Adjacency-served (the serving default, max_depth=2): ONE lazy plan "
  "— each hop is a BroadcastHashJoin of the bounded adjacency index "
  "against a <=cap-row frontier subtree, frontier caps are windows "
  "over <=cap x cap rows, the visited set is an anti-join, the "
  "early-stop rule a broadcast scalar gate; no per-hop driver collect "
  "(the whole expansion executes inside the consuming action). "
  "Without an index (or at other depths) the driver loop runs one "
  "bounded no-shuffle job per depth against the edge frame.",
  plan(em.queries()["kg_decay_expansion"](spark, sf))))
sections.append(("J6 hybrid merge (kg_hybrid_merge)",
  "Full-outer SortMergeJoin keyed by chunk_id over two small scored "
  "sides; boost formula is a codegen'd projection.",
  plan(em.queries()["kg_hybrid_merge"](spark, sf))))
sections.append(("MinHash near-dups — banded candidates, no all-pairs",
  "Candidates form via a (band,bucket) self-join on exploded "
  "signatures (shuffle O(n*bands)); est-jaccard verification is a "
  "native zip_with over candidate rows only.",
  plan(em.queries()["minhash_near_dups"](spark, sf))))

# persisted fulltext index: build once, per-query scan touches only the
# queried terms' tbucket partitions (PartitionFilters on the scan)
import tempfile
from graphrag_spark.graph_query import (
    build_fulltext_postings, write_fulltext_index, fulltext_search_index_path,
)
_chunks = out["chunks"]
_ft_path = tempfile.mkdtemp() + "/ft_index"
write_fulltext_index(build_fulltext_postings(_chunks), _ft_path)
sections.append(("T7 persisted fulltext index — partition-pruned query",
  "The scan's PartitionFilters carry tbucket IN (<query terms' buckets>): "
  "only the queried terms' posting-list partitions are listed/read "
  "(per-query cost O(postings/n_buckets * |terms|), not O(corpus)); "
  "scoring is a broadcast-terms join + partial-agg rollup.",
  plan(fulltext_search_index_path(spark, _ft_path, "partnership rollout"))))

# round-5 serving ops: persisted IVF ANN (partition-pruned probe) and
# set-oriented batch retrieval (one corpus read for a whole query table)
from graphrag_spark.similarity import ivf_build_index, ivf_query_index, IvfIndex
from graphrag_spark.embeddings import embed_texts_np

_ivf_path = tempfile.mkdtemp() + "/ivf_index"
_C = ivf_build_index(_chunks, _ivf_path, n_centroids=8, id_col="chunk_id")
_qvec = [float(x) for x in embed_texts_np(["quarterly partnership rollout"])[0]]
sections.append(("T1 served from a persisted IVF index — partition-pruned ANN probe",
  "The scan's PartitionFilters carry cluster IN (<probed cells>): only "
  "n_probe of n_centroids cell partitions are listed/read (per-query "
  "scan cost O(n * n_probe / n_centroids), not O(n)); scoring within "
  "the probed cells is the same codegen'd cosine projection + "
  "TakeOrderedAndProject as the brute-force route, so results are "
  "bit-identical at full probe.",
  plan(ivf_query_index(spark, _ivf_path, _qvec, _C, k=5, n_probe=2, id_col="chunk_id"))))

from graphrag_spark.graph_query import batch_retrieve_chunks
_qdf = spark.createDataFrame(
    [("q0", "quarterly partnership"), ("q1", "compare rollout versus baseline")],
    "query_id string, query string")
sections.append(("Batch multi-query retrieval (batch_retrieve_chunks) — one corpus read for the whole query table",
  "The query table (analysis + embedding + per-query k, all native "
  "columns / one Arrow pass) broadcasts into ONE cross join: each "
  "chunk partition scores every query in place, so the corpus is read "
  "once for the batch instead of once per query; per-query top-k is a "
  "single window over (query_id, -score, chunk_id). With chunk_index= "
  "the cross join is replaced by probe-pruned scoring (each query "
  "scores only its n_probe cells; identical at full probe).",
  plan(batch_retrieve_chunks(_chunks, _qdf, top_k=3))))
sections.append(("Batch retrieval through the IVF index — probe-pruned scoring",
  "The (query_id, cluster) probe pairs (driver-computed against the "
  "tiny centroid matrix) broadcast-join the cell frame: each query "
  "scores ONLY its probed cells' vectors, and a cell probed by many "
  "queries is still read once for all of them. Over the persisted "
  "layout Catalyst turns the probe join into DYNAMIC partition "
  "pruning — the scan below carries "
  "dynamicpruningexpression(cluster IN ...), so unprobed cluster= "
  "partitions are dropped from the file listing at runtime.",
  plan(batch_retrieve_chunks(
      _chunks, _qdf, top_k=3,
      chunk_index=IvfIndex(_C, spark.read.parquet(_ivf_path), id_col="chunk_id"),
      n_probe=2))))

with open("/root/repo/PLANS.md", "w") as f:
    f.write("# Physical plans of headline operators\n\n")
    f.write("Generated by tools (explain('formatted') at sf0.01). What to look for\nis noted per section; regenerate with `python tools/gen_plans.py`.\n\n")
    for title, note, p in sections:
        f.write(f"## {title}\n\n{note}\n\n```\n{p}\n```\n\n")
print("written")
