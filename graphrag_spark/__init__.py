"""graphrag_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
FlorentB974/graphrag reference (see /root/repo/SURVEY.md).

Pipeline: interleaved-document spans table -> chunk (Arrow UDF) ->
deterministic mention/triple extraction (Arrow UDF) -> normalization
(native exprs) -> dedup + alias linking (salted groupBy + broadcast join)
-> canonicalization (connected components via iterative label
propagation) -> materialized node/edge/triple/mention tables with
per-stage lineage for resume.

Everything here is derived from public knowledge only: the PySpark API
and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
