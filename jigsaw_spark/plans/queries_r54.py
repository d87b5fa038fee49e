"""Round-9 batch 14: near-dup cluster language purity and retrieval
precision@k.

- ``dedup_cluster_purity``: language purity of near-dup clusters,
  rolled up by log2 cluster-size bucket — per bucket: clusters, docs,
  MIXED-language clusters, and the majority-language mass share. The
  curation reading: a near-dup cluster spanning languages is almost
  always boilerplate/template markup (navigation chrome, license
  blocks) rather than translated content, so low purity in the big
  buckets says the dedup keeper choice should prefer hub REMOVAL over
  representative selection. Completes the cluster-reporting family
  (graph_component_size_hist counts sizes; this says what is INSIDE).
- ``ml_precision_at_k``: precision@1/5/10 of the same-label retrieval
  panel — the set-quality companion of ml_mrr_exact over the
  IDENTICAL 200-query brute-force top-10 (MRR grades where the FIRST
  relevant lands; P@k grades how much of the retrieved set is
  relevant — a ranking can have high MRR and garbage P@10, and kNN
  labelers consume P@k, not MRR). EXACT: hits are integer counts;
  precision_micro = hits * 1e6 div (k * n_queries).

Scale notes (100 TB): purity reuses the duplication-proof keeper
mapping (C4-ordered, see near_dup_keepers) — one lang-keyed hash-agg
per cluster, one bounded (<= 64 buckets) rollup; P@k reuses the
fixed-panel candidate stage (cost linear in the corpus, the ml_mrr
discipline) and everything after the top-10 is (label x 3)-dim-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.eval_panel import PANEL_TOPK_CTE
from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# dedup_cluster_purity
# ---------------------------------------------------------------------------


def _cluster_purity_sql() -> str:
    from jigsaw_spark.plans.queries_r24 import _keeper_cluster_sql

    return (
        _keeper_cluster_sql()
        + """,
    cl AS (
      SELECT a.keeper, d.lang, CAST(count(*) AS BIGINT) AS c
      FROM assigned a JOIN documents d ON a.doc_id = d.doc_id
      GROUP BY 1, 2),
    per_cluster AS (
      SELECT keeper,
             CAST(sum(c) AS BIGINT) AS size,
             CAST(count(*) AS BIGINT) AS n_langs,
             CAST(max(c) AS BIGINT) AS majority
      FROM cl GROUP BY 1)
    SELECT CAST(length(bin(size)) - 1 AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(size) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mixed_clusters,
           CAST(sum(majority) AS BIGINT) AS majority_docs,
           CAST(sum(majority) * 1000 // sum(size) AS BIGINT)
             AS purity_milli
    FROM per_cluster GROUP BY 1
"""
    )


@register(
    "dedup_cluster_purity",
    _cluster_purity_sql(),
    "language purity of near-dup clusters rolled up by log2 "
    "cluster-size bucket: clusters, docs, MIXED-language clusters, and "
    "the majority-language mass share per bucket — the inside-view "
    "companion of graph_component_size_hist (sizes say how much mass "
    "clusters hold; purity says what it is: a near-dup cluster "
    "spanning languages is almost always boilerplate/template chrome, "
    "not translated content, so low purity in the big buckets means "
    "hub removal beats representative selection for those clusters). "
    "EXACT: integer counts; purity floor-divides per bucket; the "
    "bucket is length(bin(size))-1 (no libm). Shape: the "
    "duplication-proof keeper mapping (C4-ordered) feeds ONE "
    "(keeper, lang) hash-agg and a per-cluster rollup; the final "
    "report groups into <= 64 buckets",
)
def dedup_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import near_dup_keepers

    docs = _t(spark, sf_dir, "documents")
    assigned = near_dup_keepers(docs, "doc_id")
    cl = (
        assigned.join(
            docs.select("doc_id", "lang"), "doc_id"
        )
        .groupBy("keeper", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    per_cluster = cl.groupBy("keeper").agg(
        F.sum("c").cast("bigint").alias("size"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
        F.max("c").cast("bigint").alias("majority"),
    )
    return (
        per_cluster.groupBy(
            (F.length(F.bin("size")) - 1).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("size").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_langs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_mixed_clusters"),
            F.sum("majority").cast("bigint").alias("majority_docs"),
            F.expr(
                "CAST(sum(majority) * 1000 div sum(size) AS BIGINT)"
            ).alias("purity_milli"),
        )
    )


# ---------------------------------------------------------------------------
# ml_precision_at_k
# ---------------------------------------------------------------------------

_P_AT_K_SQL = f"""
    WITH {PANEL_TOPK_CTE},
    ks AS (SELECT unnest([1, 5, 10]) AS k),
    hits AS (
      SELECT r.qlabel, k.k, r.query_id,
             CAST(sum(CASE WHEN r.clabel = r.qlabel THEN 1 ELSE 0 END)
               AS BIGINT) AS h
      FROM ranked r JOIN ks k ON r.rank <= k.k
      GROUP BY 1, 2, 3),
    agg AS (
      SELECT qlabel, k,
             CAST(count(*) AS BIGINT) AS n_queries,
             CAST(sum(h) AS BIGINT) AS n_hits
      FROM hits GROUP BY 1, 2)
    SELECT CAST(qlabel AS INT) AS label, CAST(k AS INT) AS k,
           n_queries, n_hits,
           CAST(n_hits * 1000000 // (k * n_queries) AS BIGINT)
             AS precision_micro
    FROM agg
"""


@register(
    "ml_precision_at_k",
    _P_AT_K_SQL,
    "precision@1/5/10 of same-label retrieval over the IDENTICAL "
    "200-query brute-force panel as ml_mrr_exact: per (label, k), the "
    "query count, total same-label hits in the top k, and "
    "precision_micro = hits div (k * queries) — the set-quality "
    "companion of MRR (MRR grades where the FIRST relevant lands; P@k "
    "grades how much of the retrieved SET is relevant — a ranking can "
    "have high MRR and garbage P@10, and kNN labelers consume P@k). "
    "EXACT: integer hit counts, one floor division at the end; "
    "ranking ties are round-9 + vec_id, the ANN family convention. "
    "Shape: the fixed-panel candidate stage (cost linear in the "
    "corpus — the ml_mrr discipline; the scale swap is ivf_topk), a "
    "3-row k dim joined on rank <= k, then a (label x 3)-dim rollup",
)
def ml_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.eval_panel import labeled_panel_topk

    ranked = labeled_panel_topk(spark, sf_dir, _t).select(
        "query_id",
        "qlabel",
        F.when(F.col("clabel") == F.col("qlabel"), 1)
        .otherwise(0)
        .alias("rel"),
        "rank",
    )
    ks = F.broadcast(
        spark.createDataFrame([(1,), (5,), (10,)], "k int")
    )
    hits = (
        ranked.join(ks, ranked["rank"] <= ks["k"])
        .groupBy("qlabel", "k", "query_id")
        .agg(F.sum("rel").cast("bigint").alias("h"))
    )
    agg = hits.groupBy("qlabel", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("h").cast("bigint").alias("n_hits"),
    )
    return agg.select(
        F.col("qlabel").cast("int").alias("label"),
        F.col("k").cast("int").alias("k"),
        "n_queries",
        "n_hits",
        F.expr(
            "CAST(n_hits * 1000000 div (k * n_queries) AS BIGINT)"
        ).alias("precision_micro"),
    )
