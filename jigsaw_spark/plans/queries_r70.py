"""Round-13 queue: the image-threshold sweep and cluster-level split
leakage (module queries_r70 sits BEHIND the 50-slot certification
window by the documented overflow policy — `_OVERFLOW_BOUNDARY` in
plans/queries; these two queries are the next round's queue, the
r40/r55/r60/r65 pattern: replica-verified now, driver row next round).

- ``mm_phash_threshold_sweep``: prices the image near-dup Hamming
  threshold the way ``dedup_band_sweep`` prices the LSH banding —
  for thresholds {0, 2, 4, 6}: pairs admitted, images covered, and
  the covered share. All thresholds <= 7 are EXACT under the 8-band
  pigeonhole (a pair within Hamming 7 leaves at least one hash byte
  untouched, so the byte-equality candidate join misses nothing);
  the hamming distances are computed ONCE and the sweep is a
  cumulative rollup over the bounded threshold dim (unmatched
  thresholds count 0 via count(col), not count(*)).
- ``dq_split_cluster_leakage``: the audit twin of
  ``p_leakage_safe_split`` pointed at the 'contam|' md5 split every
  contamination query shares — a doc's duplicate CLUSTER (exact
  fingerprint group folded into its keeper's near-dup component) that
  contains both train and holdout members leaks content across the
  boundary even when no 8-gram matches fire. Counts clusters
  straddling the split, the docs inside them on each side, and the
  holdout share sitting in straddling clusters.

Scale notes (100 TB): the threshold sweep reuses the banded dHash
candidate join (never all-pairs) with one hamming agg and a 4-row
threshold dim; cluster leakage maps every doc to its keeper's
component (two hash joins against the shared keeper machinery), then
two cluster-keyed hash-aggs — no windows over facts, no pair
enumeration beyond the banded lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

_PHASH_THRESHOLDS = (0, 2, 4, 6)

# ---------------------------------------------------------------------------
# mm_phash_threshold_sweep
# ---------------------------------------------------------------------------


def _phash_sweep_sql() -> str:
    from jigsaw_spark.plans.queries_r6 import _PHASH_BYTES_CTE

    thr = ", ".join(str(t) for t in _PHASH_THRESHOLDS)
    return f"""
    WITH {_PHASH_BYTES_CTE.strip()},
    mcand AS (
      SELECT DISTINCT x.i AS ia, y.i AS ib
      FROM ph_bytes x
      JOIN ph_bytes y ON x.byte_idx = y.byte_idx
                     AND x.byte_val = y.byte_val AND x.i < y.i),
    ham AS MATERIALIZED (
      SELECT c.ia, c.ib,
             CAST(sum(bit_count(xor(x.byte_val, y.byte_val)))
               AS BIGINT) AS hamming
      FROM mcand c
      JOIN ph_bytes x ON x.i = c.ia
      JOIN ph_bytes y ON y.i = c.ib AND y.byte_idx = x.byte_idx
      GROUP BY 1, 2),
    universe AS (SELECT CAST(count(DISTINCT i) AS BIGINT) AS n_images
                 FROM ph_bytes),
    thr AS (SELECT unnest([{thr}]) AS threshold),
    per AS (
      SELECT t.threshold,
             CAST(count(h.ia) AS BIGINT) AS n_pairs
      FROM thr t LEFT JOIN ham h ON h.hamming <= t.threshold
      GROUP BY 1),
    cov AS (
      SELECT t.threshold,
             CAST(count(DISTINCT d.i) AS BIGINT) AS n_covered
      FROM thr t
      LEFT JOIN (SELECT ia AS i, hamming FROM ham
                 UNION ALL SELECT ib AS i, hamming FROM ham) d
        ON d.hamming <= t.threshold
      GROUP BY 1)
    SELECT CAST(p.threshold AS INT) AS threshold,
           p.n_pairs,
           c.n_covered,
           CAST(c.n_covered * 1000 // u.n_images AS BIGINT)
             AS covered_milli
    FROM per p
    JOIN cov c ON p.threshold = c.threshold
    CROSS JOIN universe u
"""


@register(
    "mm_phash_threshold_sweep",
    _phash_sweep_sql(),
    "image near-dup threshold sweep — the dedup_band_sweep of the "
    "image arm: for dHash Hamming thresholds {0, 2, 4, 6}, the pairs "
    "admitted, distinct images covered, and the covered share of the "
    "image universe. Every threshold <= 7 is EXACT under the 8-band "
    "pigeonhole (a pair within Hamming 7 leaves one full hash byte "
    "equal, so the byte-equality candidate join misses nothing), so "
    "the sweep prices the threshold choice before committing the "
    "image dedup tier. Shape: the banded candidate join computed "
    "ONCE, one hamming hash-agg, a 4-row threshold dim rollup — "
    "never all-pairs; thresholds admitting zero pairs count 0 "
    "(count over the joined key, not count(*))",
)
def mm_phash_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.plans.queries_r6 import _phash_ham_pairs

    # bucket form via the shared _phash_ham_pairs prelude (the
    # mm_phash_near_dup r13 shape): the old self-join formulation
    # evaluated the synth+decode kernel once per join side and twice
    # more re-attaching bytes for the Hamming agg — 4 kernel passes.
    # The prelude runs it ONCE; same (ia, ib, hamming) set.
    ham = _phash_ham_pairs(spark, sf_dir).localCheckpoint()
    # the id universe IS the synth filter (one image per doc_id % 10 ==
    # 0 row; phash_dhash never drops a row) — no kernel pass to count it
    universe = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_images"))
    )
    thr = F.broadcast(
        spark.createDataFrame(
            [(t,) for t in _PHASH_THRESHOLDS], "threshold int"
        )
    )
    per = (
        thr.join(ham, ham["hamming"] <= F.col("threshold"), "left")
        .groupBy("threshold")
        .agg(F.count(ham["ia"]).cast("bigint").alias("n_pairs"))
    )
    dsides = ham.select(
        F.col("ia").alias("i"), "hamming"
    ).unionByName(ham.select(F.col("ib").alias("i"), "hamming"))
    cov = (
        thr.join(dsides, dsides["hamming"] <= F.col("threshold"), "left")
        .groupBy("threshold")
        .agg(F.countDistinct("i").cast("bigint").alias("n_covered"))
    )
    return (
        per.join(cov, "threshold")
        .crossJoin(F.broadcast(universe))
        .select(
            F.col("threshold").cast("int").alias("threshold"),
            "n_pairs",
            "n_covered",
            F.expr(
                "CAST(n_covered * 1000 div n_images AS BIGINT)"
            ).alias("covered_milli"),
        )
    )


# ---------------------------------------------------------------------------
# dq_split_cluster_leakage
# ---------------------------------------------------------------------------


def _cluster_leakage_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH RECURSIVE {_KEEPER_EDGES_CTE},
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS (
      SELECT u AS doc_id, least(u, min(v)) AS component
      FROM reach GROUP BY u),
    -- every doc -> its exact keeper (fp min) -> the keeper's component
    keeper_of AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keeper
      FROM fpt),
    lab AS MATERIALIZED (
      SELECT k.doc_id,
             coalesce(c.component, k.keeper) AS cluster,
             CAST(CAST(('0x' || substr(md5('contam|'
               || CAST(k.doc_id AS VARCHAR)), 1, 12)) AS UBIGINT)
               % CAST(20 AS UBIGINT) AS BIGINT) = 0 AS is_holdout
      FROM keeper_of k LEFT JOIN comp c ON k.keeper = c.doc_id),
    cl AS MATERIALIZED (
      SELECT cluster,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN is_holdout THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hold,
             CAST(sum(CASE WHEN is_holdout THEN 0 ELSE 1 END)
               AS BIGINT) AS n_train
      FROM lab GROUP BY 1),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(n_hold) AS BIGINT) AS n_holdout_docs
      FROM cl)
    SELECT t.n_clusters,
           CAST(sum(CASE WHEN c.n_hold > 0 AND c.n_train > 0
             THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
           CAST(sum(CASE WHEN c.n_hold > 0 AND c.n_train > 0
             THEN c.n_docs ELSE 0 END) AS BIGINT) AS n_docs_straddling,
           CAST(sum(CASE WHEN c.n_hold > 0 AND c.n_train > 0
             THEN c.n_hold ELSE 0 END) AS BIGINT)
             AS n_holdout_in_straddling,
           t.n_holdout_docs,
           CAST(CASE WHEN t.n_holdout_docs = 0 THEN 0
             ELSE sum(CASE WHEN c.n_hold > 0 AND c.n_train > 0
               THEN c.n_hold ELSE 0 END) * 1000 // t.n_holdout_docs
             END AS BIGINT) AS leak_milli
    FROM cl c CROSS JOIN tot t
    GROUP BY t.n_clusters, t.n_holdout_docs
"""


@register(
    "dq_split_cluster_leakage",
    _cluster_leakage_sql(),
    "cluster-level leakage audit of the 'contam|' md5 split every "
    "contamination query shares: a doc's duplicate CLUSTER (exact "
    "fingerprint group folded into its keeper's SimHash near-dup "
    "component) that holds both train and holdout members leaks "
    "content across the boundary even when no 8-gram fires — the "
    "failure p_leakage_safe_split exists to PREVENT, audited here on "
    "the split the contamination family actually uses. Reports "
    "straddling clusters, docs inside them per side, and the holdout "
    "share sitting in straddling clusters. Shape: every doc mapped "
    "to its keeper's component via the fp window + ONE hash join "
    "against the shared keeper components, two cluster-keyed "
    "hash-aggs, a 1-row totals cross",
)
def dq_split_cluster_leakage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_frames,
    )

    docs = _t(spark, sf_dir, "documents")
    # one exact-dedup pass shared by the keeper fold and the pair graph
    ded, kpairs = keeper_frames(docs, "doc_id")
    keeper_of = ded.select("doc_id", "keeper")
    comp = connected_components(
        kpairs.localCheckpoint()
    ).select(
        F.col("doc_id").alias("keeper"),
        F.col("component").alias("c0"),
    )
    lab = (
        keeper_of.join(comp, "keeper", "left")
        .select(
            "doc_id",
            F.coalesce("c0", F.col("keeper")).alias("cluster"),
            (
                F.pmod(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    F.lit("contam"),
                                    F.col("doc_id"),
                                )
                            ),
                            1,
                            12,
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                    F.lit(20),
                )
                == 0
            ).alias("is_holdout"),
        )
    )
    cl = lab.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_holdout"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_hold"),
        F.sum(F.when(F.col("is_holdout"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_train"),
    )
    tot = cl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("n_hold").cast("bigint").alias("n_holdout_docs"),
    )
    straddle = F.when(
        (F.col("n_hold") > 0) & (F.col("n_train") > 0), True
    ).otherwise(False)
    return (
        cl.withColumn("s", straddle)
        .crossJoin(F.broadcast(tot))
        .groupBy("n_clusters", "n_holdout_docs")
        .agg(
            F.sum(F.when(F.col("s"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_straddling"),
            F.sum(F.when(F.col("s"), F.col("n_docs")).otherwise(0))
            .cast("bigint")
            .alias("n_docs_straddling"),
            F.sum(F.when(F.col("s"), F.col("n_hold")).otherwise(0))
            .cast("bigint")
            .alias("n_holdout_in_straddling"),
        )
        .select(
            "n_clusters",
            "n_straddling",
            "n_docs_straddling",
            "n_holdout_in_straddling",
            "n_holdout_docs",
            F.expr(
                "CAST(CASE WHEN n_holdout_docs = 0 THEN 0"
                " ELSE n_holdout_in_straddling * 1000"
                " div n_holdout_docs END AS BIGINT)"
            ).alias("leak_milli"),
        )
    )
