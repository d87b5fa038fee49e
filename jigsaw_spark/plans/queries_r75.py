"""Round-14 queue: the cluster-safe split repair and pooled text
detectors (module queries_r75 sits BEHIND the 50-slot certification
window by the documented overflow policy — `_OVERFLOW_BOUNDARY` in
plans/queries; these two queries are the next round's queue, the
r40/r55/r60/r65/r70 pattern: replica-verified now, driver row next
round).

- ``dq_cluster_safe_repair``: the CLUSTER-level executed repair —
  dq_split_repair demotes 8-gram-contaminated docs; this demotes
  every holdout member of a STRADDLING duplicate cluster (the
  leakage dq_split_cluster_leakage certifies and the gram detector
  cannot see), then re-balances by promoting md5-first train docs
  from SINGLETON clusters per source (a clustered promote could
  create a new straddle; a singleton cannot). Straddle-after is 0
  by construction and emitted as the verification column; the
  per-source ledger prices what the cluster-safe guarantee costs.
- ``dedup_pooled_text_detectors``: the cluster-level sequel to
  dedup_detector_agreement — that query measured LOW pair-set
  agreement between MinHash-LSH and SimHash; this runs connected
  components over each detector's pair set AND their union: a
  pooled component count below the sum means the detectors connect
  DIFFERENT doc groups and pooling fuses clusters neither finds
  alone (the text twin of dedup_pooled_components' recall
  argument).

Scale notes (100 TB): both queries reuse certified banded pair
machinery (keeper/cluster fold, LSH bands, SimHash banding) — no
new pair surface; the repair's promotion is the (source, md5-band)
rank; components run through the size-adaptive operator per arm.

Reference parity: north-star extension surface (no reference
counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register
from jigsaw_spark.plans.queries_r71 import _HOLDOUT_SQL, _holdout_col

# ---------------------------------------------------------------------------
# dq_cluster_safe_repair
# ---------------------------------------------------------------------------


def _cluster_repair_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    hold = _HOLDOUT_SQL.format(d="k.doc_id")
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
    keeper_of AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS keeper
      FROM fpt),
    lab AS MATERIALIZED (
      SELECT k.doc_id, d.source,
             coalesce(c.component, k.keeper) AS cluster,
             {hold} AS is_holdout
      FROM keeper_of k
      LEFT JOIN comp c ON k.keeper = c.doc_id
      JOIN documents d ON k.doc_id = d.doc_id),
    csides AS MATERIALIZED (
      SELECT cluster,
             CAST(count(*) AS BIGINT) AS sz,
             CAST(sum(CASE WHEN is_holdout THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hold,
             CAST(sum(CASE WHEN is_holdout THEN 0 ELSE 1 END)
               AS BIGINT) AS n_train
      FROM lab GROUP BY 1),
    -- demote: every holdout member of a straddling cluster
    demote AS MATERIALIZED (
      SELECT l.doc_id, l.source
      FROM lab l JOIN csides c ON l.cluster = c.cluster
      WHERE l.is_holdout AND c.n_hold > 0 AND c.n_train > 0),
    -- promote pool: train docs in SINGLETON clusters only
    pool AS (
      SELECT l.doc_id, l.source
      FROM lab l JOIN csides c ON l.cluster = c.cluster
      WHERE NOT l.is_holdout AND c.sz = 1),
    quota AS (
      SELECT l.source,
             CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0
               END) AS BIGINT) AS n_demote,
             CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0
               END) AS BIGINT) AS n_pool
      FROM lab l
      LEFT JOIN demote d ON l.doc_id = d.doc_id
      LEFT JOIN pool p ON l.doc_id = p.doc_id
      GROUP BY 1),
    prom AS MATERIALIZED (
      SELECT r.doc_id, r.source FROM (
        SELECT p.doc_id, p.source,
               row_number() OVER (PARTITION BY p.source
                 ORDER BY md5('crepair|' || CAST(p.doc_id AS VARCHAR)),
                          p.doc_id) AS rk
        FROM pool p) r
      JOIN quota q ON r.source = q.source
      WHERE r.rk <= least(q.n_demote, q.n_pool)),
    nsplit AS MATERIALIZED (
      SELECT l.doc_id, l.source, l.cluster,
             CASE WHEN d.doc_id IS NOT NULL THEN FALSE
                  WHEN p.doc_id IS NOT NULL THEN TRUE
                  ELSE l.is_holdout END AS is_holdout
      FROM lab l
      LEFT JOIN demote d ON l.doc_id = d.doc_id
      LEFT JOIN prom p ON l.doc_id = p.doc_id),
    nstrad AS (
      SELECT CAST(count(*) AS BIGINT) AS n_straddling_after
      FROM (SELECT cluster FROM nsplit GROUP BY cluster
            HAVING sum(CASE WHEN is_holdout THEN 1 ELSE 0 END) > 0
               AND sum(CASE WHEN is_holdout THEN 0 ELSE 1 END) > 0) t)
    SELECT l.source,
           CAST(sum(CASE WHEN l.is_holdout THEN 1 ELSE 0 END)
             AS BIGINT) AS n_holdout_before,
           CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_demoted,
           CAST(sum(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_promoted,
           CAST(sum(CASE WHEN n.is_holdout THEN 1 ELSE 0 END)
             AS BIGINT) AS n_holdout_after,
           CAST(max(s.n_straddling_after) AS BIGINT)
             AS global_straddle_after
    FROM lab l
    JOIN nsplit n ON l.doc_id = n.doc_id
    LEFT JOIN demote d ON l.doc_id = d.doc_id
    LEFT JOIN prom p ON l.doc_id = p.doc_id
    CROSS JOIN nstrad s
    GROUP BY l.source
"""


@register(
    "dq_cluster_safe_repair",
    _cluster_repair_sql(),
    "the CLUSTER-level executed split repair — demote every holdout "
    "member of a straddling duplicate cluster (the leakage "
    "dq_split_cluster_leakage certifies and no 8-gram detector can "
    "see), promote md5-first train docs from SINGLETON clusters per "
    "source to re-balance (a clustered promote could mint a new "
    "straddle; a singleton cannot — so straddle-after is 0 BY "
    "CONSTRUCTION and emitted as the verification column). The "
    "per-source ledger prices the cluster-safe guarantee: holdout "
    "docs sacrificed vs recovered. Complements dq_split_repair "
    "(gram-level) the way cluster leakage complements contamination. "
    "Shape: the certified keeper/cluster machinery, two cluster-side "
    "hash-aggs, the (source, md5-band) promotion rank — no raw-fact "
    "global window, no new pair surface",
)
def dq_cluster_safe_repair(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.functions.hashing import md5_key
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
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            F.coalesce("c0", F.col("keeper")).alias("cluster"),
            _holdout_col().alias("is_holdout"),
        )
        .localCheckpoint()
    )
    csides = lab.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.sum(F.when(F.col("is_holdout"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_hold"),
        F.sum(F.when(F.col("is_holdout"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_train"),
    )
    labc = lab.join(csides, "cluster")
    demote = (
        labc.filter(
            F.col("is_holdout")
            & (F.col("n_hold") > 0)
            & (F.col("n_train") > 0)
        )
        .select("doc_id", "source")
        .withColumn("d", F.lit(1))
        .localCheckpoint()
    )
    pool = (
        labc.filter(~F.col("is_holdout") & (F.col("sz") == 1))
        .select("doc_id", "source")
        .localCheckpoint()
    )
    quota = (
        lab.select("doc_id", "source")
        .join(demote.select("doc_id", "d"), "doc_id", "left")
        .join(
            pool.withColumn("p", F.lit(1)).select("doc_id", "p"),
            "doc_id",
            "left",
        )
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("d").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_demote"),
            F.sum(F.when(F.col("p").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pool"),
        )
    )
    # banded promotion rank (the queries_r20 proof: ranks bit-identical
    # to the oracle's plain per-source row_number)
    keyed = pool.withColumn(
        "_h", md5_key(F.col("doc_id"), seed="crepair")
    ).withColumn("_band", F.substring("_h", 1, 2))
    bcounts = keyed.groupBy("source", "_band").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wb = (
        Window.partitionBy("source")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bcounts.withColumn(
        "_off", F.coalesce(F.sum("_c").over(wb), F.lit(0))
    ).select("source", "_band", "_off")
    win = Window.partitionBy("source", "_band").orderBy("_h", "doc_id")
    prom = (
        keyed.withColumn("_rk", F.row_number().over(win))
        .join(F.broadcast(offsets), ["source", "_band"])
        .join(F.broadcast(quota), "source")
        .filter(
            (F.col("_rk") + F.col("_off"))
            <= F.least(F.col("n_demote"), F.col("n_pool"))
        )
        .select("doc_id")
        .withColumn("p", F.lit(1))
        .localCheckpoint()
    )
    nsplit = (
        lab.join(demote.select("doc_id", "d"), "doc_id", "left")
        .join(prom, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "cluster",
            F.when(F.col("d").isNotNull(), F.lit(False))
            .when(F.col("p").isNotNull(), F.lit(True))
            .otherwise(F.col("is_holdout"))
            .alias("nh"),
        )
    )
    nstrad = (
        nsplit.groupBy("cluster")
        .agg(
            F.sum(F.when(F.col("nh"), 1).otherwise(0)).alias("h"),
            F.sum(F.when(F.col("nh"), 0).otherwise(1)).alias("t"),
        )
        .filter((F.col("h") > 0) & (F.col("t") > 0))
        .agg(
            F.count(F.lit(1))
            .cast("bigint")
            .alias("n_straddling_after")
        )
    )
    j = (
        lab.join(demote.select("doc_id", "d"), "doc_id", "left")
        .join(prom, "doc_id", "left")
        .join(nsplit.select("doc_id", "nh"), "doc_id")
    )
    return (
        j.groupBy("source")
        .agg(
            F.sum(F.when(F.col("is_holdout"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_holdout_before"),
            F.sum(F.when(F.col("d").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_demoted"),
            F.sum(F.when(F.col("p").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_promoted"),
            F.sum(F.when(F.col("nh"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_holdout_after"),
        )
        .crossJoin(F.broadcast(nstrad))
        .select(
            "source",
            "n_holdout_before",
            "n_demoted",
            "n_promoted",
            "n_holdout_after",
            F.col("n_straddling_after")
            .cast("bigint")
            .alias("global_straddle_after"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_pooled_text_detectors
# ---------------------------------------------------------------------------


def _pooled_detectors_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    arms = []
    for arm, etab in (
        ("minhash", "medges"),
        ("simhash", "sedges"),
        ("pooled", "uedges"),
    ):
        arms.append(f"""
    reach_{arm}(u, v) AS (
      SELECT u, v FROM {etab}
      UNION
      SELECT r.u, e.v FROM reach_{arm} r
      JOIN {etab} e ON r.v = e.u WHERE e.v <> r.u),
    comp_{arm} AS (
      SELECT u, least(u, min(v)) AS component
      FROM reach_{arm} GROUP BY u),
    acc_{arm} AS (
      SELECT '{arm}' AS arm,
             CAST(sum(c) AS BIGINT) AS n_nodes,
             CAST(count(*) AS BIGINT) AS n_components,
             CAST(max(c) AS BIGINT) AS max_size
      FROM (SELECT component, CAST(count(*) AS BIGINT) AS c
            FROM comp_{arm} GROUP BY 1) t)""")
    return f"""
    WITH RECURSIVE {_KEEPER_EDGES_CTE},
    ksh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
               AS shingle
      FROM ktoks WHERE len(t) >= 3),
    mh AS (
      SELECT doc_id, seed,
             min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS mh
      FROM ksh CROSS JOIN (SELECT unnest(range(16)) AS seed) seeds
      GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // 4 AS band,
             string_agg(mh, ',' ORDER BY seed) AS sig
      FROM mh GROUP BY doc_id, band),
    mhp AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.sig = b.sig
                  AND a.doc_id < b.doc_id),
    medges AS (
      SELECT doc_a AS u, doc_b AS v FROM mhp
      UNION SELECT doc_b, doc_a FROM mhp),
    sedges AS (SELECT u, v FROM edges),
    uedges AS MATERIALIZED (
      SELECT u, v FROM medges UNION SELECT u, v FROM sedges),
    {','.join(arms)}
    SELECT arm, n_nodes, n_components, max_size
    FROM (SELECT * FROM acc_minhash
          UNION ALL SELECT * FROM acc_simhash
          UNION ALL SELECT * FROM acc_pooled)
"""


@register(
    "dedup_pooled_text_detectors",
    _pooled_detectors_sql(),
    "the cluster-level sequel to dedup_detector_agreement: that "
    "query measured LOW pair-set Jaccard between MinHash-LSH and "
    "SimHash; this runs connected components over each detector's "
    "pair set and their UNION — same accounting (nodes, components, "
    "giant size) per arm, both detectors C4-ORDERED over exact-dedup "
    "keepers (byte-identical copies collapse BEFORE pairing — the "
    "r5 x10-probe lesson; the raw-doc variant probes 15x because "
    "replication densifies the banded graphs into cliques). A "
    "pooled component count below minhash+simhash means the "
    "detectors connect DIFFERENT doc groups and pooling fuses "
    "clusters neither finds alone — the text twin of "
    "dedup_pooled_components' multi-modal recall argument, here for "
    "multi-DETECTOR dedup. Shape: two certified banded pair lists "
    "over keepers, the size-adaptive components operator per arm, "
    "three bounded rollups (the oracle's all-pairs simhash join is "
    "the oracle's affordance, the engine side stays banded)",
)
def dedup_pooled_text_detectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_frames,
        minhash_lsh_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    # ONE exact-dedup pass shared by both detector arms (keeper_pairs
    # would re-run the fp window for its own keepers — Spark cannot
    # dedupe the two identical window subtrees across the arms)
    ded, kpairs = keeper_frames(docs, "doc_id", with_text=True)
    keepers = ded.filter(~F.col("is_dup")).select("doc_id", "text")
    mhp = (
        minhash_lsh_pairs(keepers, "doc_id")
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    # kpairs IS keeper_pairs' C4-ordered SimHash banding over keepers
    shp = kpairs.localCheckpoint()
    upairs = mhp.unionByName(shp).distinct()

    def _arm(pairs: DataFrame, arm: str) -> DataFrame:
        comp = connected_components(pairs)
        return (
            comp.groupBy("component")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .agg(
                F.sum("c").cast("bigint").alias("n_nodes"),
                F.count(F.lit(1))
                .cast("bigint")
                .alias("n_components"),
                F.max("c").cast("bigint").alias("max_size"),
            )
            .select(F.lit(arm).alias("arm"), "*")
        )

    return (
        _arm(mhp, "minhash")
        .unionByName(_arm(shp, "simhash"))
        .unionByName(_arm(upairs, "pooled"))
    )
