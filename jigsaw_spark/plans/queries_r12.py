"""Round-5 batch 6: exact-integer kNN classification, k-core graph
peeling, data profiling, the Mann-Whitney rank test, and a depth-2
decision tree —

- ``ml_knn_classify``: k-nearest-neighbor majority-vote classification
  over the embeddings table with INTEGER-QUANTIZED L2 distances
  (micro-unit components -> exact int64 squared distances), so the
  neighbor ranking and the vote are bit-deterministic on any cluster.
- ``graph_kcore``: bounded-round k-core peeling (k=2, 3 rounds) of the
  MinHash-LSH candidate graph — the degeneracy pruning that strips
  whiskers off dedup clusters before clustering proper.
- ``dq_column_profile``: the Deequ/TFDV-style per-column profile
  (rows, nulls, distincts, numeric min/max) of the events table in ONE
  scan + unpivot.
- ``ab_mann_whitney_u``: the Mann-Whitney U rank-sum test per event
  type (variant = user parity) with DOUBLED tie-averaged ranks so U
  stays an exact integer — the nonparametric companion to the Welch
  and chi-square tests already in the engine.
- ``ml_tree_depth2``: exact depth-2 decision tree (root split on one
  feature, per-child splits on a second) under the MISCLASSIFICATION
  impurity — an all-integer argmin, no float gini needed — extending
  the ml_best_split stump one level.

Float discipline: NO doubles in this module. Distances, ranks,
impurities, and profiles are exact integers end-to-end; argmins are
integer comparisons with deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register
from jigsaw_spark.plans.queries_r7 import _lsh_edges_cte

# ---------------------------------------------------------------------------
# ml_knn_classify
# ---------------------------------------------------------------------------

_KNN_K = 15
_KNN_NQ = 10

_KNN_SQL = f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x * 1000000) AS BIGINT)) AS v
      FROM embeddings),
    q AS (SELECT vec_id AS qid, label AS true_label, v AS qv
          FROM e WHERE vec_id < {_KNN_NQ}),
    c AS (SELECT vec_id AS cid, label, v AS cv
          FROM e WHERE vec_id >= {_KNN_NQ}),
    d AS (
      SELECT q.qid, q.true_label, c.cid, c.label,
             list_sum(list_transform(list_zip(q.qv, c.cv),
                      s -> (s[1] - s[2]) * (s[1] - s[2]))) AS l2
      FROM q CROSS JOIN c),
    topk AS (
      SELECT qid, true_label, label,
             row_number() OVER (PARTITION BY qid ORDER BY l2, cid) AS rn
      FROM d),
    votes AS (
      SELECT qid, true_label, label, count(*) AS n_votes
      FROM topk WHERE rn <= {_KNN_K} GROUP BY 1, 2, 3),
    best AS (
      SELECT qid, true_label, label, n_votes,
             row_number() OVER (PARTITION BY qid
                                ORDER BY n_votes DESC, label) AS vr
      FROM votes)
    SELECT CAST(qid AS BIGINT) AS query_id,
           CAST(true_label AS INT) AS true_label,
           CAST(label AS INT) AS pred_label,
           CAST(n_votes AS BIGINT) AS n_votes
    FROM best WHERE vr = 1
"""


@register(
    "ml_knn_classify",
    _KNN_SQL,
    "k-NN majority-vote classification (k=15) over the embeddings "
    "table: components quantize to micro-unit integers so squared L2 "
    "distances are EXACT int64 (dim 64 x (4e6)^2 ~ 1e15 < 2^63) — the "
    "neighbor ranking (l2, cid) and the vote (count desc, label) are "
    "total orders, bit-deterministic on any cluster, no float "
    "accumulation anywhere. Shape: the 10-row query set broadcasts "
    "against the candidate corpus (map-only distance kernel), per-"
    "query top-k is a qid-partitioned rank window; votes are a "
    "|Q|xk-row agg. The exact-integer twin of the float cosine ANN "
    "suite (ann_cosine_topk etc.)",
)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x ->"
            " CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("v"),
    )
    q = e.filter(F.col("vec_id") < _KNN_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
    )
    c = e.filter(F.col("vec_id") >= _KNN_NQ).select(
        F.col("vec_id").alias("cid"),
        "label",
        F.col("v").alias("cv"),
    )
    d = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "true_label",
        "cid",
        "label",
        F.expr(
            "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)),"
            " 0L, (acc, x) -> acc + x)"
        ).alias("l2"),
    )
    topk = d.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("qid").orderBy("l2", "cid")),
    ).filter(F.col("rn") <= _KNN_K)
    votes = topk.groupBy("qid", "true_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    best = votes.withColumn(
        "vr",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("n_votes"), "label")
        ),
    ).filter(F.col("vr") == 1)
    return best.select(
        F.col("qid").cast("bigint").alias("query_id"),
        F.col("true_label").cast("int").alias("true_label"),
        F.col("label").cast("int").alias("pred_label"),
        F.col("n_votes").cast("bigint").alias("n_votes"),
    )


# ---------------------------------------------------------------------------
# graph_kcore
# ---------------------------------------------------------------------------


def _kcore_round_sql(i: int, k: int) -> str:
    p = i - 1
    return f"""
    d{i} AS (SELECT src, count(*) AS d FROM e{p} GROUP BY src),
    k{i} AS MATERIALIZED (SELECT src FROM d{i} WHERE d >= {k}),
    e{i} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{p} e
      JOIN k{i} a ON e.src = a.src
      JOIN k{i} b ON e.dst = b.src)"""


_KCORE_SQL = f"""
    WITH {_lsh_edges_cte()},
    e0 AS MATERIALIZED (SELECT src, dst FROM edges),
    {_kcore_round_sql(1, 2)},
    {_kcore_round_sql(2, 2)},
    {_kcore_round_sql(3, 2)}
    SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e3 GROUP BY src
"""


@register(
    "graph_kcore",
    _KCORE_SQL,
    "bounded-round 2-core peeling (3 rounds) of the MinHash-LSH "
    "candidate graph: nodes of degree < 2 are stripped and edges "
    "restricted to survivors, repeated — the degeneracy pruning that "
    "removes whisker/chain artifacts from dedup clusters before "
    "component clustering. Each round is ONE degree hash-agg + two "
    "node-keyed semi-join edge restrictions (the unrolled certifiable "
    "form of the peel-to-fixpoint loop, like graph_bfs_layers); at "
    "production scale rounds run until no node drops, with the same "
    "per-round plan. All integer",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
    )
    # Each peel round references the previous edge set THREE times (degree
    # agg + two semi-joins); without a lineage cut the LSH signature
    # pipeline would re-evaluate 3^rounds times (the Spark twin of the
    # DuckDB multi-referenced-CTE trap — AS MATERIALIZED there, persist
    # here). The cached sets are dim-sized (candidate edges), never corpus
    # rows, so executor memory is KB even at production scale.
    e = edges.persist()
    for _ in range(3):
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= 2)
            .select("src")
        )
        e = (
            e.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .persist()
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )


# ---------------------------------------------------------------------------
# dq_column_profile
# ---------------------------------------------------------------------------

_PROFILE_SQL = """
    WITH a AS (
      SELECT count(*) AS n_rows,
             count(event_id) AS nn_id, count(DISTINCT event_id) AS nd_id,
             min(event_id) AS mn_id, max(event_id) AS mx_id,
             count(user_id) AS nn_u, count(DISTINCT user_id) AS nd_u,
             min(user_id) AS mn_u, max(user_id) AS mx_u,
             count(value) AS nn_v, count(DISTINCT value) AS nd_v,
             min(CAST(round(value * 100, 0) AS BIGINT)) AS mn_v,
             max(CAST(round(value * 100, 0) AS BIGINT)) AS mx_v,
             count(event_type) AS nn_t, count(DISTINCT event_type) AS nd_t,
             count(props) AS nn_p, count(DISTINCT props) AS nd_p
      FROM events)
    SELECT col, n_rows, n_nulls, n_distinct, min_num, max_num FROM (
      SELECT 'event_id' AS col, n_rows,
             CAST(n_rows - nn_id AS BIGINT) AS n_nulls,
             CAST(nd_id AS BIGINT) AS n_distinct,
             CAST(mn_id AS BIGINT) AS min_num,
             CAST(mx_id AS BIGINT) AS max_num FROM a
      UNION ALL
      SELECT 'user_id', n_rows, CAST(n_rows - nn_u AS BIGINT),
             CAST(nd_u AS BIGINT), CAST(mn_u AS BIGINT),
             CAST(mx_u AS BIGINT) FROM a
      UNION ALL
      SELECT 'value_cents', n_rows, CAST(n_rows - nn_v AS BIGINT),
             CAST(nd_v AS BIGINT), CAST(mn_v AS BIGINT),
             CAST(mx_v AS BIGINT) FROM a
      UNION ALL
      SELECT 'event_type', n_rows, CAST(n_rows - nn_t AS BIGINT),
             CAST(nd_t AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT) FROM a
      UNION ALL
      SELECT 'props', n_rows, CAST(n_rows - nn_p AS BIGINT),
             CAST(nd_p AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT) FROM a) t
"""


@register(
    "dq_column_profile",
    _PROFILE_SQL,
    "per-column data profile of the events table — the Deequ/TFDV "
    "profiling report (row count, null count, exact distinct count, "
    "numeric min/max in cents): ONE scan computes every statistic in "
    "a single aggregate, then a 5-row unpivot shapes the report; "
    "string columns emit NULL numeric bounds (collation-free). The "
    "schema-drift / completeness monitor every production pipeline "
    "runs before training",
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("event_id").alias("nn_id"),
        F.countDistinct("event_id").alias("nd_id"),
        F.min("event_id").alias("mn_id"),
        F.max("event_id").alias("mx_id"),
        F.count("user_id").alias("nn_u"),
        F.countDistinct("user_id").alias("nd_u"),
        F.min("user_id").alias("mn_u"),
        F.max("user_id").alias("mx_u"),
        F.count("value").alias("nn_v"),
        F.countDistinct("value").alias("nd_v"),
        F.min(F.round(F.col("value") * 100, 0).cast("bigint")).alias("mn_v"),
        F.max(F.round(F.col("value") * 100, 0).cast("bigint")).alias("mx_v"),
        F.count("event_type").alias("nn_t"),
        F.countDistinct("event_type").alias("nd_t"),
        F.count("props").alias("nn_p"),
        F.countDistinct("props").alias("nd_p"),
    )
    return a.selectExpr(
        """stack(5,
             'event_id', n_rows, CAST(n_rows - nn_id AS BIGINT),
               CAST(nd_id AS BIGINT), CAST(mn_id AS BIGINT),
               CAST(mx_id AS BIGINT),
             'user_id', n_rows, CAST(n_rows - nn_u AS BIGINT),
               CAST(nd_u AS BIGINT), CAST(mn_u AS BIGINT),
               CAST(mx_u AS BIGINT),
             'value_cents', n_rows, CAST(n_rows - nn_v AS BIGINT),
               CAST(nd_v AS BIGINT), CAST(mn_v AS BIGINT),
               CAST(mx_v AS BIGINT),
             'event_type', n_rows, CAST(n_rows - nn_t AS BIGINT),
               CAST(nd_t AS BIGINT), CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT),
             'props', n_rows, CAST(n_rows - nn_p AS BIGINT),
               CAST(nd_p AS BIGINT), CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT)
           ) AS (col, n_rows, n_nulls, n_distinct, min_num, max_num)"""
    )


# ---------------------------------------------------------------------------
# ab_mann_whitney_u
# ---------------------------------------------------------------------------

_MWU_SQL = """
    WITH x AS (
      SELECT event_type, CAST(user_id % 2 AS INT) AS variant,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    g AS (
      SELECT event_type, cents,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1,
             count(*) AS tc
      FROM x GROUP BY 1, 2),
    r AS (
      SELECT event_type, cents, c1, tc,
             sum(tc) OVER (PARTITION BY event_type ORDER BY cents) - tc
               AS cum_prev
      FROM g),
    s AS (
      SELECT event_type,
             CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(tc - c1) AS BIGINT) AS n0,
             CAST(sum(c1 * (2 * cum_prev + tc + 1)) AS BIGINT) AS r1_2
      FROM r GROUP BY event_type)
    SELECT event_type, n0, n1,
           CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u1_scaled,
           CAST(2 * n0 * n1 - (r1_2 - n1 * (n1 + 1)) AS BIGINT) AS u0_scaled
    FROM s
"""


@register(
    "ab_mann_whitney_u",
    _MWU_SQL,
    "Mann-Whitney U rank-sum test per event type (variant = user "
    "parity) — the nonparametric A/B screen beside Welch's t and the "
    "chi-square test. Tie-averaged ranks are kept EXACT by doubling: "
    "each value's 2x-average-rank is 2*cum_prev + tc + 1 (an integer "
    "from the distinct-value prefix window), so U1_scaled = 2*U1 is "
    "an exact integer and U0+U1 = n0*n1 is checkable. Shape: one "
    "hash agg to the distinct-value dim, one partitioned prefix "
    "window over it, one final agg — the fact table is scanned once",
)
def ab_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    g = x.groupBy("event_type", "cents").agg(
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("c1"),
        F.count(F.lit(1)).alias("tc"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    r = g.select(
        "event_type",
        "c1",
        "tc",
        (F.sum("tc").over(w) - F.col("tc")).alias("cum_prev"),
    )
    s = r.groupBy("event_type").agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("tc") - F.col("c1")).cast("bigint").alias("n0"),
        F.sum(F.col("c1") * (2 * F.col("cum_prev") + F.col("tc") + 1))
        .cast("bigint")
        .alias("r1_2"),
    )
    return s.select(
        "event_type",
        "n0",
        "n1",
        (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1))
        .cast("bigint")
        .alias("u1_scaled"),
        (
            2 * F.col("n0") * F.col("n1")
            - (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1))
        )
        .cast("bigint")
        .alias("u0_scaled"),
    )


# ---------------------------------------------------------------------------
# ml_tree_depth2
# ---------------------------------------------------------------------------

_TREE_SQL = """
    WITH pts AS (
      SELECT p_size AS f1, length(p_name) AS f2,
             CASE WHEN p_retailprice > 1500 THEN 1 ELSE 0 END AS y
      FROM part),
    v1 AS (
      SELECT f1, sum(y) AS c1, count(*) - sum(y) AS c0
      FROM pts GROUP BY f1),
    p1 AS (
      SELECT f1,
             sum(c1) OVER w AS l1, sum(c0) OVER w AS l0,
             sum(c1) OVER () AS t1, sum(c0) OVER () AS t0
      FROM v1 WINDOW w AS (ORDER BY f1)),
    cand1 AS (
      SELECT f1 AS t_root,
             least(l0, l1) + least(t0 - l0, t1 - l1) AS err
      FROM p1 WHERE (t0 - l0) + (t1 - l1) > 0),
    root AS MATERIALIZED (
      SELECT t_root FROM (
        SELECT t_root,
               row_number() OVER (ORDER BY err, t_root) AS rn
        FROM cand1) z
      WHERE rn = 1),
    sided AS (
      SELECT CASE WHEN pts.f1 <= root.t_root THEN 'L' ELSE 'R' END AS side,
             f2, y
      FROM pts CROSS JOIN root),
    v2 AS (
      SELECT side, f2, sum(y) AS c1, count(*) - sum(y) AS c0
      FROM sided GROUP BY 1, 2),
    p2 AS (
      SELECT side, f2,
             sum(c1) OVER w AS l1, sum(c0) OVER w AS l0,
             sum(c1) OVER (PARTITION BY side) AS t1,
             sum(c0) OVER (PARTITION BY side) AS t0
      FROM v2 WINDOW w AS (PARTITION BY side ORDER BY f2)),
    cand2 AS (
      SELECT side, f2 AS t_child,
             least(l0, l1) + least(t0 - l0, t1 - l1) AS err,
             l0, l1, t0 - l0 AS r0, t1 - l1 AS r1
      FROM p2 WHERE (t0 - l0) + (t1 - l1) > 0),
    best2 AS (
      SELECT side, t_child, err, l0, l1, r0, r1,
             row_number() OVER (PARTITION BY side
                                ORDER BY err, t_child) AS rn
      FROM cand2)
    SELECT b.side, CAST(r.t_root AS INT) AS root_threshold,
           CAST(b.t_child AS INT) AS child_threshold,
           CAST(b.err AS BIGINT) AS misclass,
           CAST(b.l0 AS BIGINT) AS ll_neg, CAST(b.l1 AS BIGINT) AS ll_pos,
           CAST(b.r0 AS BIGINT) AS lr_neg, CAST(b.r1 AS BIGINT) AS lr_pos
    FROM best2 b CROSS JOIN root r WHERE b.rn = 1
"""


@register(
    "ml_tree_depth2",
    _TREE_SQL,
    "exact depth-2 decision tree: best root split on p_size, then "
    "best per-child split on length(p_name), under the "
    "MISCLASSIFICATION impurity err = min(l0,l1) + min(r0,r1) — an "
    "ALL-INTEGER criterion (no float gini), so every argmin is an "
    "integer comparison with (err, threshold) tie-break. Each level "
    "is the ml_best_split shape: one distinct-value hash agg + prefix "
    "windows over the |domain| dim (the root's global window spans "
    "~50 distinct sizes; child windows partition by side) — the fact "
    "table is scanned twice total, the distributed tree-learner "
    "recursion pattern",
)
def ml_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    pts = part.select(
        F.col("p_size").alias("f1"),
        F.length("p_name").alias("f2"),
        F.when(F.col("p_retailprice") > 1500, 1).otherwise(0).alias("y"),
    )
    v1 = pts.groupBy("f1").agg(
        F.sum("y").alias("c1"),
        (F.count(F.lit(1)) - F.sum("y")).alias("c0"),
    )
    wo = Window.orderBy("f1").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    p1 = v1.select(
        "f1",
        F.sum("c1").over(wo).alias("l1"),
        F.sum("c0").over(wo).alias("l0"),
        F.sum("c1").over(wt).alias("t1"),
        F.sum("c0").over(wt).alias("t0"),
    )
    err1 = F.least(F.col("l0"), F.col("l1")) + F.least(
        F.col("t0") - F.col("l0"), F.col("t1") - F.col("l1")
    )
    cand1 = p1.filter(
        (F.col("t0") - F.col("l0")) + (F.col("t1") - F.col("l1")) > 0
    ).select(F.col("f1").alias("t_root"), err1.alias("err"))
    root = (
        cand1.withColumn(
            "rn", F.row_number().over(Window.orderBy("err", "t_root"))
        )
        .filter(F.col("rn") == 1)
        .select("t_root")
    )
    sided = pts.crossJoin(F.broadcast(root)).select(
        F.when(F.col("f1") <= F.col("t_root"), "L")
        .otherwise("R")
        .alias("side"),
        "f2",
        "y",
    )
    v2 = sided.groupBy("side", "f2").agg(
        F.sum("y").alias("c1"),
        (F.count(F.lit(1)) - F.sum("y")).alias("c0"),
    )
    w2 = (
        Window.partitionBy("side")
        .orderBy("f2")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w2t = Window.partitionBy("side")
    p2 = v2.select(
        "side",
        "f2",
        F.sum("c1").over(w2).alias("l1"),
        F.sum("c0").over(w2).alias("l0"),
        F.sum("c1").over(w2t).alias("t1"),
        F.sum("c0").over(w2t).alias("t0"),
    )
    cand2 = p2.filter(
        (F.col("t0") - F.col("l0")) + (F.col("t1") - F.col("l1")) > 0
    ).select(
        "side",
        F.col("f2").alias("t_child"),
        (
            F.least(F.col("l0"), F.col("l1"))
            + F.least(
                F.col("t0") - F.col("l0"), F.col("t1") - F.col("l1")
            )
        ).alias("err"),
        "l0",
        "l1",
        (F.col("t0") - F.col("l0")).alias("r0"),
        (F.col("t1") - F.col("l1")).alias("r1"),
    )
    best2 = cand2.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("side").orderBy("err", "t_child")
        ),
    ).filter(F.col("rn") == 1)
    return best2.crossJoin(F.broadcast(root)).select(
        "side",
        F.col("t_root").cast("int").alias("root_threshold"),
        F.col("t_child").cast("int").alias("child_threshold"),
        F.col("err").cast("bigint").alias("misclass"),
        F.col("l0").cast("bigint").alias("ll_neg"),
        F.col("l1").cast("bigint").alias("ll_pos"),
        F.col("r0").cast("bigint").alias("lr_neg"),
        F.col("r1").cast("bigint").alias("lr_pos"),
    )
