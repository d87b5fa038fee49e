"""Round-5 batch 10: skew-safe distinct, hierarchy rollup, sequential
testing, PR curves, and time-series cross-validation —

- ``agg_skew_salted_distinct``: exact COUNT(DISTINCT) per hot key via
  SALTING — the user space is sharded by user_id mod 8, per-shard
  distincts count in parallel, and shard counts SUM exactly because
  the salt partitions the value space; the standard fix when one hot
  group funnels a count-distinct into a single reducer. The oracle is
  the plain COUNT(DISTINCT) — identical result, different plan.
- ``rel_hierarchy_rollup``: 3-level hierarchy rollup (leaf -> parent
  -> grandparent via integer key division) — every node aggregates
  its whole subtree through one bounded ancestor explode, the
  BOM/org-chart rollup without recursion.
- ``ab_sprt_crossing``: Wald's sequential probability ratio test on
  the variant stream per event type (H0 p=0.5 vs H1 p=0.6, alpha =
  beta = 0.05) — the early-stopping A/B monitor; per-observation LLR
  increments and the decision thresholds are integer micro LITERALS
  (no libm at query time), the walk is a running integer sum, and
  the first crossing is a rank selection.
- ``ml_pr_curve``: the precision-recall curve of the Naive Bayes gate
  at every distinct score threshold — cumulative tp/fp over the
  score-desc dim with floor-division micro precision/recall; the
  threshold-tuning companion to ml_auc_exact.
- ``p_rolling_origin_cv``: rolling-origin (expanding-window) temporal
  cross-validation folds — train always precedes test, fold
  boundaries are integer day quantiles of the observed span; the
  forecast-eval split discipline beside the single temporal holdout.

Float discipline: NO doubles in this module; the SPRT constants are
precomputed integer literals shared verbatim by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# agg_skew_salted_distinct
# ---------------------------------------------------------------------------

_SALT = 8

_SALTED_SQL = """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
"""


@register(
    "agg_skew_salted_distinct",
    _SALTED_SQL,
    "exact distinct users per event type computed SKEW-SAFE: stage 1 "
    "groups by (type, user_id % 8) and counts distinct users inside "
    "each salt shard, stage 2 sums the shard counts — exact because "
    "the salt PARTITIONS the user space (each user lands in exactly "
    "one shard), so shard distincts are disjoint and additive. This "
    "is the standard rewrite when one hot key funnels a "
    "count-distinct into a single reducer: the heavy distinct state "
    "spreads across 8x the tasks. The oracle is the plain "
    "COUNT(DISTINCT) — same numbers, different plan",
)
def agg_skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    shard = ev.groupBy(
        "event_type", (F.col("user_id") % _SALT).alias("salt")
    ).agg(
        F.countDistinct("user_id").alias("du"),
        F.count(F.lit(1)).alias("ne"),
    )
    return shard.groupBy("event_type").agg(
        F.sum("du").cast("bigint").alias("n_users"),
        F.sum("ne").cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# rel_hierarchy_rollup
# ---------------------------------------------------------------------------

_BOM_SQL = """
    WITH leaves AS (
      SELECT p_partkey AS pk,
             CAST(round(p_retailprice * 100, 0) AS BIGINT) AS cents
      FROM part),
    anc AS (
      SELECT pk, cents, unnest([
        pk, pk // 10, pk // 100
      ]) AS ancestor, unnest([0, 1, 2]) AS level
      FROM leaves)
    SELECT CAST(ancestor AS BIGINT) AS node_id,
           CAST(level AS INT) AS level,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM anc GROUP BY ancestor, level
"""


@register(
    "rel_hierarchy_rollup",
    _BOM_SQL,
    "3-level hierarchy rollup (leaf part -> parent -> grandparent via "
    "integer key division, the synthetic BOM/org chart): every node "
    "aggregates its whole subtree by exploding each leaf to its "
    "bounded ancestor list (depth 3) and hash-aggregating on "
    "(ancestor, level) — the recursion-free rollup pattern that "
    "replaces a transitive-closure join at any scale (fan-out = tree "
    "depth, a constant). All exact integer cents",
)
def rel_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    leaves = part.select(
        F.col("p_partkey").alias("pk"),
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    )
    anc = leaves.select(
        "cents",
        F.posexplode(
            F.array(F.col("pk"), F.expr("pk div 10"), F.expr("pk div 100"))
        ).alias("level", "ancestor"),
    )
    return anc.groupBy("ancestor", "level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    ).select(
        F.col("ancestor").cast("bigint").alias("node_id"),
        F.col("level").cast("int").alias("level"),
        "n_parts",
        "total_cents",
    )


# ---------------------------------------------------------------------------
# ab_sprt_crossing
# ---------------------------------------------------------------------------

# Wald SPRT, H0: p=0.5 vs H1: p=0.6, alpha = beta = 0.05. Integer micro
# literals (shared verbatim by both engines — no libm at query time):
#   llr(success) = ln(0.6/0.5) * 1e6 = 182322
#   llr(failure) = ln(0.4/0.5) * 1e6 = -223144
#   A = ln((1-beta)/alpha) * 1e6 = ln(19) * 1e6 = 2944439
_SPRT_UP = 182322
_SPRT_DN = -223144
_SPRT_A = 2944439

_SPRT_SQL = f"""
    WITH obs AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 1 THEN {_SPRT_UP}
                  ELSE {_SPRT_DN} END AS llr,
             epoch_us(ts) AS x, event_id
      FROM events),
    walk AS (
      SELECT event_type,
             sum(llr) OVER w AS cum,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM obs WINDOW w AS (PARTITION BY event_type ORDER BY x, event_id
                            ROWS UNBOUNDED PRECEDING)),
    crossings AS (
      SELECT event_type, rn, n,
             CASE WHEN cum >= {_SPRT_A} THEN 'h1' ELSE 'h0' END AS decision,
             row_number() OVER (PARTITION BY event_type ORDER BY rn) AS k
      FROM walk
      WHERE cum >= {_SPRT_A} OR cum <= -{_SPRT_A}),
    pertype AS (SELECT DISTINCT event_type, n FROM walk)
    SELECT p.event_type,
           CAST(p.n AS BIGINT) AS n_total,
           CAST(coalesce(c.rn, 0) AS BIGINT) AS n_at_decision,
           coalesce(c.decision, 'continue') AS decision
    FROM pertype p
    LEFT JOIN (SELECT * FROM crossings WHERE k = 1) c
      ON p.event_type = c.event_type
"""


@register(
    "ab_sprt_crossing",
    _SPRT_SQL,
    "Wald sequential probability ratio test per event type (H0 p=0.5 "
    "vs H1 p=0.6 on the variant stream, alpha=beta=0.05): the "
    "early-stopping A/B monitor that decides as soon as the evidence "
    "walk leaves (-A, A). Per-observation LLR increments and the "
    "threshold are INTEGER MICRO LITERALS precomputed in the source "
    "(no libm at query time), the walk is one partitioned running "
    "sum over a total (ts, event_id) order, and the first crossing "
    "is a rank selection; types that never cross report 'continue'. "
    "The sequential companion to the fixed-horizon Welch/chi2/U tests",
)
def ab_sprt_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 1, _SPRT_UP)
        .otherwise(_SPRT_DN)
        .alias("llr"),
        F.unix_micros("ts").alias("x"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("x", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walk = obs.select(
        "event_type",
        F.sum("llr").over(w).alias("cum"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "event_id"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    crossings = (
        walk.filter(
            (F.col("cum") >= _SPRT_A) | (F.col("cum") <= -_SPRT_A)
        )
        .withColumn(
            "decision",
            F.when(F.col("cum") >= _SPRT_A, "h1").otherwise("h0"),
        )
        .withColumn(
            "k",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("rn")
            ),
        )
        .filter(F.col("k") == 1)
        .select("event_type", "rn", "decision")
    )
    pertype = walk.select("event_type", "n").distinct()
    return pertype.join(
        F.broadcast(crossings), "event_type", "left_outer"
    ).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_total"),
        F.coalesce("rn", F.lit(0)).cast("bigint").alias("n_at_decision"),
        F.coalesce("decision", F.lit("continue")).alias("decision"),
    )


# ---------------------------------------------------------------------------
# ml_pr_curve
# ---------------------------------------------------------------------------


def _pr_sql() -> str:
    from jigsaw_spark.plans.queries_r7 import _nb_sql

    return f"""
    WITH nb AS ({_nb_sql()}),
    scored AS (
      SELECT nb.score_micro AS s, CAST(d.lang = 'en' AS INT) AS pos
      FROM nb JOIN documents d ON nb.doc_id = d.doc_id),
    g AS (
      SELECT s, sum(pos) AS np, count(*) - sum(pos) AS nn
      FROM scored GROUP BY s),
    cum AS (
      SELECT s,
             sum(np) OVER (ORDER BY s DESC) AS tp,
             sum(nn) OVER (ORDER BY s DESC) AS fp,
             sum(np) OVER () AS p
      FROM g)
    SELECT CAST(s AS BIGINT) AS threshold_micro,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(tp * 1000000 // (tp + fp) AS BIGINT) AS precision_micro,
           CAST(tp * 1000000 // p AS BIGINT) AS recall_micro
    FROM cum
"""


@register(
    "ml_pr_curve",
    _pr_sql(),
    "precision-recall curve of the Naive Bayes gate at every distinct "
    "score threshold: cumulative tp/fp prefix sums over the "
    "score-DESC distinct-value dim, precision/recall as exact "
    "floor-division micro-units — the threshold-tuning companion to "
    "ml_auc_exact (same contingency discipline, per-point output, no "
    "cross-row float sums). The global windows run on the bounded "
    "distinct-score dim, the ml_auc_exact precedent; tp+fp >= 1 at "
    "every emitted threshold by construction",
)
def ml_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_r7 import ml_nbayes_classify

    docs = _t(spark, sf_dir, "documents")
    nb = ml_nbayes_classify(spark, sf_dir).select(
        "doc_id", F.col("score_micro").alias("s")
    )
    scored = nb.join(docs.select("doc_id", "lang"), "doc_id").select(
        "s", (F.col("lang") == "en").cast("int").alias("pos")
    )
    g = scored.groupBy("s").agg(
        F.sum("pos").alias("np"),
        (F.count(F.lit(1)) - F.sum("pos")).alias("nn"),
    )
    wd = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.select(
        "s",
        F.sum("np").over(wd).alias("tp"),
        F.sum("nn").over(wd).alias("fp"),
        F.sum("np").over(Window.partitionBy()).alias("p"),
    )
    return cum.select(
        F.col("s").cast("bigint").alias("threshold_micro"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.expr("CAST(tp * 1000000 div (tp + fp) AS BIGINT)").alias(
            "precision_micro"
        ),
        F.expr("CAST(tp * 1000000 div p AS BIGINT)").alias("recall_micro"),
    )


# ---------------------------------------------------------------------------
# p_rolling_origin_cv
# ---------------------------------------------------------------------------

_CV_K = 4

_CV_SQL = f"""
    WITH d AS (
      SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id
      FROM events),
    span AS (SELECT min(day_id) AS d0, max(day_id) AS d1 FROM d),
    folds AS (
      SELECT f.fold,
             s.d0 + ((f.fold) * (s.d1 - s.d0 + 1)) // {_CV_K + 1} AS cut_lo,
             s.d0 + ((f.fold + 1) * (s.d1 - s.d0 + 1)) // {_CV_K + 1}
               AS cut_hi
      FROM (SELECT unnest(range(1, {_CV_K + 1})) AS fold) f
      CROSS JOIN span s)
    SELECT CAST(f.fold AS INT) AS fold,
           CAST(f.cut_lo AS BIGINT) AS train_end_day,
           CAST(f.cut_hi AS BIGINT) AS test_end_day,
           CAST(sum(CASE WHEN d.day_id < f.cut_lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN d.day_id >= f.cut_lo
                          AND d.day_id < f.cut_hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_test
    FROM d CROSS JOIN folds f
    GROUP BY f.fold, f.cut_lo, f.cut_hi
"""


@register(
    "p_rolling_origin_cv",
    _CV_SQL,
    "rolling-origin (expanding-window) temporal cross-validation: 4 "
    "folds whose train window always ends before the test window "
    "begins, with boundaries at integer day-quantiles of the observed "
    "span (floor division — deterministic) — the forecast-eval "
    "discipline that prevents look-ahead leakage, generalizing the "
    "single temporal holdout. Shape: a 1-row span scalar expands to a "
    "4-row fold dim crossed into the scan with ONE conditional agg; "
    "fan-out is the constant fold count",
)
def p_rolling_origin_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        )
    )
    span = d.agg(F.min("day_id").alias("d0"), F.max("day_id").alias("d1"))
    folds = (
        spark.range(1, _CV_K + 1)
        .select(F.col("id").cast("int").alias("fold"))
        .crossJoin(F.broadcast(span))
        .select(
            "fold",
            F.expr(
                f"d0 + (fold * (d1 - d0 + 1)) div {_CV_K + 1}"
            ).alias("cut_lo"),
            F.expr(
                f"d0 + ((fold + 1) * (d1 - d0 + 1)) div {_CV_K + 1}"
            ).alias("cut_hi"),
        )
    )
    return (
        d.crossJoin(F.broadcast(folds))
        .groupBy("fold", "cut_lo", "cut_hi")
        .agg(
            F.sum(F.when(F.col("day_id") < F.col("cut_lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.sum(
                F.when(
                    (F.col("day_id") >= F.col("cut_lo"))
                    & (F.col("day_id") < F.col("cut_hi")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_test"),
        )
        .select(
            F.col("fold").cast("int").alias("fold"),
            F.col("cut_lo").cast("bigint").alias("train_end_day"),
            F.col("cut_hi").cast("bigint").alias("test_end_day"),
            "n_train",
            "n_test",
        )
    )
