"""Round-9 batch 12: growth accounting and paired-classifier testing.

- ``rel_growth_accounting``: the weekly growth-accounting report —
  every active user classified as NEW (first week), RETAINED (also
  active the previous week), or RESURRECTED (returning after a gap),
  plus CHURNED (active last week, absent this week), and the quick
  ratio (new + resurrected) / churned — the standard decomposition
  behind every WAU chart (rel_retention_cohorts follows one cohort
  forward; this explains each week's net change, which a retention
  triangle cannot). All exact integer counts; the quick ratio is an
  integer milli.
- ``ml_mcnemar_test``: McNemar's paired test comparing the min-max
  score classifier (cut at its median, p >= 0.5) against a
  dow-heuristic baseline (weekend => positive) on identical rows —
  THE test for "is model A actually better than model B on the same
  data" (comparing two accuracies ignores pairing; McNemar uses only
  the discordant pairs b and c, where exactly one classifier is
  right). EXACT: the statistic (b-c)^2/(b+c) is put over milli units
  as an integer ratio.

Scale notes (100 TB): growth accounting shuffles facts once into the
distinct (user, week) grid, lags on the user key, and rolls up on the
calendar-bounded week dim — churn is the previous week's activity
re-keyed to week+1, an algebraic shift, not a self-join; McNemar is
two map-side classifications and ONE global 4-cell confusion agg (the
score bounds come from a 1-row broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# rel_growth_accounting
# ---------------------------------------------------------------------------

_GROWTH_SQL = """
    WITH uw AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 // 7 AS w
      FROM events),
    marked AS (
      SELECT user_id, w,
             lag(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w
      FROM uw),
    active AS (
      SELECT w,
             CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN prev_w IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN prev_w = w - 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN prev_w IS NOT NULL AND prev_w < w - 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM marked GROUP BY 1),
    churn AS (
      -- a user active in week w and absent in w+1 churns AT w+1:
      -- re-key last week's actives to w+1 and subtract the retained
      SELECT w + 1 AS w, CAST(count(*) AS BIGINT) AS n_prev_active
      FROM uw GROUP BY 1)
    SELECT CAST(a.w AS BIGINT) AS week,
           a.n_active, a.n_new, a.n_retained, a.n_resurrected,
           CAST(coalesce(c.n_prev_active, 0) - a.n_retained AS BIGINT)
             AS n_churned,
           CAST(CASE WHEN coalesce(c.n_prev_active, 0) - a.n_retained = 0
                     THEN 0
                ELSE (a.n_new + a.n_resurrected) * 1000
                     // (coalesce(c.n_prev_active, 0) - a.n_retained) END
                AS BIGINT) AS quick_ratio_milli
    FROM active a LEFT JOIN churn c ON a.w = c.w
"""


@register(
    "rel_growth_accounting",
    _GROWTH_SQL,
    "weekly growth accounting: every active user classified as NEW "
    "(first-ever week), RETAINED (also active the previous week), or "
    "RESURRECTED (returning after a gap >= 2 weeks), plus CHURNED "
    "(active last week, absent this week — computed algebraically as "
    "last week's actives minus this week's retained, never a "
    "self-join) and the quick ratio (new + resurrected) / churned in "
    "milli — the standard decomposition behind every WAU chart: "
    "rel_retention_cohorts follows one cohort forward, this explains "
    "each week's NET CHANGE, which a retention triangle cannot (weeks "
    "with zero churn report ratio 0 — the convention that keeps the "
    "column integral). BOUNDARY (advisor r9 #4): the report is driven "
    "from the ACTIVE week keys, so a week with zero active users — "
    "including the week after the last data week — emits no row, and "
    "churn occurring into an all-quiet week is unreported; "
    "deterministic and engine-consistent, and on any real event "
    "stream every calendar week has actives. Exact integer counts "
    "throughout. Shape: one "
    "distinct (user, week) hash-agg, a lag window on the user key "
    "(facts shuffle once), then a calendar-bounded week rollup and a "
    "shifted-key week join — the churn column costs one 2-column agg, "
    "not a second scan",
)
def rel_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000 div 7").alias("w"),
    ).distinct()
    wl = Window.partitionBy("user_id").orderBy("w")
    marked = uw.withColumn("prev_w", F.lag("w").over(wl))
    active = marked.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("prev_w").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_w") == F.col("w") - 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_w").isNotNull()
                & (F.col("prev_w") < F.col("w") - 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    churn = uw.groupBy((F.col("w") + 1).alias("cw")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_prev_active")
    )
    return (
        active.join(churn, active["w"] == churn["cw"], "left")
        .select(
            F.col("w").cast("bigint").alias("week"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            (
                F.coalesce(F.col("n_prev_active"), F.lit(0))
                - F.col("n_retained")
            )
            .cast("bigint")
            .alias("n_churned"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_prev_active, 0) - n_retained"
                " = 0 THEN 0"
                " ELSE (n_new + n_resurrected) * 1000"
                " div (coalesce(n_prev_active, 0) - n_retained) END"
                " AS BIGINT)"
            ).alias("quick_ratio_milli"),
        )
    )


# ---------------------------------------------------------------------------
# ml_mcnemar_test
# ---------------------------------------------------------------------------

_MCNEMAR_SQL = """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CASE WHEN CAST(((((epoch_us(ts)
                      - (((epoch_us(ts) % 86400000000) + 86400000000)
                         % 86400000000))
                     // 86400000000) % 7) + 7) % 7 AS INT) >= 5
                  THEN 1 ELSE 0 END AS pred_b
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi FROM s),
    p AS (
      SELECT y, pred_b,
             CASE WHEN (SELECT hi - lo FROM t) = 0 THEN 1
                  WHEN (cents - (SELECT lo FROM t)) * 1000000
                       // (SELECT hi - lo FROM t) >= 500000 THEN 1
                  ELSE 0 END AS pred_a
      FROM s),
    cells AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pred_a = y AND pred_b = y
                           THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
             CAST(sum(CASE WHEN pred_a = y AND pred_b <> y
                           THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN pred_a <> y AND pred_b = y
                           THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN pred_a <> y AND pred_b <> y
                           THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong,
             CAST(sum(CASE WHEN pred_a = y THEN 1 ELSE 0 END) AS BIGINT)
               AS acc_a_n,
             CAST(sum(CASE WHEN pred_b = y THEN 1 ELSE 0 END) AS BIGINT)
               AS acc_b_n
      FROM p)
    SELECT n, both_right, b, c, both_wrong,
           CAST(acc_a_n * 1000000 // n AS BIGINT) AS acc_a_micro,
           CAST(acc_b_n * 1000000 // n AS BIGINT) AS acc_b_micro,
           CAST(CASE WHEN b + c = 0 THEN 0
                ELSE (b - c) * (b - c) * 1000 // (b + c) END AS BIGINT)
             AS mcnemar_milli
    FROM cells
"""


@register(
    "ml_mcnemar_test",
    _MCNEMAR_SQL,
    "McNemar's paired test comparing the min-max score classifier (cut "
    "at p >= 0.5) against a day-of-week heuristic baseline (weekend => "
    "positive) on IDENTICAL rows: the 2x2 agreement table "
    "(both-right / only-A / only-B / both-wrong), both accuracies, and "
    "the McNemar statistic (b-c)^2/(b+c) in milli — THE test for 'is "
    "model A actually better than model B' (comparing two standalone "
    "accuracies throws away the pairing; McNemar conditions on the "
    "discordant pairs, where exactly one classifier is right — the "
    "same 1% accuracy edge is decisive if one-sided and noise if "
    "symmetric). Completes the eval family's comparison axis: "
    "ab_ttest_welch compares METRIC MEANS across arms, this compares "
    "CLASSIFIERS on one dataset. EXACT: integer cells; the statistic "
    "is one integer ratio (b + c = 0 reports 0); day-of-week uses the "
    "subtract-pmod floor-day form. Shape: two map-side "
    "classifications (score bounds from a 1-row broadcast) and ONE "
    "global 4-cell confusion agg — the fact table is scanned once, "
    "nothing bigger than one row ever shuffles",
)
def ml_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.expr(
            "CASE WHEN CAST(pmod((unix_micros(ts) - pmod(unix_micros(ts),"
            " 86400000000)) div 86400000000, 7) AS INT) >= 5"
            " THEN 1 ELSE 0 END"
        ).alias("pred_b"),
    )
    t = s.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    p = s.crossJoin(F.broadcast(t)).select(
        "y",
        "pred_b",
        F.expr(
            "CASE WHEN hi - lo = 0 THEN 1"
            " WHEN (cents - lo) * 1000000 div (hi - lo) >= 500000 THEN 1"
            " ELSE 0 END"
        ).alias("pred_a"),
    )
    cells = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                (F.col("pred_a") == F.col("y"))
                & (F.col("pred_b") == F.col("y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("both_right"),
        F.sum(
            F.when(
                (F.col("pred_a") == F.col("y"))
                & (F.col("pred_b") != F.col("y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("b"),
        F.sum(
            F.when(
                (F.col("pred_a") != F.col("y"))
                & (F.col("pred_b") == F.col("y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("c"),
        F.sum(
            F.when(
                (F.col("pred_a") != F.col("y"))
                & (F.col("pred_b") != F.col("y")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("both_wrong"),
        F.sum(F.when(F.col("pred_a") == F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("acc_a_n"),
        F.sum(F.when(F.col("pred_b") == F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("acc_b_n"),
    )
    return cells.select(
        "n",
        "both_right",
        "b",
        "c",
        "both_wrong",
        F.expr("CAST(acc_a_n * 1000000 div n AS BIGINT)").alias(
            "acc_a_micro"
        ),
        F.expr("CAST(acc_b_n * 1000000 div n AS BIGINT)").alias(
            "acc_b_micro"
        ),
        F.expr(
            "CAST(CASE WHEN b + c = 0 THEN 0"
            " ELSE (b - c) * (b - c) * 1000 div (b + c) END AS BIGINT)"
        ).alias("mcnemar_milli"),
    )
