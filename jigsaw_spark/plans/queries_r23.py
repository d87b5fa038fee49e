"""Round-5 batch 17: lead-lag discovery and feature screening —

- ``ts_cross_corr``: lag-k cross-correlation between every ordered
  pair of event-type daily series (does purchase volume FOLLOW click
  volume?) — the lead-lag discovery scan behind forecasting feature
  selection; quantized-anchor integer geometry (the ts_autocorr
  discipline) with one snapped ratio per (pair, lag).
- ``ml_feature_importance``: single-split feature screen — for each
  candidate feature, the best decision-stump misclassification and
  its improvement over the majority-class baseline, under the
  ALL-INTEGER impurity of ml_tree_depth2; the cheap first pass that
  ranks features before any tree is grown.

Float discipline: the only double is the cross-correlation ratio —
one shared snapped expression over exact integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ts_cross_corr
# ---------------------------------------------------------------------------

_XC_SQL = """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id,
             CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                  // 100 AS BIGINT) AS yd
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type,
             CAST(sum(yd) AS BIGINT) // count(*) AS mq
      FROM daily GROUP BY 1),
    d AS (
      SELECT daily.event_type, day_id, yd - mq AS dv
      FROM daily JOIN m USING (event_type)),
    sd AS (
      SELECT event_type, CAST(sum(dv * dv) AS BIGINT) AS sdd
      FROM d GROUP BY 1),
    lags AS (SELECT unnest(range(0, 3)) AS lag),
    x AS (
      SELECT a.event_type AS lead_type, b.event_type AS follow_type,
             l.lag,
             CAST(sum(a.dv * b.dv) AS BIGINT) AS num,
             count(*) AS n_pairs
      FROM d a
      CROSS JOIN lags l
      JOIN d b ON b.event_type <> a.event_type
              AND b.day_id = a.day_id + l.lag
      GROUP BY 1, 2, 3)
    SELECT x.lead_type, x.follow_type, CAST(x.lag AS INT) AS lag,
           CAST(x.n_pairs AS BIGINT) AS n_pairs,
           CASE WHEN sa.sdd > 0 AND sb.sdd > 0
                THEN round(round(CAST(x.num AS DOUBLE)
                                 / (sqrt(CAST(sa.sdd AS DOUBLE))
                                    * sqrt(CAST(sb.sdd AS DOUBLE))), 9), 6)
                ELSE CAST(0.0 AS DOUBLE) END AS xcorr
    FROM x
    JOIN sd sa ON sa.event_type = x.lead_type
    JOIN sd sb ON sb.event_type = x.follow_type
"""


@register(
    "ts_cross_corr",
    _XC_SQL,
    "lag-0..2 cross-correlation between every ordered pair of "
    "event-type daily series — the lead-lag discovery scan (does "
    "purchase volume FOLLOW click volume by k days?) behind "
    "forecasting feature selection. The ts_autocorr discipline: "
    "quantized-anchor integer deviations, exact integer numerator and "
    "per-series energy, ONE shared snapped ratio per (pair, lag) "
    "normalized by the full-series energies (IEEE sqrt). All work "
    "runs on the calendar-bounded day dim after one fact agg; the "
    "pair join is type-keyed with a day-offset equi condition",
)
def ts_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        ),
    ).agg(
        F.expr(
            "CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)"
            " div 100 AS BIGINT)"
        ).alias("yd")
    )
    m = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(yd) AS BIGINT) div count(*)").alias("mq")
    )
    d = daily.join(F.broadcast(m), "event_type").select(
        "event_type", "day_id", (F.col("yd") - F.col("mq")).alias("dv")
    )
    sd = d.groupBy("event_type").agg(
        F.sum(F.col("dv") * F.col("dv")).cast("bigint").alias("sdd")
    )
    lags = spark.range(0, 3).select(F.col("id").cast("int").alias("lag"))
    a = d.select(
        F.col("event_type").alias("lead_type"),
        F.col("day_id").alias("da"),
        F.col("dv").alias("dva"),
    )
    b = d.select(
        F.col("event_type").alias("follow_type"),
        F.col("day_id").alias("db"),
        F.col("dv").alias("dvb"),
    )
    x = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("follow_type") != F.col("lead_type"))
            & (F.col("db") == F.col("da") + F.col("lag")),
        )
        .groupBy("lead_type", "follow_type", "lag")
        .agg(
            F.sum(F.col("dva") * F.col("dvb")).cast("bigint").alias("num"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    sa = sd.select(
        F.col("event_type").alias("lead_type"), F.col("sdd").alias("sa")
    )
    sb = sd.select(
        F.col("event_type").alias("follow_type"), F.col("sdd").alias("sb")
    )
    return (
        x.join(F.broadcast(sa), "lead_type")
        .join(F.broadcast(sb), "follow_type")
        .select(
            "lead_type",
            "follow_type",
            F.col("lag").cast("int").alias("lag"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.when(
                (F.col("sa") > 0) & (F.col("sb") > 0),
                F.round(
                    F.round(
                        F.col("num").cast("double")
                        / (
                            F.sqrt(F.col("sa").cast("double"))
                            * F.sqrt(F.col("sb").cast("double"))
                        ),
                        9,
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("xcorr"),
        )
    )


# ---------------------------------------------------------------------------
# ml_feature_importance
# ---------------------------------------------------------------------------

_FI_SQL = """
    WITH pts AS (
      SELECT CAST(p_size AS BIGINT) AS f_size,
             CAST(length(p_name) AS BIGINT) AS f_namelen,
             CAST(length(p_type) AS BIGINT) AS f_typelen,
             CASE WHEN p_retailprice > 1500 THEN 1 ELSE 0 END AS y
      FROM part),
    base AS (
      SELECT count(*) AS n, sum(y) AS pos FROM pts),
    long AS (
      SELECT 'p_size' AS feature, f_size AS x, y FROM pts
      UNION ALL
      SELECT 'len_p_name', f_namelen, y FROM pts
      UNION ALL
      SELECT 'len_p_type', f_typelen, y FROM pts),
    v AS (
      SELECT feature, x, sum(y) AS c1, count(*) - sum(y) AS c0
      FROM long GROUP BY feature, x),
    p AS (
      SELECT feature, x,
             sum(c1) OVER w AS l1, sum(c0) OVER w AS l0,
             sum(c1) OVER (PARTITION BY feature) AS t1,
             sum(c0) OVER (PARTITION BY feature) AS t0
      FROM v WINDOW w AS (PARTITION BY feature ORDER BY x
                          ROWS UNBOUNDED PRECEDING)),
    cand AS (
      SELECT feature, x AS threshold,
             least(l0, l1) + least(t0 - l0, t1 - l1) AS err
      FROM p WHERE (t0 - l0) + (t1 - l1) > 0),
    best AS (
      SELECT feature, threshold, err,
             row_number() OVER (PARTITION BY feature
                                ORDER BY err, threshold) AS rn
      FROM cand)
    SELECT b.feature,
           CAST(b.threshold AS BIGINT) AS threshold,
           CAST(b.err AS BIGINT) AS split_misclass,
           CAST(least(bb.pos, bb.n - bb.pos) AS BIGINT) AS null_misclass,
           CAST(least(bb.pos, bb.n - bb.pos) - b.err AS BIGINT)
             AS importance
    FROM best b CROSS JOIN base bb
    WHERE b.rn = 1
"""


@register(
    "ml_feature_importance",
    _FI_SQL,
    "single-split feature screen: for each candidate feature (size, "
    "name length, type length) the best decision-stump "
    "misclassification under the ALL-INTEGER impurity (ml_tree_depth2 "
    "discipline) and its improvement over the majority-class baseline "
    "— the cheap screen that ranks features before growing any tree. "
    "Features unpivot into one long relation, so ONE distinct-value "
    "agg + feature-partitioned prefix windows serve every feature; "
    "the fact table is scanned once",
)
def ml_feature_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    pts = part.select(
        F.col("p_size").cast("bigint").alias("f_size"),
        F.length("p_name").cast("bigint").alias("f_namelen"),
        F.length("p_type").cast("bigint").alias("f_typelen"),
        F.when(F.col("p_retailprice") > 1500, 1).otherwise(0).alias("y"),
    )
    base = pts.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    )
    long = pts.selectExpr(
        "stack(3, 'p_size', f_size, 'len_p_name', f_namelen,"
        " 'len_p_type', f_typelen) AS (feature, x)",
        "y",
    )
    v = long.groupBy("feature", "x").agg(
        F.sum("y").alias("c1"),
        (F.count(F.lit(1)) - F.sum("y")).alias("c0"),
    )
    wo = (
        Window.partitionBy("feature")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("feature")
    p = v.select(
        "feature",
        "x",
        F.sum("c1").over(wo).alias("l1"),
        F.sum("c0").over(wo).alias("l0"),
        F.sum("c1").over(wt).alias("t1"),
        F.sum("c0").over(wt).alias("t0"),
    )
    cand = p.filter(
        (F.col("t0") - F.col("l0")) + (F.col("t1") - F.col("l1")) > 0
    ).select(
        "feature",
        F.col("x").alias("threshold"),
        (
            F.least(F.col("l0"), F.col("l1"))
            + F.least(F.col("t0") - F.col("l0"), F.col("t1") - F.col("l1"))
        ).alias("err"),
    )
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("feature").orderBy("err", "threshold")
        ),
    ).filter(F.col("rn") == 1)
    return best.crossJoin(F.broadcast(base)).select(
        "feature",
        F.col("threshold").cast("bigint").alias("threshold"),
        F.col("err").cast("bigint").alias("split_misclass"),
        F.least(F.col("pos"), F.col("n") - F.col("pos"))
        .cast("bigint")
        .alias("null_misclass"),
        (
            F.least(F.col("pos"), F.col("n") - F.col("pos")) - F.col("err")
        )
        .cast("bigint")
        .alias("importance"),
    )
