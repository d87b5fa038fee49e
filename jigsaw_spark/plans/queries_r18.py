"""Round-5 batch 12: pipeline freshness monitoring and gradient
boosting —

- ``dq_freshness``: the ingestion-freshness SLA monitor — per event
  type the latest arrival, its lag behind the global frontier in
  whole minutes, and a 24h staleness flag; the first alert every
  production pipeline wires.
- ``ml_boost_2rounds``: two rounds of gradient boosting with stump
  weak learners (the GBDT inner loop): round 1 fits the best SSE
  split on quantity with INTEGER leaf values (floor-divided means),
  round 2 fits the best split on discount over the exact integer
  residuals. Split gains use the decimal(38,0) prefix-sum +
  round-snap discipline proven by ts_best_changepoint; residuals
  never touch a float, so the boosted predictions are exact integers
  end-to-end.

Float discipline: the only doubles are the two split-gain columns —
each ONE shared expression over exact decimal sums, double-round
snapped, used for an argmax with an integer tie-break (the
ts_best_changepoint precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# dq_freshness
# ---------------------------------------------------------------------------

_FRESH_SQL = """
    WITH m AS (
      SELECT event_type, max(epoch_us(ts)) AS last_us,
             count(*) AS n
      FROM events GROUP BY event_type),
    g AS (SELECT max(last_us) AS frontier FROM m)
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n_events,
           CAST(m.last_us AS BIGINT) AS last_us,
           CAST((g.frontier - m.last_us) // 60000000 AS BIGINT)
             AS lag_minutes,
           CAST(CASE WHEN g.frontier - m.last_us > 86400000000
                     THEN 1 ELSE 0 END AS INT) AS is_stale_24h
    FROM m CROSS JOIN g
"""


@register(
    "dq_freshness",
    _FRESH_SQL,
    "ingestion-freshness SLA monitor: per event type the latest "
    "arrival, its lag behind the global frontier in whole minutes "
    "(integer floor division of microseconds), and a 24h staleness "
    "flag — the first alert every production pipeline wires, here as "
    "an auditable query. ONE max/count agg + a 1-row frontier scalar "
    "crossed back; at scale the agg is map-side combinable to "
    "|types| rows",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("n"),
    )
    g = m.agg(F.max("last_us").alias("frontier"))
    return m.crossJoin(F.broadcast(g)).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("last_us").cast("bigint").alias("last_us"),
        F.expr(
            "CAST((frontier - last_us) div 60000000 AS BIGINT)"
        ).alias("lag_minutes"),
        F.when(F.col("frontier") - F.col("last_us") > 86400000000, 1)
        .otherwise(0)
        .cast("int")
        .alias("is_stale_24h"),
    )


# ---------------------------------------------------------------------------
# ml_boost_2rounds
# ---------------------------------------------------------------------------

# truncated division toward zero (negative residual means) — Spark div
# truncates natively; duckdb 1.0's integer // does too (verified r9), so
# the CASE form is an explicit spelling of the shared semantics, kept for
# engine-version robustness.
_TDIV = "CASE WHEN {x} >= 0 THEN {x} // {d} ELSE -((-({x})) // {d}) END"


def _round_sql(feat: str, target: str, rnd: int, src: str) -> str:
    """One boosting round: best-SSE stump on `feat` over `target`."""
    return f"""
    v{rnd} AS (
      SELECT {feat} AS x, count(*) AS n,
             sum(CAST({target} AS DECIMAL(38,0))) AS s
      FROM {src} GROUP BY {feat}),
    p{rnd} AS (
      SELECT x,
             sum(n) OVER w AS ln_, sum(s) OVER w AS ls,
             sum(n) OVER () AS tn, sum(s) OVER () AS ts_
      FROM v{rnd} WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)),
    cand{rnd} AS (
      SELECT x AS threshold, ln_, tn,
             CAST(ls AS BIGINT) AS lsb,
             CAST(ts_ AS BIGINT) AS tsb,
             round(round(
               CAST(ls AS DOUBLE) * CAST(ls AS DOUBLE) / ln_
               + (CAST(ts_ AS DOUBLE) - CAST(ls AS DOUBLE))
                 * (CAST(ts_ AS DOUBLE) - CAST(ls AS DOUBLE)) / (tn - ln_)
               - CAST(ts_ AS DOUBLE) * CAST(ts_ AS DOUBLE) / tn, 6), 2)
               AS gain
      FROM p{rnd} WHERE ln_ < tn),
    best{rnd} AS MATERIALIZED (
      SELECT threshold, gain,
             CAST(ln_ AS BIGINT) AS left_n,
             CAST(tn - ln_ AS BIGINT) AS right_n,
             CAST({_TDIV.format(x='lsb', d='ln_')} AS BIGINT) AS left_value,
             CAST({_TDIV.format(x='(tsb - lsb)', d='(tn - ln_)')} AS BIGINT)
               AS right_value
      FROM (SELECT *, row_number() OVER (ORDER BY gain DESC, threshold)
                      AS rn
            FROM cand{rnd}) z
      WHERE rn = 1)"""


def _boost_sql() -> str:
    return f"""
    WITH pts AS (
      SELECT CAST(round(l_quantity, 0) AS BIGINT) AS q,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS dpct,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
      FROM lineitem),
    {_round_sql('q', 'y', 1, 'pts')},
    resid AS (
      SELECT pts.dpct,
             pts.y - CASE WHEN pts.q <= b.threshold
                          THEN b.left_value ELSE b.right_value END AS r
      FROM pts CROSS JOIN best1 b),
    {_round_sql('dpct', 'r', 2, 'resid')}
    SELECT 1 AS boost_round, CAST(threshold AS BIGINT) AS threshold,
           left_n, right_n, left_value, right_value, gain
    FROM best1
    UNION ALL
    SELECT 2, CAST(threshold AS BIGINT), left_n, right_n,
           left_value, right_value, gain
    FROM best2
"""


@register(
    "ml_boost_2rounds",
    _boost_sql(),
    "two rounds of gradient boosting with stump weak learners — the "
    "GBDT inner loop: round 1 fits the best SSE split on quantity "
    "(gain from exact decimal(38,0) prefix sums over the distinct-"
    "value dim, double-round snapped, argmax tie-broken on the "
    "smaller threshold — the ts_best_changepoint discipline), leaf "
    "values are FLOOR-DIVIDED integer means, so round-2 residuals "
    "are exact integers; round 2 repeats on discount over the "
    "residuals (negative sums use the tdiv CASE on the oracle side). "
    "Shape per round: one distinct-value hash agg + prefix windows "
    "over the ~50-row dim, then a 1-row split broadcast back — two "
    "fact scans total",
)
def ml_boost_2rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.round("l_quantity", 0).cast("bigint").alias("q"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("dpct"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
    )

    def best_split(df, feat: str, target: str):
        v = df.groupBy(F.col(feat).alias("x")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(target).cast("decimal(38,0)")).alias("s"),
        )
        wo = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
        wt = Window.partitionBy()
        p = v.select(
            "x",
            F.sum("n").over(wo).alias("ln_"),
            F.sum("s").over(wo).alias("ls"),
            F.sum("n").over(wt).alias("tn"),
            F.sum("s").over(wt).alias("ts_"),
        )
        ls, ts_ = F.col("ls").cast("double"), F.col("ts_").cast("double")
        ln_, tn = F.col("ln_"), F.col("tn")
        gain = F.round(
            F.round(
                ls * ls / ln_
                + (ts_ - ls) * (ts_ - ls) / (tn - ln_)
                - ts_ * ts_ / tn,
                6,
            ),
            2,
        )
        cand = p.filter(ln_ < tn).select(
            F.col("x").alias("threshold"),
            "ln_",
            "tn",
            F.col("ls").cast("bigint").alias("lsb"),
            F.col("ts_").cast("bigint").alias("tsb"),
            gain.alias("gain"),
        )
        return (
            cand.withColumn(
                "rn",
                F.row_number().over(
                    Window.orderBy(F.desc("gain"), "threshold")
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                "threshold",
                "gain",
                F.col("ln_").cast("bigint").alias("left_n"),
                (F.col("tn") - F.col("ln_")).cast("bigint").alias("right_n"),
                F.expr("CAST(lsb div ln_ AS BIGINT)").alias("left_value"),
                F.expr(
                    "CAST((tsb - lsb) div (tn - ln_) AS BIGINT)"
                ).alias("right_value"),
            )
        )

    b1 = best_split(pts, "q", "y")
    resid = pts.crossJoin(F.broadcast(b1)).select(
        "dpct",
        (
            F.col("y")
            - F.when(
                F.col("q") <= F.col("threshold"), F.col("left_value")
            ).otherwise(F.col("right_value"))
        ).alias("r"),
    )
    b2 = best_split(resid, "dpct", "r")
    out1 = b1.select(
        F.lit(1).alias("boost_round"),
        F.col("threshold").cast("bigint").alias("threshold"),
        "left_n",
        "right_n",
        "left_value",
        "right_value",
        "gain",
    )
    out2 = b2.select(
        F.lit(2).alias("boost_round"),
        F.col("threshold").cast("bigint").alias("threshold"),
        "left_n",
        "right_n",
        "left_value",
        "right_value",
        "gain",
    )
    return out1.unionByName(out2)
