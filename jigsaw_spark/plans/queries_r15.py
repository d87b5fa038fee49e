"""Round-5 batch 9: classic relational/reporting primitives the wide
surface still lacked —

- ``rel_gaps_islands``: gaps-and-islands — maximal runs of consecutive
  active days per user via the day - dense_rank constant-difference
  trick; the activity-streak / missing-range detector.
- ``agg_mode_exact``: exact per-group mode with a deterministic
  smallest-value tie-break (count desc, value asc) — the categorical
  summary statistic beside the percentile family.
- ``w12_running_distinct``: cumulative distinct users per day per
  event type — the classic "running distinct is not a window
  function" pattern: first-occurrence flags from one (type, user)
  min-day agg, then a prefix sum over the day dim.
- ``ml_target_encode_loo``: leave-one-out target encoding with
  additive smoothing — the category feature encoder every tabular
  model uses, in EXACT integer micro-units so no fold leaks float
  noise: enc_i = ((sum_c - y_i)*1e6 + m*prior_micro) / (n_c - 1 + m).
- ``ts_wow_growth``: week-over-week growth in integer basis points
  (truncated division, the tdiv discipline) — the reporting staple.

Float discipline: NO doubles in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# rel_gaps_islands
# ---------------------------------------------------------------------------

_ISLANDS_SQL = """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id
      FROM events),
    grp AS (
      SELECT user_id, day_id,
             day_id - dense_rank() OVER (PARTITION BY user_id
                                         ORDER BY day_id) AS island_key
      FROM days)
    SELECT user_id,
           CAST(min(day_id) AS BIGINT) AS start_day,
           CAST(max(day_id) AS BIGINT) AS end_day,
           CAST(count(*) AS BIGINT) AS n_days
    FROM grp GROUP BY user_id, island_key
"""


@register(
    "rel_gaps_islands",
    _ISLANDS_SQL,
    "gaps-and-islands: maximal runs of CONSECUTIVE active days per "
    "user via the classic day - dense_rank constant-difference trick "
    "(consecutive days share the difference, a gap breaks it) — the "
    "activity-streak / missing-range detector. Shape: one distinct to "
    "the (user, day) dim, one user-partitioned rank window, one hash "
    "agg on the derived island key; the fact table is scanned once "
    "and every window partitions by user",
)
def rel_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        ),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_id")
    grp = days.withColumn(
        "island_key", F.col("day_id") - F.dense_rank().over(w)
    )
    return grp.groupBy("user_id", "island_key").agg(
        F.min("day_id").cast("bigint").alias("start_day"),
        F.max("day_id").cast("bigint").alias("end_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    ).drop("island_key")


# ---------------------------------------------------------------------------
# agg_mode_exact
# ---------------------------------------------------------------------------

_MODE_SQL = """
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             count(*) AS n
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT event_type, cents, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, cents) AS rn
      FROM c)
    SELECT event_type,
           CAST(cents AS BIGINT) AS mode_cents,
           CAST(n AS BIGINT) AS n_occurrences
    FROM r WHERE rn = 1
"""


@register(
    "agg_mode_exact",
    _MODE_SQL,
    "exact per-group mode of value-cents with the deterministic "
    "(count desc, value asc) tie-break — the categorical summary "
    "statistic the percentile family doesn't cover; Spark has no "
    "mode() aggregate for this tie discipline, so it is the count-agg "
    "+ rank-window composition. One hash agg to the distinct-value "
    "dim, one partitioned rank window over it",
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("n"))
    r = c.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("n"), "cents")
        ),
    )
    return r.filter(F.col("rn") == 1).select(
        "event_type",
        F.col("cents").cast("bigint").alias("mode_cents"),
        F.col("n").cast("bigint").alias("n_occurrences"),
    )


# ---------------------------------------------------------------------------
# w12_running_distinct
# ---------------------------------------------------------------------------

_RD_SQL = """
    WITH firsts AS (
      SELECT event_type, user_id,
             min(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS first_day
      FROM events GROUP BY 1, 2),
    daily AS (
      SELECT event_type, first_day AS day_id, count(*) AS new_users
      FROM firsts GROUP BY 1, 2)
    SELECT event_type, CAST(day_id AS BIGINT) AS day_id,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (PARTITION BY event_type
                                     ORDER BY day_id) AS BIGINT)
             AS cum_distinct_users
    FROM daily
"""


@register(
    "w12_running_distinct",
    _RD_SQL,
    "cumulative distinct users per day per event type — the classic "
    "'running COUNT(DISTINCT) is not a window function' pattern: one "
    "(type, user) min-day agg marks each user's first appearance, a "
    "day-dim agg counts arrivals, and a partitioned prefix sum "
    "accumulates them. Exactly the audience-growth curve; all work "
    "after the first agg is dim-sized and every window partitions by "
    "type",
)
def w12_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("event_type", "user_id").agg(
        F.min(
            (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint")
        ).alias("first_day")
    )
    daily = firsts.groupBy(
        "event_type", F.col("first_day").alias("day_id")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_id")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "event_type",
        F.col("day_id").cast("bigint").alias("day_id"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias(
            "cum_distinct_users"
        ),
    )


# ---------------------------------------------------------------------------
# ml_target_encode_loo
# ---------------------------------------------------------------------------

_TE_M = 10  # additive-smoothing pseudo-count

_TE_SQL = f"""
    WITH pts AS (
      SELECT p_partkey, p_brand AS cat,
             CASE WHEN p_retailprice > 1500 THEN 1 ELSE 0 END AS y
      FROM part),
    g AS (SELECT cat, count(*) AS nc, sum(y) AS sc FROM pts GROUP BY cat),
    pri AS (
      SELECT CAST(sum(y) AS BIGINT) * 1000000 // count(*) AS prior_micro
      FROM pts)
    SELECT p.p_partkey, p.cat, CAST(p.y AS INT) AS y,
           CAST(((g.sc - p.y) * 1000000 + {_TE_M} * pri.prior_micro)
                // (g.nc - 1 + {_TE_M}) AS BIGINT) AS enc_micro
    FROM pts p
    JOIN g ON p.cat = g.cat
    CROSS JOIN pri
"""


@register(
    "ml_target_encode_loo",
    _TE_SQL,
    "leave-one-out target encoding with additive smoothing (m=10) of "
    "the brand category against the price>1500 label — the "
    "tabular-ML category encoder, LOO so a row never sees its own "
    "label (the leakage guard) and smoothed toward the global prior "
    "for rare categories. EXACT integer micro-units throughout "
    "(numerators are non-negative so floor division is engine-"
    "stable). Shape: one category agg broadcast back + a 1-row prior "
    "scalar — one fact scan, map-only encode",
)
def ml_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    pts = part.select(
        "p_partkey",
        F.col("p_brand").alias("cat"),
        F.when(F.col("p_retailprice") > 1500, 1).otherwise(0).alias("y"),
    )
    g = pts.groupBy("cat").agg(
        F.count(F.lit(1)).alias("nc"), F.sum("y").alias("sc")
    )
    pri = pts.agg(
        F.expr(
            "CAST(sum(y) AS BIGINT) * 1000000 div count(*)"
        ).alias("prior_micro")
    )
    return (
        pts.join(F.broadcast(g), "cat")
        .crossJoin(F.broadcast(pri))
        .select(
            "p_partkey",
            "cat",
            F.col("y").cast("int").alias("y"),
            F.expr(
                f"CAST(((sc - y) * 1000000 + {_TE_M} * prior_micro)"
                f" div (nc - 1 + {_TE_M}) AS BIGINT)"
            ).alias("enc_micro"),
        )
    )


# ---------------------------------------------------------------------------
# ts_wow_growth
# ---------------------------------------------------------------------------

_TDIV = "CASE WHEN {x} >= 0 THEN {x} // {d} ELSE -((-({x})) // {d}) END"

_WOW_SQL = f"""
    WITH weekly AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week_id,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, week_id, cents,
             lag(cents) OVER (PARTITION BY event_type
                              ORDER BY week_id) AS prev_cents
      FROM weekly)
    SELECT event_type, CAST(week_id AS BIGINT) AS week_id,
           CAST(cents AS BIGINT) AS cents,
           CAST(prev_cents AS BIGINT) AS prev_cents,
           CAST({_TDIV.format(x='(cents - prev_cents) * 10000',
                              d='prev_cents')} AS BIGINT) AS growth_bp
    FROM lagged WHERE prev_cents IS NOT NULL AND prev_cents > 0
"""


@register(
    "ts_wow_growth",
    _WOW_SQL,
    "week-over-week revenue growth per event type in EXACT integer "
    "basis points — (cur-prev)*10000 tdiv prev, truncated toward zero "
    "on both engines (Spark div and duckdb 1.0 // both truncate; the "
    "oracle keeps the explicit CASE form for version robustness) — the "
    "reporting staple. One calendar agg, one partitioned lag window "
    "over the week dim; zero/missing base weeks are excluded",
)
def ts_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(604800000000)).cast("bigint").alias(
            "week_id"
        ),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("week_id")
    lagged = weekly.withColumn("prev_cents", F.lag("cents").over(w))
    return lagged.filter(
        F.col("prev_cents").isNotNull() & (F.col("prev_cents") > 0)
    ).select(
        "event_type",
        F.col("week_id").cast("bigint").alias("week_id"),
        F.col("cents").cast("bigint").alias("cents"),
        F.col("prev_cents").cast("bigint").alias("prev_cents"),
        F.expr(
            "CAST(((cents - prev_cents) * 10000) div prev_cents AS BIGINT)"
        ).alias("growth_bp"),
    )
