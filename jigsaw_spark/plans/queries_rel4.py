"""Fourth batch: event-funnel and cohort-retention analytics — the two
canonical event-table rollups a training-data/telemetry pipeline runs at
100 TB. Both are pure DataFrame compositions with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register


# ---------------------------------------------------------------------------
# Funnel: view → click → purchase ordered-step conversion, as chained
# conditional mins: first view, first click after that view, first purchase
# after that click. Every grouped pass keys on user_id, so the fact table
# is shuffled once and the re-aggregations reuse the exchange.
# ---------------------------------------------------------------------------


_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY user_id
), with_click AS (
  SELECT e.user_id, p.t_view,
         min(CASE WHEN e.event_type = 'click' AND e.ts > p.t_view
                   AND e.ts <= p.t_view + INTERVAL 24 HOUR
                  THEN e.ts END) AS t_click
  FROM events e JOIN per_user p ON e.user_id = p.user_id
  GROUP BY e.user_id, p.t_view
), with_buy AS (
  SELECT c.user_id, c.t_view, c.t_click,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t_click
                   AND e.ts <= c.t_click + INTERVAL 72 HOUR
                  THEN e.ts END) AS t_buy
  FROM events e JOIN with_click c ON e.user_id = c.user_id
  GROUP BY c.user_id, c.t_view, c.t_click
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN t_view  IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS step_view,
       CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS step_click,
       CAST(sum(CASE WHEN t_buy   IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS step_purchase
FROM with_buy
"""


@register(
    "ts_funnel_steps",
    _FUNNEL_SQL,
    "ordered funnel view→click→purchase: chained conditional mins per user",
)
def ts_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    # every re-aggregation groups on user_id: AQE reuses the exchange, so
    # the chain costs one real shuffle of the fact table, not three.
    with_click = (
        events.join(per_user, "user_id")
        .groupBy("user_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view"))
                    & (F.col("ts") <= F.col("t_view") + F.expr("interval 24 hours")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    with_buy = (
        events.join(with_click, "user_id")
        .groupBy("user_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click"))
                    & (F.col("ts") <= F.col("t_click") + F.expr("interval 72 hours")),
                    F.col("ts"),
                )
            ).alias("t_buy")
        )
    )
    return with_buy.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("step_view"),
        F.sum(F.when(F.col("t_click").isNotNull(), 1).otherwise(0)).alias(
            "step_click"
        ),
        F.sum(F.when(F.col("t_buy").isNotNull(), 1).otherwise(0)).alias(
            "step_purchase"
        ),
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-active day, counted per day
# offset. Two aggregates over the same user_id shuffle key (first-day, then
# join back) — the join is on user_id so it rides the same exchange; the
# final (cohort, offset) agg is tiny (days × days).
# ---------------------------------------------------------------------------


@register(
    "ts_cohort_retention",
    """
    WITH firstday AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firstday f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
    "cohort retention: first-day cohorts × day offsets × distinct actives",
)
def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events").select("user_id", "ts")
    firstday = events.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    return (
        events.join(firstday, "user_id")
        .select(
            # ISO string, not DATE — pandas dtype parity (r4 sweep find)
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff(F.to_date(F.col("ts")), F.col("cohort_day")).alias(
                "day_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Corpus bigram frequencies: tokens → word-2-grams (shingles) → explode →
# count. The explode is a narrow op; the only shuffle is the count agg, and
# the HAVING threshold prunes the long tail before any result materializes.
# ---------------------------------------------------------------------------

from jigsaw_spark.operators.text import shingles_expr, shingles_sql, tokens_expr, tokens_sql  # noqa: E402


@register(
    "text_bigrams",
    f"""
    WITH toks AS (
      SELECT {tokens_sql('text')} AS t FROM documents
    ), pairs AS (
      SELECT unnest({shingles_sql('t', 2)}) AS bigram
      FROM toks WHERE len(t) >= 2
    )
    SELECT bigram, count(*) AS n
    FROM pairs GROUP BY bigram HAVING count(*) >= 20
    """,
    "corpus word-bigram frequencies over the shared shingle kernel",
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(tokens_expr("text").alias("t")).filter(F.size("t") >= 2)
    return (
        toks.select(F.explode(shingles_expr("t", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )
