"""Round-8 batch 4: point-in-time feature engineering, sliding-window
distinct actives, and feature-hash collision accounting —

- ``ml_lag_features``: leakage-free trailing features per event — the
  user's purchase count/sum over the 7 days STRICTLY BEFORE the event
  and their lifetime event count to date — the point-in-time-correct
  feature join every training-set builder needs (features computed
  with a frame that can see the label row leak the future; the
  RANGE (-7d, -1us) frame cannot, even for same-timestamp siblings).
- ``rel_wau_sliding``: weekly-active-users for every anchor day
  (distinct users active in [day-6, day]) plus that day's DAU and the
  DAU/WAU stickiness ratio — the sliding-window DISTINCT aggregate,
  which unlike sums does NOT decompose into a running frame; computed
  exactly via the bounded explode (each active (user, day) contributes
  to 7 anchors) + one distinct hash-agg.
- ``ml_hash_collisions``: collision accounting for the feature-hashing
  trick at 2^8 / 2^12 / 2^16 buckets — distinct vocabulary terms vs
  occupied hash buckets and the collision rate, the capacity check run
  before shipping ml_hash_features' unbounded-categorical path.

Scale notes (100 TB): lag features are user-partitioned RANGE windows
(parallel across users; per-user history is the frame); WAU explodes
each (user, day) x7 — constant fan-out, then ONE map-side-combinable
distinct agg, never a per-anchor scan; hash collisions reduce the
corpus to its vocabulary once, then three bucket aggs.

Float discipline: everything is exact integers (ratios in floor-div
micro-units).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

_WEEK_US = 7 * 86_400_000_000

# ---------------------------------------------------------------------------
# ml_lag_features
# ---------------------------------------------------------------------------

_LAG_SQL = f"""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) AS us,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    feat AS (
      SELECT event_id, user_id,
             coalesce(sum(CASE WHEN event_type = 'purchase'
                          THEN 1 ELSE 0 END) OVER w7, 0) AS n_purch_7d,
             coalesce(sum(CASE WHEN event_type = 'purchase'
                          THEN cents ELSE 0 END) OVER w7, 0)
               AS sum_purch_cents_7d,
             coalesce(count(*) OVER wtd, 0) AS n_events_before
      FROM e
      WINDOW
        w7 AS (PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {_WEEK_US} PRECEDING AND 1 PRECEDING),
        wtd AS (PARTITION BY user_id ORDER BY us
                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(n_purch_7d AS BIGINT) AS n_purch_7d,
           CAST(sum_purch_cents_7d AS BIGINT) AS sum_purch_cents_7d,
           CAST(n_events_before AS BIGINT) AS n_events_before
    FROM feat WHERE event_id % 50 = 0
"""


@register(
    "ml_lag_features",
    _LAG_SQL,
    "leakage-free trailing features: for each event, the SAME user's "
    "purchase count and cents over the 7 days strictly before it, "
    "plus lifetime events to date — the point-in-time-correct feature "
    "join every training-set builder needs. The RANGE (-7d, -1us) "
    "frame excludes the current microsecond entirely, so even "
    "same-timestamp sibling events cannot leak into each other's "
    "features (a ROWS frame or a <=-bounded RANGE both would). "
    "Emitted for the 2%-sampled event keyspace; all exact integers. "
    "Shape: ONE user-partitioned window pass over the events scan — "
    "parallel across users, per-user history is the frame; at 100 TB "
    "this is the canonical sorted-within-partition sweep",
)
def ml_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w7 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-_WEEK_US, -1)
    )
    wtd = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    is_p = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    feat = ev.select(
        "event_id",
        "user_id",
        F.coalesce(F.sum(is_p).over(w7), F.lit(0)).alias("n_purch_7d"),
        F.coalesce(
            F.sum(is_p * F.col("cents")).over(w7), F.lit(0)
        ).alias("sum_purch_cents_7d"),
        F.coalesce(F.count(F.lit(1)).over(wtd), F.lit(0)).alias(
            "n_events_before"
        ),
    )
    return feat.filter(F.col("event_id") % 50 == 0).select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("n_purch_7d").cast("bigint").alias("n_purch_7d"),
        F.col("sum_purch_cents_7d")
        .cast("bigint")
        .alias("sum_purch_cents_7d"),
        F.col("n_events_before").cast("bigint").alias("n_events_before"),
    )


# ---------------------------------------------------------------------------
# rel_wau_sliding
# ---------------------------------------------------------------------------

_WAU_SQL = """
    WITH active AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events),
    span AS MATERIALIZED (
      SELECT min(day) AS lo, max(day) AS hi FROM active),
    contrib AS (
      SELECT DISTINCT a.user_id, a.day + t.i AS anchor
      FROM active a, range(7) t(i)
      WHERE a.day + t.i <= (SELECT hi FROM span)),
    wau AS (
      SELECT anchor, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM contrib GROUP BY 1),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY 1)
    SELECT CAST(w.anchor AS BIGINT) AS day,
           coalesce(d.dau, 0) AS dau,
           w.wau,
           CAST(coalesce(d.dau, 0) * 1000000 // w.wau AS BIGINT)
             AS stickiness_micro
    FROM wau w LEFT JOIN dau d ON w.anchor = d.day
"""


@register(
    "rel_wau_sliding",
    _WAU_SQL,
    "weekly-active-users per anchor day (distinct users active in "
    "[day-6, day]) + that day's DAU + the DAU/WAU stickiness ratio in "
    "exact micro-units — the sliding-window DISTINCT aggregate. "
    "Distinct does NOT decompose into a running frame (you cannot "
    "subtract a departing day's users without knowing they are absent "
    "elsewhere in the window), so the exact form is the BOUNDED "
    "EXPLODE: each active (user, day) row contributes to exactly 7 "
    "anchors, then ONE distinct hash-agg — constant fan-out, "
    "map-side-combinable, no per-anchor rescans. Anchors past the "
    "data horizon are dropped (their windows would be truncated). "
    "The engagement curve every growth dashboard leads with",
)
def rel_wau_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    active = (
        ev.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    span = active.agg(F.max("day").alias("hi"))
    contrib = (
        active.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + 6)
            ).alias("anchor"),
        )
        .crossJoin(F.broadcast(span))
        .filter(F.col("anchor") <= F.col("hi"))
        .select("user_id", "anchor")
        .distinct()
    )
    wau = contrib.groupBy("anchor").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    dau = active.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    return (
        wau.join(dau, wau["anchor"] == dau["day"], "left")
        .select(
            wau["anchor"].cast("bigint").alias("day"),
            F.coalesce(dau["dau"], F.lit(0).cast("bigint")).alias("dau"),
            "wau",
            F.expr(
                "CAST(coalesce(dau, 0) * 1000000 div wau AS BIGINT)"
            ).alias("stickiness_micro"),
        )
    )


# ---------------------------------------------------------------------------
# ml_hash_collisions
# ---------------------------------------------------------------------------


def _hash_coll_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH vocab AS MATERIALIZED (
      SELECT DISTINCT unnest({tokens_sql('text')}) AS term
      FROM documents),
    hashed AS (
      -- UBIGINT -> BIGINT immediately (48 bits fit; signed arithmetic
      -- only from here, avoiding DuckDB's unsigned-op traps)
      SELECT term,
             CAST(CAST(('0x' || substr(md5('feat|' || term), 1, 12))
                  AS UBIGINT) AS BIGINT) AS h
      FROM vocab),
    ks AS (SELECT unnest([8, 12, 16]) AS k),
    b AS (
      SELECT ks.k, h % (1 << ks.k) AS bucket
      FROM hashed, ks)
    SELECT CAST(k AS INT) AS k,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets_used,
           CAST((count(*) - count(DISTINCT bucket)) * 1000000
                // count(*) AS BIGINT) AS collision_rate_micro
    FROM b GROUP BY k
"""


@register(
    "ml_hash_collisions",
    _hash_coll_sql(),
    "feature-hashing capacity check: the document vocabulary hashed "
    "into 2^8 / 2^12 / 2^16 buckets (md5 stream, seed 'feat') — "
    "distinct terms vs occupied buckets and the collision rate in "
    "exact micro-units. Run before trusting ml_hash_features' "
    "unbounded-categorical path: a collision rate that climbs past a "
    "few percent at the chosen width silently merges features. "
    "Shape: corpus reduces to its vocabulary ONCE (explode + distinct "
    "hash-agg); the three bucket widths explode the KB-scale vocab "
    "x3, then one agg. Exact integers throughout (the 48-bit md5 "
    "slice fits bigint after the power-of-two mod)",
)
def ml_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokens_expr("text")).alias("term"))
        .distinct()
    )
    hashed = vocab.select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("feat|"), F.col("term"))), 1, 12
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h")
    )
    ks = spark.createDataFrame([(8,), (12,), (16,)], "k int")
    b = hashed.crossJoin(F.broadcast(ks)).select(
        "k", F.expr("pmod(h, CAST(shiftleft(1, k) AS BIGINT))").alias("bucket")
    )
    return b.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.countDistinct("bucket").cast("bigint").alias("n_buckets_used"),
        F.expr(
            "CAST((count(1) - count(DISTINCT bucket)) * 1000000"
            " div count(1) AS BIGINT)"
        ).alias("collision_rate_micro"),
    ).select(
        F.col("k").cast("int").alias("k"),
        "n_terms",
        "n_buckets_used",
        "collision_rate_micro",
    )