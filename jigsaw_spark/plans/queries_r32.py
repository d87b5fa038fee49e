"""Round-8 batch 5: clamped running balances, streaming sliding
distinct actives, and the explicit salted skew join —

- ``rel_clamped_balance``: per-user wallet balance that CLAMPS AT ZERO
  (credits from purchases, debits from errors, never negative) — the
  inventory/wallet scan that looks sequential (c_t = max(c_{t-1} +
  x_t, 0)) but has the exact closed form c_t = prefix_t - min(0,
  running_min(prefix)), so it runs as TWO user-partitioned window
  passes instead of a per-key Python loop. All integer cents.
- ``stream_sliding_wau``: weekly-active-users over 7-day/1-day-slide
  event-time windows computed on a STREAM — distinct aggregation is
  unsupported in streaming, so the exact form is
  dropDuplicates((window, user)) state + a count per window (the
  stream_dedup idiom applied to sliding windows), drained with
  AvailableNow; equals ``rel_wau_sliding``'s batch answer on the
  static directory.
- ``j14_salted_join``: the explicit salted skew join as a registered
  query — a 70%-hot join key spread across 16 salts (right side
  replicated, left salted with xxhash64), results bit-identical to
  the plain equi-join, which IS the oracle. The shape AQE cannot
  rewrite (post-UDF cardinality, stateful downstream); the query-level
  proof of operators/skew.salted_join.

Scale notes (100 TB): clamped balance is two window passes over the
same user-partitioned sort (one exchange, one sort — Spark reuses the
partitioning for both frames); streaming WAU state is (window x user)
keyed and watermark-bounded; the salted join's hot key spreads over 16
reducers by construction.

Float discipline: all exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# rel_clamped_balance
# ---------------------------------------------------------------------------

_CLAMP_SQL = """
    WITH tx AS (
      SELECT user_id,
             epoch_us(ts) // 86400000000 AS day,
             sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100, 0) AS BIGINT)
                      WHEN event_type = 'error'
                      THEN -CAST(round(value * 100, 0) AS BIGINT)
                      ELSE 0 END) AS amount
      FROM events GROUP BY 1, 2),
    pre AS (
      SELECT user_id, day, amount,
             sum(amount) OVER (PARTITION BY user_id ORDER BY day)
               AS prefix
      FROM tx),
    mins AS (
      SELECT user_id, day, amount, prefix,
             min(prefix) OVER (PARTITION BY user_id ORDER BY day)
               AS run_min
      FROM pre),
    bal AS (
      SELECT user_id, day, amount, prefix,
             prefix - least(0, run_min) AS balance
      FROM mins)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(day AS BIGINT) AS day,
           CAST(amount AS BIGINT) AS amount_cents,
           CAST(balance AS BIGINT) AS balance_cents
    FROM bal WHERE user_id % 10 = 0
"""


@register(
    "rel_clamped_balance",
    _CLAMP_SQL,
    "clamped-at-zero running balance per user (credits = purchase "
    "cents, debits = error cents): the wallet/inventory scan that "
    "looks inherently sequential — c_t = max(c_{t-1} + x_t, 0) — but "
    "has the exact closed form c_t = prefix_t - min(0, "
    "running_min(prefix_t)) (forgiven losses are exactly the depth of "
    "the lowest excursion below zero so far), so it runs as TWO "
    "ordinary window passes over ONE user-partitioned sort instead of "
    "a per-key Python fold. Emitted for the 10%-sampled user "
    "keyspace; exact integer cents throughout. Shape: one day-grain "
    "hash-agg, then prefix-sum + running-min-of-prefix windows "
    "sharing the same partitioning (one exchange, one sort)",
)
def rel_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    amount = (
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100, 0).cast("bigint"),
        )
        .when(
            F.col("event_type") == "error",
            -F.round(F.col("value") * 100, 0).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
    )
    tx = ev.groupBy(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.sum(amount).alias("amount"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = tx.select(
        "user_id",
        "day",
        "amount",
        F.sum("amount").over(w).alias("prefix"),
    ).withColumn("run_min", F.min("prefix").over(w))
    return (
        pre.filter(F.col("user_id") % 10 == 0)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("day").cast("bigint").alias("day"),
            F.col("amount").cast("bigint").alias("amount_cents"),
            (
                F.col("prefix") - F.least(F.lit(0), F.col("run_min"))
            )
            .cast("bigint")
            .alias("balance_cents"),
        )
    )


# ---------------------------------------------------------------------------
# stream_sliding_wau
# ---------------------------------------------------------------------------

_SWAU_SQL = """
    WITH active AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS day
      FROM events),
    span AS MATERIALIZED (SELECT max(day) AS hi FROM active),
    contrib AS (
      SELECT DISTINCT a.user_id, a.day + t.i AS anchor
      FROM active a, range(7) t(i)
      WHERE a.day + t.i <= (SELECT hi FROM span))
    SELECT CAST(anchor AS BIGINT) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS wau
    FROM contrib GROUP BY 1
"""


@register(
    "stream_sliding_wau",
    _SWAU_SQL,
    "weekly-active-users on a STREAM: 7-day windows sliding by 1 day "
    "over event time, exact distinct users per window — streaming "
    "forbids count(DISTINCT), so the exact form is dropDuplicates on "
    "(window, user_id) with a watermark (bounded state: one key per "
    "active user per overlapping window) followed by a plain count, "
    "the stream_dedup idiom applied to sliding windows; drained with "
    "AvailableNow over the static directory it equals the batch "
    "rel_wau_sliding answer (window [s, s+7) = anchor day s+6; "
    "anchors past the data horizon dropped to match the batch "
    "truncation rule). The engagement curve, maintained incrementally",
)
def stream_sliding_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from jigsaw_spark.plans.queries_streaming import _state_partitions
    from jigsaw_spark.streaming.ingest import read_event_stream

    stream = read_event_stream(spark, sf_dir, glob="events.parquet")
    win = stream.withWatermark("ts", "14 days").select(
        F.window("ts", "7 days", "1 day").alias("w"), "user_id"
    )
    distinct = win.dropDuplicates(["w", "user_id"])
    agg = distinct.groupBy("w").agg(F.count(F.lit(1)).alias("wau"))
    name = f"stream_swau_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name).select(
        # window [s, s+7) covers days s..s+6 -> anchor day = s+6
        (
            F.expr("unix_micros(w.start) div 86400000000") + F.lit(6)
        ).alias("day"),
        "wau",
    )
    hi = _t(spark, sf_dir, "events").agg(
        F.expr("max(unix_micros(ts) div 86400000000)").alias("hi")
    )
    return (
        out.crossJoin(F.broadcast(hi))
        .filter(F.col("day") <= F.col("hi"))
        .select(
            F.col("day").cast("bigint").alias("day"),
            F.col("wau").cast("bigint").alias("wau"),
        )
    )


# ---------------------------------------------------------------------------
# j14_salted_join
# ---------------------------------------------------------------------------

_SALTED_SQL = """
    WITH f AS (
      SELECT CASE WHEN user_id % 10 < 7 THEN 0
                  ELSE user_id % 10 END AS k,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    d AS (
      SELECT i AS k, 'seg_' || i AS label FROM range(10) t(i))
    SELECT d.label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(f.cents) AS BIGINT) AS cents
    FROM f JOIN d ON f.k = d.k
    GROUP BY d.label
"""


@register(
    "j14_salted_join",
    _SALTED_SQL,
    "explicit salted skew join as a registered query: a synthetic "
    "70%-hot join key (user_id buckets 0-6 collapse onto key 0) joins "
    "a 10-row dimension through operators/skew.salted_join — right "
    "side replicated x16 salts, left salted with xxhash64, SHUFFLE_HASH "
    "hinted so the skew-spread exchange actually materializes (an "
    "auto-broadcast would hide it at this scale while production dims "
    "above the threshold cannot broadcast). Results are bit-identical "
    "to the plain equi-join — which IS the oracle. The shape AQE's "
    "skew split cannot rewrite: a hot key feeding a downstream "
    "stateful op, or post-UDF cardinality the planner cannot see",
)
def j14_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    f = ev.select(
        F.expr(
            "CASE WHEN user_id % 10 < 7 THEN CAST(0 AS BIGINT)"
            " ELSE user_id % 10 END"
        ).alias("k"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    d = spark.range(10).select(
        F.col("id").alias("k"),
        F.concat(F.lit("seg_"), F.col("id").cast("string")).alias("label"),
    )
    joined = salted_join(f, d.hint("shuffle_hash"), on="k", num_salts=16)
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
