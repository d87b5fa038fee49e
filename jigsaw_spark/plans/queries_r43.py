"""Round-9 batch 3: calendar gap-fill, robust means, and ER blocking
cost analytics.

- ``ts_gap_fill_ffill``: dense daily calendar spine per event type with
  forward-filled values — the "make the series dense before any
  window/forecast touches it" step every time-series pipeline starts
  with (lag-based features silently skip missing days otherwise; cf.
  ts_mase/ts_seasonal_strength which consume day-grain series). Spark
  side is sequence() + the last(ignorenulls) carry; the oracle is a
  DuckDB ASOF join — two independent formulations of the same
  semantics, which is exactly what makes the cross-check strong.
- ``ts_winsorized_mean``: per-type mean after clamping to the exact
  [p5, p95] integer-rule percentiles — the robust-mean staple for
  metric pipelines polluted by outliers; reported next to the raw
  mean so the winsorization effect is visible. All integer: quantile
  boundaries by the rank = 1 + (n-1)*p div 100 rule, means in micro
  units via integer division.
- ``er_blocking_stats``: candidate-pair cost of four blocking
  strategies over the part table (brand, first name token, brand x
  token, size) — n_blocks, max block, and sum c*(c-1)/2 candidate
  pairs per strategy. THE planning query run before any fuzzy-match
  job (er_fuzzy_match's cost model): blocking cost is quadratic in
  block size, and this table is how an engineer picks the key.

Scale notes (100 TB): the spine is bounded by calendar x types (never
by row count) and the fill window partitions by type over day-grain
pre-aggregated rows; winsorized means reuse the full-rank window once
per type and broadcast the 2-row-per-type boundary dim back; blocking
stats is ONE fact scan exploded x4 into (strategy, key) -> two-level
hash-agg — block counts, not pairs, are ever materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ts_gap_fill_ffill
# ---------------------------------------------------------------------------

_GAP_FILL_SQL = """
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT event_type, min(day) AS lo, max(day) AS hi
      FROM daily GROUP BY 1),
    spine AS (
      SELECT event_type, unnest(generate_series(lo, hi)) AS day
      FROM bounds)
    SELECT s.event_type, CAST(s.day AS BIGINT) AS day,
           CAST(d.cents AS BIGINT) AS cents_filled,
           CAST(CASE WHEN d.day = s.day THEN 0 ELSE 1 END AS INT)
             AS was_gap
    FROM spine s ASOF LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day >= d.day
"""


@register(
    "ts_gap_fill_ffill",
    _GAP_FILL_SQL,
    "dense daily calendar spine per event type with forward-filled "
    "day-grain sums — the make-the-series-dense step that must run "
    "before any lag/window/forecast logic (a lag-7 over a sparse "
    "series silently compares non-adjacent days; ts_mase and "
    "ts_seasonal_strength consume exactly this day grain). was_gap "
    "marks carried values. The first spine day always has a value by "
    "construction (the spine starts at each type's min day). EXACT "
    "cross-formulation check: Spark implements the fill as the "
    "last(ignorenulls) running carry, the oracle as a DuckDB ASOF "
    "join to the latest day <= spine day — independent algorithms, "
    "identical semantics. Shape: day-grain pre-agg first (the r8 "
    "pattern), spine bounded by calendar x types never by row count, "
    "one type-partitioned ordered window over day-grain rows",
)
def ts_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.last("cents", ignorenulls=True)
        .over(w)
        .cast("bigint")
        .alias("cents_filled"),
        F.when(F.col("cents").isNull(), 1).otherwise(0).cast("int").alias(
            "was_gap"
        ),
    )


# ---------------------------------------------------------------------------
# ts_winsorized_mean
# ---------------------------------------------------------------------------

_WINSOR_SQL = """
    WITH base AS (
      SELECT event_type, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    ranked AS MATERIALIZED (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
               ORDER BY cents, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM base),
    cuts AS MATERIALIZED (
      SELECT event_type,
             max(CASE WHEN rn = 1 + (n - 1) * 5 // 100 THEN cents END)
               AS lo_cents,
             max(CASE WHEN rn = 1 + (n - 1) * 95 // 100 THEN cents END)
               AS hi_cents
      FROM ranked GROUP BY 1)
    SELECT b.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(any_value(c.lo_cents) AS BIGINT) AS lo_cents,
           CAST(any_value(c.hi_cents) AS BIGINT) AS hi_cents,
           CAST(sum(b.cents) * 1000000 // count(*) AS BIGINT)
             AS raw_mean_micro,
           CAST(sum(least(greatest(b.cents, c.lo_cents), c.hi_cents))
                * 1000000 // count(*) AS BIGINT) AS winsor_mean_micro
    FROM base b JOIN cuts c ON b.event_type = c.event_type
    GROUP BY 1
"""


@register(
    "ts_winsorized_mean",
    _WINSOR_SQL,
    "per-type mean after clamping to the exact [p5, p95] percentiles "
    "(integer lower-quantile rule rank = 1 + (n-1)*p div 100 with the "
    "(cents, event_id) total order), reported next to the raw mean so "
    "the outlier effect is visible — the robust-mean staple for metric "
    "pipelines where a single fat-finger value drags the plain mean "
    "(the trimmed/winsorized family; Hampel flags outliers, this "
    "neutralizes them). All integer: boundaries are exact order "
    "statistics, means in micro units via integer division. Shape: "
    "one full-rank window per type produces BOTH boundaries, the "
    "2-column cut dim joins back on the type key (broadcast-sized: "
    "one row per type), one conditional hash-agg finishes",
)
def ts_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    wr = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    cuts = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == 1 + F.expr("(n - 1) * 5 div 100"),
                F.col("cents"),
            )
        ).alias("lo_cents"),
        F.max(
            F.when(
                F.col("rn") == 1 + F.expr("(n - 1) * 95 div 100"),
                F.col("cents"),
            )
        ).alias("hi_cents"),
    )
    return (
        base.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.first("lo_cents").cast("bigint").alias("lo_cents"),
            F.first("hi_cents").cast("bigint").alias("hi_cents"),
            F.expr(
                "CAST(sum(cents) * 1000000 div count(*) AS BIGINT)"
            ).alias("raw_mean_micro"),
            F.expr(
                "CAST(sum(least(greatest(cents, lo_cents), hi_cents))"
                " * 1000000 div count(*) AS BIGINT)"
            ).alias("winsor_mean_micro"),
        )
    )


# ---------------------------------------------------------------------------
# er_blocking_stats
# ---------------------------------------------------------------------------

_BLOCKING_SQL = """
    WITH keyed AS (
      SELECT s.strategy, s.blk FROM part,
      LATERAL (VALUES
        ('brand', p_brand),
        ('tok1', split_part(p_name, ' ', 1)),
        ('brand_tok1', p_brand || '|' || split_part(p_name, ' ', 1)),
        ('size', CAST(p_size AS VARCHAR))) AS s(strategy, blk)),
    blocks AS (
      SELECT strategy, blk, CAST(count(*) AS BIGINT) AS c
      FROM keyed GROUP BY 1, 2)
    SELECT strategy,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(max(c) AS BIGINT) AS max_block,
           CAST(sum(c * (c - 1) // 2) AS BIGINT) AS candidate_pairs
    FROM blocks GROUP BY 1
"""


@register(
    "er_blocking_stats",
    _BLOCKING_SQL,
    "candidate-pair cost of four blocking strategies over part "
    "(brand, first name token, brand x token, size): blocks, largest "
    "block, and sum c*(c-1)/2 candidate pairs per strategy — THE "
    "planning query run before any fuzzy-match job (er_fuzzy_match's "
    "cost model). Blocking cost is quadratic in block size; this "
    "table is how the blocking key gets picked, and at 100 TB it is "
    "the difference between a tractable ER job and an all-pairs "
    "explosion. Shape: one fact scan exploded x4 into (strategy, "
    "key) rows -> two-level hash-agg; only block COUNTS are ever "
    "materialized, never the pairs themselves",
)
def er_blocking_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    keyed = part.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("brand").alias("strategy"),
                    F.col("p_brand").alias("blk"),
                ),
                F.struct(
                    F.lit("tok1").alias("strategy"),
                    F.expr("split_part(p_name, ' ', 1)").alias("blk"),
                ),
                F.struct(
                    F.lit("brand_tok1").alias("strategy"),
                    F.concat(
                        F.col("p_brand"),
                        F.lit("|"),
                        F.expr("split_part(p_name, ' ', 1)"),
                    ).alias("blk"),
                ),
                F.struct(
                    F.lit("size").alias("strategy"),
                    F.col("p_size").cast("string").alias("blk"),
                ),
            )
        ).alias("s")
    ).select("s.strategy", "s.blk")
    blocks = keyed.groupBy("strategy", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return blocks.groupBy("strategy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.max("c").cast("bigint").alias("max_block"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("bigint").alias(
            "candidate_pairs"
        ),
    )
