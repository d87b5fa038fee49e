"""Third relational batch: pushdown-only aggregate (Q6 shape), conditional
aggregation over a join (Q12 shape), outer-join distribution (Q13), promo
ratio (Q14), disjunctive-predicate join (Q19), time-spine gap filling,
lag-based inter-event deltas, and the max_by/min_by aggregate surface.

All SQL-expressible → exact DuckDB oracles. Scale notes inline per query;
reference parity: these generalize the relational surface SURVEY.md §2.3-2.4
says the engine must expose beyond jigsaw's own J1-J4/A1-A7 set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _REV_SQL, _t, dec2, dsum, register, rev_col


# ---------------------------------------------------------------------------
# Q6 shape: filter + single-row aggregate. The whole query is one parquet
# scan with every predicate pushed (PushedFilters in PLANS.md) — at 100 TB
# this is the query whose cost is pure I/O, so pushdown is the entire game.
# ---------------------------------------------------------------------------


@register(
    "q6_filter_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_discount AS DECIMAL(3,2))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6 shape: all-pushdown filter + single-row aggregate",
)
def q6_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(
                dec2("l_extendedprice", 12)
                * F.col("l_discount").cast("decimal(3,2)")
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 shape: fact⋈fact join + conditional (CASE) aggregation. orders⋈lineitem
# shuffles on orderkey once; the CASE branches ride the same hash aggregate —
# no second pass per condition.
# ---------------------------------------------------------------------------


@register(
    "q12_priority_lines",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
    "TPC-H Q12 shape: join + CASE conditional aggregation in one hash agg",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 shape: outer-join distribution. Implemented agg-before-join: orders
# collapse to ≤|customer| rows FIRST (one shuffle), then the left join keeps
# zero-order customers via coalesce(n, 0). Joining raw orders to customer and
# aggregating after would shuffle the fact table twice as many rows.
# ---------------------------------------------------------------------------


@register(
    "q13_custdist",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    "TPC-H Q13 shape: left-outer join + two-level count distribution",
)
def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    counts = customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q14 shape: broadcast dim join + conditional-sum ratio. part is the dim →
# broadcast; the month filter pushes into the lineitem scan; output is one
# row, so the final agg is a cheap global reduce.
# ---------------------------------------------------------------------------


@register(
    "q14_promo_ratio",
    """
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01'
      AND l_shipdate <  TIMESTAMP '1996-07-01'
    """,
    "TPC-H Q14 shape: broadcast part join + conditional-sum ratio",
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive (OR-of-ANDs) predicate across a join. The common
# l_partkey = p_partkey conjunct is the join key; the disjunction stays a
# residual filter on the broadcast-joined rows — Catalyst extracts the common
# equi-condition instead of falling back to a nested-loop join.
# ---------------------------------------------------------------------------


@register(
    "q19_disjunctive_join",
    f"""
    SELECT CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    "TPC-H Q19 shape: equi-join + disjunctive residual predicate",
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    qty = F.col("l_quantity")
    branch = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= size_hi)
        & (qty >= q_lo)
        & (qty <= q_hi)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(
            branch("Brand#12", 15, 1, 11)
            | branch("Brand#23", 20, 10, 20)
            | branch("Brand#34", 25, 20, 30)
        )
        .agg(
            dsum(rev_col()).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Time-spine gap filling (resample): hourly counts per event type with
# explicit zero rows for silent hours. The spine is sequence() over the
# 1-row min/max aggregate — generated distributively, never collect()ed to
# the driver — cross-joined with the (tiny) distinct type dim, then a LEFT
# join against the real hourly counts. At 100 TB the only meaningful shuffle
# is the hourly count aggregate; the spine side is rows = hours × types.
# ---------------------------------------------------------------------------


@register(
    "ts_gap_fill",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS tmin,
             date_trunc('hour', max(ts)) AS tmax
      FROM events
    ), spine AS (
      SELECT unnest(generate_series(tmin, tmax, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, s.hour, coalesce(h.n, 0) AS n
    FROM spine s
    CROSS JOIN types t
    LEFT JOIN hourly h ON h.event_type = t.event_type AND h.hour = s.hour
    """,
    "time-spine resample: zero-filled hourly counts per event type",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("tmin"),
        F.date_trunc("hour", F.max("ts")).alias("tmax"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("tmin"), F.col("tmax"), F.expr("interval 1 hour"))
        ).alias("hour")
    )
    types = events.select("event_type").distinct()
    hourly = (
        events.select(F.col("event_type").alias("h_type"), hour.alias("h_hour"))
        .groupBy("h_type", "h_hour")
        .agg(F.count(F.lit(1)).alias("h_n"))
    )
    return (
        spine.crossJoin(F.broadcast(types))
        .join(
            hourly,
            (F.col("h_type") == F.col("event_type"))
            & (F.col("h_hour") == F.col("hour")),
            "left",
        )
        .select(
            "event_type", "hour", F.coalesce(F.col("h_n"), F.lit(0)).alias("n")
        )
    )


# ---------------------------------------------------------------------------
# Inter-event deltas (lag): time since the previous event per user, averaged
# per event type. One shuffle (partition by user for the window), then a
# small re-agg; the (ts, event_id) tiebreaker makes the order total so the
# lag is deterministic under ties.
# ---------------------------------------------------------------------------


@register(
    "ts_deltas",
    """
    SELECT event_type,
           count(gap_us) AS n_gaps,
           round(CAST(sum(gap_us) AS DOUBLE) / count(gap_us) / 1000000.0, 3) AS avg_gap_s
    FROM (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    "lag-based inter-event gaps per user, averaged per event type",
)
def ts_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gapped = events.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gapped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.sum("gap_us").cast("double") / F.count("gap_us") / 1000000.0, 3
        ).alias("avg_gap_s"),
    )


# ---------------------------------------------------------------------------
# max_by / min_by surface: per priority, which order carries the extreme
# price. The comparator is (price, key) so ties resolve deterministically —
# required for hash-comparison against any other engine. Oracle uses the
# equivalent row_number formulation (this DuckDB's arg_max has no composite
# comparator).
# ---------------------------------------------------------------------------


@register(
    "agg_minmax_by",
    """
    SELECT o_orderpriority,
           max(CASE WHEN rn_max = 1 THEN o_orderkey END) AS top_orderkey,
           max(CASE WHEN rn_min = 1 THEN o_orderkey END) AS bottom_orderkey,
           round(max(o_totalprice), 2) AS max_price,
           round(min(o_totalprice), 2) AS min_price
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_min
      FROM orders
    )
    GROUP BY o_orderpriority
    """,
    "max_by/min_by with deterministic (value, key) tiebreak",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    pair = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return orders.groupBy("o_orderpriority").agg(
        F.max_by(F.col("o_orderkey"), pair).alias("top_orderkey"),
        F.min_by(F.col("o_orderkey"), pair).alias("bottom_orderkey"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )
