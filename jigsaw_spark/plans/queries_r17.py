"""Round-5 batch 11: drift testing, skew diagnostics, calendar
matrices, M4 downsampling, and FIFO allocation —

- ``dq_ks_2sample``: the two-sample Kolmogorov-Smirnov statistic per
  event type (variant = user parity) — max CDF gap, kept EXACT by
  cross-multiplying cumulative counts to the common denominator
  n_a*n_b; the distribution-drift test beside PSI/JSD.
- ``dq_skew_report``: partition-skew diagnosis for three candidate
  shuffle keys (type, user bucket, day) — max/avg partition-size
  ratio in milli-units; the report that decides salting and AQE
  thresholds before a production shuffle.
- ``rel_dow_hour_matrix``: the day-of-week x hour-of-day activity
  matrix with an ENGINE-NEUTRAL dow ((epoch_days + 3) mod 7, 0 =
  Monday) — no reliance on divergent dayofweek() conventions.
- ``ts_m4_downsample``: M4 time-series downsampling (Jugel et al.
  2014) — per pixel-bucket min/max/first/last, the lossless-render
  reduction every time-series UI uses; bucket assignment and all four
  anchors are exact integers.
- ``rel_fifo_match``: FIFO flow matching via PREFIX-SUM INTERVAL
  OVERLAP — inflow i matches outflow j by the overlap of their
  cumulative-quantity intervals, the classic inventory/cost
  allocation turned into a bounded per-key interval join (no loops,
  no state).

Float discipline: NO doubles in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# dq_ks_2sample
# ---------------------------------------------------------------------------

_KS_SQL = """
    WITH x AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CAST(user_id % 2 AS INT) AS v
      FROM events),
    g AS (
      SELECT event_type, cents,
             sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS cb
      FROM x GROUP BY 1, 2),
    cum AS (
      SELECT event_type,
             sum(ca) OVER w AS cua, sum(cb) OVER w AS cub,
             sum(ca) OVER (PARTITION BY event_type) AS na,
             sum(cb) OVER (PARTITION BY event_type) AS nb
      FROM g WINDOW w AS (PARTITION BY event_type ORDER BY cents)),
    d AS (
      SELECT event_type, any_value(na) AS na, any_value(nb) AS nb,
             max(abs(cua * nb - cub * na)) AS d_num
      FROM cum GROUP BY event_type)
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(d_num AS BIGINT) AS d_num,
           CAST(1000 * d_num // (na * nb) AS BIGINT) AS d_milli
    FROM d
"""


@register(
    "dq_ks_2sample",
    _KS_SQL,
    "two-sample Kolmogorov-Smirnov drift statistic per event type "
    "(variant = user parity): D = max |CDF_a - CDF_b|, kept EXACT by "
    "cross-multiplying cumulative counts to the common denominator "
    "n_a*n_b (integer numerator, milli-unit quotient) — the "
    "nonparametric distribution-drift screen beside PSI/JSD, with no "
    "binning choice to tune. Shape: one hash agg to the "
    "distinct-value dim, partitioned prefix windows, one max agg — "
    "the fact table is scanned once",
)
def dq_ks_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        (F.col("user_id") % 2).cast("int").alias("v"),
    )
    g = x.groupBy("event_type", "cents").agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0)).alias("cb"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = g.select(
        "event_type",
        F.sum("ca").over(w).alias("cua"),
        F.sum("cb").over(w).alias("cub"),
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
    )
    d = cum.groupBy("event_type").agg(
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
        F.max(
            F.abs(F.col("cua") * F.col("nb") - F.col("cub") * F.col("na"))
        ).alias("d_num"),
    )
    return d.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("d_num").cast("bigint").alias("d_num"),
        F.expr("CAST(1000 * d_num div (na * nb) AS BIGINT)").alias(
            "d_milli"
        ),
    )


# ---------------------------------------------------------------------------
# dq_skew_report
# ---------------------------------------------------------------------------

_SKEW_SQL = """
    WITH by_type AS (
      SELECT count(*) AS c FROM events GROUP BY event_type),
    by_user AS (
      SELECT count(*) AS c FROM events GROUP BY user_id % 1024),
    by_day AS (
      SELECT count(*) AS c FROM events
      GROUP BY epoch_us(ts) // 86400000000)
    SELECT key_name, n_partitions, total_rows, max_rows,
           CAST(max_rows * n_partitions * 1000 // total_rows AS BIGINT)
             AS skew_milli
    FROM (
      SELECT 'event_type' AS key_name,
             CAST(count(*) AS BIGINT) AS n_partitions,
             CAST(sum(c) AS BIGINT) AS total_rows,
             CAST(max(c) AS BIGINT) AS max_rows
      FROM by_type
      UNION ALL
      SELECT 'user_bucket_1024', CAST(count(*) AS BIGINT),
             CAST(sum(c) AS BIGINT), CAST(max(c) AS BIGINT) FROM by_user
      UNION ALL
      SELECT 'day', CAST(count(*) AS BIGINT), CAST(sum(c) AS BIGINT),
             CAST(max(c) AS BIGINT) FROM by_day) t
"""


@register(
    "dq_skew_report",
    _SKEW_SQL,
    "partition-skew diagnosis for three candidate shuffle keys (event "
    "type, 1024-way user bucket, calendar day): per key the partition "
    "count, total, max partition size, and the max/avg ratio in "
    "milli-units (1000 = perfectly uniform) — the pre-shuffle report "
    "that decides salting factors and AQE skew thresholds before a "
    "production join/agg. Each key is one hash agg + one tiny "
    "rollup; all integer floor-division arithmetic",
)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def key_report(name: str, key):
        c = ev.groupBy(key.alias("k")).agg(F.count(F.lit(1)).alias("c"))
        return c.agg(
            F.lit(name).alias("key_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("c").cast("bigint").alias("total_rows"),
            F.max("c").cast("bigint").alias("max_rows"),
        )

    rep = (
        key_report("event_type", F.col("event_type"))
        .unionByName(
            key_report("user_bucket_1024", F.col("user_id") % 1024)
        )
        .unionByName(
            key_report(
                "day", F.expr("unix_micros(ts) div 86400000000")
            )
        )
    )
    return rep.withColumn(
        "skew_milli",
        F.expr(
            "CAST(max_rows * n_partitions * 1000 div total_rows AS BIGINT)"
        ),
    )


# ---------------------------------------------------------------------------
# rel_dow_hour_matrix
# ---------------------------------------------------------------------------

_DOW_SQL = """
    SELECT CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS INT) AS dow,
           CAST((epoch_us(ts) % 86400000000) // 3600000000 AS INT) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events GROUP BY 1, 2
"""


@register(
    "rel_dow_hour_matrix",
    _DOW_SQL,
    "day-of-week x hour-of-day activity matrix (counts + revenue "
    "cents) — the calendar heatmap behind staffing/traffic reports. "
    "The dow is ENGINE-NEUTRAL integer arithmetic ((epoch_days + 3) "
    "mod 7, 0 = Monday, anchored on 1970-01-01 being a Thursday) — "
    "deliberately NOT dayofweek(), whose 0/1-origin and week-start "
    "conventions differ across engines. ONE hash agg on a 7x24 "
    "bounded key space; map-side combine makes it shuffle-light at "
    "any scale",
)
def rel_dow_hour_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.expr(
            "CAST((unix_micros(ts) div 86400000000 + 3) % 7 AS INT)"
        ).alias("dow"),
        F.expr(
            "CAST((unix_micros(ts) % 86400000000) div 3600000000 AS INT)"
        ).alias("hour"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


# ---------------------------------------------------------------------------
# ts_m4_downsample
# ---------------------------------------------------------------------------

_M4_W = 16  # pixel-bucket count

_M4_SQL = f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS x, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    span AS (
      SELECT event_type, min(x) AS x0, max(x) AS x1
      FROM e GROUP BY event_type),
    b AS (
      SELECT e.event_type, e.x, e.event_id, e.cents,
             CAST(((e.x - s.x0) * {_M4_W}) // (s.x1 - s.x0 + 1) AS BIGINT)
               AS bucket
      FROM e JOIN span s ON e.event_type = s.event_type),
    r AS (
      SELECT event_type, bucket, cents,
             row_number() OVER w AS rf,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY x DESC, event_id DESC) AS rl
      FROM b WINDOW w AS (PARTITION BY event_type, bucket
                          ORDER BY x, event_id))
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           CAST(min(CASE WHEN rf = 1 THEN cents END) AS BIGINT)
             AS first_cents,
           CAST(min(CASE WHEN rl = 1 THEN cents END) AS BIGINT)
             AS last_cents
    FROM r GROUP BY event_type, bucket
"""


@register(
    "ts_m4_downsample",
    _M4_SQL,
    "M4 time-series downsampling (Jugel et al., VLDB 2014): per "
    "pixel bucket the min/max/first/last values — the reduction that "
    "renders a corpus-sized series pixel-perfect with 4 points per "
    "bucket, the standard in time-series UIs. Bucket assignment is "
    "exact integer floor division of the span into {_M4_W} cells; "
    "first/last anchor on the total (x, event_id) order via "
    "per-bucket rank windows (all windows partition by "
    "(type, bucket)). One fact scan + one span dim join",
)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.unix_micros("ts").alias("x"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    span = e.groupBy("event_type").agg(
        F.min("x").alias("x0"), F.max("x").alias("x1")
    )
    b = e.join(F.broadcast(span), "event_type").select(
        "event_type",
        "x",
        "event_id",
        "cents",
        F.expr(
            f"CAST(((x - x0) * {_M4_W}) div (x1 - x0 + 1) AS BIGINT)"
        ).alias("bucket"),
    )
    wf = Window.partitionBy("event_type", "bucket").orderBy("x", "event_id")
    wl = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("x"), F.desc("event_id")
    )
    r = b.select(
        "event_type",
        "bucket",
        "cents",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
    )
    return r.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.max("cents").cast("bigint").alias("max_cents"),
        F.min(F.when(F.col("rf") == 1, F.col("cents")))
        .cast("bigint")
        .alias("first_cents"),
        F.min(F.when(F.col("rl") == 1, F.col("cents")))
        .cast("bigint")
        .alias("last_cents"),
    ).withColumn("bucket", F.col("bucket").cast("bigint"))


# ---------------------------------------------------------------------------
# rel_fifo_match
# ---------------------------------------------------------------------------

_FIFO_SQL = """
    WITH flows AS (
      -- pre-aggregate to (pk, shipdate, ok, ln, side): the synthetic
      -- lineitem repeats (orderkey, linenumber), and the FIFO windows
      -- need a TOTAL order — merged flows make (shipdate, ok, ln)
      -- unique per (pk, side) by construction
      SELECT l_partkey AS pk, l_orderkey AS ok, l_linenumber AS ln,
             l_shipdate,
             CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
               AS qty,
             l_linenumber % 2 = 1 AS is_in
      FROM lineitem
      GROUP BY l_partkey, l_orderkey, l_linenumber, l_shipdate,
               l_linenumber % 2 = 1),
    inx AS (
      SELECT pk, ok, ln, qty,
             sum(qty) OVER w AS cum,
             sum(qty) OVER w - qty AS cum_prev
      FROM flows WHERE is_in
      WINDOW w AS (PARTITION BY pk ORDER BY l_shipdate, ok, ln
                   ROWS UNBOUNDED PRECEDING)),
    outx AS (
      SELECT pk, ok, ln, qty,
             sum(qty) OVER w AS cum,
             sum(qty) OVER w - qty AS cum_prev
      FROM flows WHERE NOT is_in
      WINDOW w AS (PARTITION BY pk ORDER BY l_shipdate, ok, ln
                   ROWS UNBOUNDED PRECEDING))
    SELECT i.pk AS l_partkey,
           i.ok AS in_order, CAST(i.ln AS INT) AS in_line,
           o.ok AS out_order, CAST(o.ln AS INT) AS out_line,
           CAST(least(i.cum, o.cum) - greatest(i.cum_prev, o.cum_prev)
                AS BIGINT) AS matched_qty
    FROM inx i JOIN outx o
      ON i.pk = o.pk AND i.cum > o.cum_prev AND o.cum > i.cum_prev
"""


@register(
    "rel_fifo_match",
    _FIFO_SQL,
    "FIFO flow matching (inventory/cost allocation) WITHOUT loops or "
    "state: inflows and outflows per part each get cumulative-"
    "quantity intervals [cum-qty, cum) from partitioned prefix "
    "windows, and inflow i supplies outflow j exactly where the "
    "intervals OVERLAP — matched = min(cums) - max(prevs), the "
    "prefix-sum formulation of first-in-first-out. The join is "
    "part-keyed with per-part bounded fan-out (a flow matches only "
    "the flows its interval touches). All exact integer quantities",
)
def rel_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # pre-aggregate to (pk, shipdate, ok, ln, side): the synthetic
    # lineitem repeats (orderkey, linenumber), and the FIFO windows need
    # a TOTAL order — merged flows make the order key unique
    flows = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        "l_shipdate",
        (F.col("l_linenumber") % 2 == 1).alias("is_in"),
    ).agg(
        F.sum(F.round("l_quantity", 0).cast("bigint"))
        .cast("bigint")
        .alias("qty")
    )
    w = (
        Window.partitionBy("pk")
        .orderBy("l_shipdate", "ok", "ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def cums(df):
        return df.select(
            "pk",
            "ok",
            "ln",
            F.sum("qty").over(w).alias("cum"),
            (F.sum("qty").over(w) - F.col("qty")).alias("cum_prev"),
        )

    inx = cums(flows.filter(F.col("is_in")))
    outx = cums(flows.filter(~F.col("is_in"))).select(
        F.col("pk"),
        F.col("ok").alias("out_ok"),
        F.col("ln").alias("out_ln"),
        F.col("cum").alias("ocum"),
        F.col("cum_prev").alias("ocum_prev"),
    )
    return (
        inx.join(outx, "pk")
        .filter(
            (F.col("cum") > F.col("ocum_prev"))
            & (F.col("ocum") > F.col("cum_prev"))
        )
        .select(
            F.col("pk").alias("l_partkey"),
            F.col("ok").alias("in_order"),
            F.col("ln").cast("int").alias("in_line"),
            F.col("out_ok").alias("out_order"),
            F.col("out_ln").cast("int").alias("out_line"),
            (
                F.least(F.col("cum"), F.col("ocum"))
                - F.greatest(F.col("cum_prev"), F.col("ocum_prev"))
            )
            .cast("bigint")
            .alias("matched_qty"),
        )
    )
