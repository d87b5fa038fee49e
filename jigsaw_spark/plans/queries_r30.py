"""Round-8 batch 3: robust time-series outliers, binomial interval
estimation, exact proportional allocation, and URL structure parsing —

- ``ts_hampel_outliers``: Hampel filter over the daily series — flag
  days where |x - rolling_median| > 3 * 1.4826 * rolling_MAD, with the
  whole decision rule in EXACT integers (x2/x4 unit scaling for the
  two medians, the 44478/10000 rational for the consistency-scaled
  threshold — the agg_mad_outliers constants applied to a rolling
  window). The robust twin of ``ts_anomaly_iqr``.
- ``ab_wilson_ci``: 95% Wilson score interval for each event type's
  high-value rate — the interval every A/B readout should quote
  instead of the Wald interval (which collapses at p near 0/1 and
  small n). Closed form from integer (x, n) through an identical
  expression tree on both engines, snapped.
- ``rel_largest_remainder``: allocate each order's total cents to its
  lineitems proportionally by extended price using LARGEST-REMAINDER
  rounding, so the per-order allocations are integers that sum to the
  order total EXACTLY — the classic finance/revenue-attribution
  allocation (floor shares + distribute the remainder to the largest
  fractional parts, ties by line number).
- ``fn_url_parse``: Spark's ``parse_url`` (HOST / PATH / QUERY / REF /
  keyed QUERY) over synthesized document URLs, with a string-algebra
  oracle — the structured-URL member of the scalar-function suite
  (``dedup_url_canon`` canonicalizes; this extracts).

Scale notes (100 TB): Hampel partitions by series key (day dim is
calendar-bounded); Wilson is one hash-agg; largest-remainder windows
partition BY ORDER (each partition is one order's lineitems — the
natural allocation unit); URL parse is map-only + one host agg.

Float discipline: Hampel and largest-remainder are exact integers
end-to-end; Wilson emits snapped doubles (sqrt over identical
integer-derived operands); URL parse is pure strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ts_hampel_outliers
# ---------------------------------------------------------------------------

_HAMPEL_SQL = """
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    rolled AS (
      SELECT event_type, day, cents,
             list_sort(list(cents) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
      FROM daily),
    med AS (
      SELECT event_type, day, cents, win,
             win[(len(win) - 1) // 2 + 1] + win[len(win) // 2 + 1]
               AS med_x2
      FROM rolled),
    dev AS (
      SELECT event_type, day, cents, med_x2,
             list_sort(list_transform(win, x -> abs(2 * x - med_x2)))
               AS dwin
      FROM med)
    SELECT event_type,
           CAST(day AS BIGINT) AS day,
           CAST(cents AS BIGINT) AS cents,
           CAST(med_x2 AS BIGINT) AS med_x2,
           CAST(dwin[(len(dwin) - 1) // 2 + 1] + dwin[len(dwin) // 2 + 1]
                AS BIGINT) AS mad_x4,
           CAST(CASE WHEN 20000 * abs(2 * cents - med_x2)
                     > 44478 * (dwin[(len(dwin) - 1) // 2 + 1]
                                + dwin[len(dwin) // 2 + 1])
                THEN 1 ELSE 0 END AS INT) AS is_outlier
    FROM dev
"""


@register(
    "ts_hampel_outliers",
    _HAMPEL_SQL,
    "Hampel filter over daily cents per event_type: flag days where "
    "|x - rolling_median7| > 3 * 1.4826 * rolling_MAD7 — the robust "
    "outlier rule that survives the level shifts that wreck z-score "
    "rules (ts_anomaly_iqr is the distribution-wide twin; this is "
    "windowed). ENTIRELY exact integers: median in x2 units, MAD in "
    "x4 units (each the sum of the two middle order statistics, so "
    "even-count midpoints stay integer), and the threshold as the "
    "cross-multiplied rational 20000*dev_x2 > 44478*mad_x4 (3*1.4826 "
    "= 4.4478 — the same constants agg_mad_outliers uses). Shape: one "
    "hash-agg to the day dim, series-partitioned 7-row frames (the "
    "per-row sort is O(1)), zero floats, zero unpartitioned windows",
)
def ts_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    rolled = daily.select(
        "event_type",
        "day",
        "cents",
        F.sort_array(F.collect_list("cents").over(w)).alias("win"),
    )
    med = rolled.withColumn(
        "med_x2",
        F.expr(
            "element_at(win, CAST((size(win) - 1) div 2 + 1 AS INT))"
            " + element_at(win, CAST(size(win) div 2 + 1 AS INT))"
        ),
    )
    dev = med.withColumn(
        "dwin",
        F.expr("sort_array(transform(win, x -> abs(2 * x - med_x2)))"),
    ).withColumn(
        "mad_x4",
        F.expr(
            "element_at(dwin, CAST((size(dwin) - 1) div 2 + 1 AS INT))"
            " + element_at(dwin, CAST(size(dwin) div 2 + 1 AS INT))"
        ),
    )
    return dev.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("cents").cast("bigint").alias("cents"),
        F.col("med_x2").cast("bigint").alias("med_x2"),
        F.col("mad_x4").cast("bigint").alias("mad_x4"),
        F.expr(
            "CAST(CASE WHEN 20000 * abs(2 * cents - med_x2)"
            " > 44478 * mad_x4 THEN 1 ELSE 0 END AS INT)"
        ).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# ab_wilson_ci
# ---------------------------------------------------------------------------

_WILSON_SQL = """
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT)
               AS x
      FROM events GROUP BY 1),
    c AS (
      SELECT event_type, n, x,
             CAST(x AS DOUBLE) / n AS p,
             3.8415 / n AS zz_n
      FROM g)
    SELECT event_type, n, x,
           CAST(x * 1000000 // n AS BIGINT) AS p_micro,
           round(round(
             ((p + zz_n / 2.0)
              - 1.9600 * sqrt(p * (1.0 - p) / n + zz_n / (4.0 * n)))
             / (1.0 + zz_n), 9), 6) AS wilson_lo,
           round(round(
             ((p + zz_n / 2.0)
              + 1.9600 * sqrt(p * (1.0 - p) / n + zz_n / (4.0 * n)))
             / (1.0 + zz_n), 9), 6) AS wilson_hi
    FROM c
"""


@register(
    "ab_wilson_ci",
    _WILSON_SQL,
    "95% Wilson score interval per event type for the high-value rate "
    "(value > 100): the binomial interval every A/B readout should "
    "quote — unlike the Wald interval it never leaves [0,1] and stays "
    "honest at p near 0/1 or small n. z = 1.9600, z^2 = 3.8415 as "
    "shared decimal literals (identical doubles both engines); the "
    "whole expression tree is spelled identically on both sides over "
    "integer-derived operands, so the only divergence source is sqrt "
    "ulps — absorbed by the round(round(x,9),6) snap. p_micro is the "
    "exact integer point estimate. Shape: ONE hash-agg + a 5-row map",
)
def ab_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    c = g.select(
        "event_type",
        "n",
        "x",
        (F.col("x").cast("double") / F.col("n")).alias("p"),
        (F.lit(3.8415) / F.col("n")).alias("zz_n"),
    )
    half = F.lit(1.9600) * F.sqrt(
        F.col("p") * (F.lit(1.0) - F.col("p")) / F.col("n")
        + F.col("zz_n") / (F.lit(4.0) * F.col("n"))
    )
    center = F.col("p") + F.col("zz_n") / F.lit(2.0)
    den = F.lit(1.0) + F.col("zz_n")
    return c.select(
        "event_type",
        "n",
        "x",
        F.expr("CAST(x * 1000000 div n AS BIGINT)").alias("p_micro"),
        F.round(F.round((center - half) / den, 9), 6).alias("wilson_lo"),
        F.round(F.round((center + half) / den, 9), 6).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# rel_largest_remainder
# ---------------------------------------------------------------------------

_ALLOC_SQL = """
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS e_cents
      FROM lineitem
      WHERE l_orderkey % 100 = 0),
    o AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents
      FROM orders WHERE o_orderkey % 100 = 0),
    s AS (
      SELECT li.l_orderkey, li.l_linenumber, li.e_cents, o.total_cents,
             sum(li.e_cents) OVER (PARTITION BY li.l_orderkey) AS se,
             count(*) OVER (PARTITION BY li.l_orderkey) AS n_items
      FROM li JOIN o ON li.l_orderkey = o.o_orderkey),
    base AS (
      SELECT l_orderkey, l_linenumber, e_cents, n_items, total_cents, se,
             total_cents * e_cents // se AS floor_alloc,
             (total_cents * e_cents) % se AS frac
      FROM s),
    ranked AS (
      -- e_cents joins the tie-break because synthetic lineitem REPEATS
      -- (l_orderkey, l_linenumber); rows still tied after it are fully
      -- interchangeable (same floor/frac), so the per-order aggregates
      -- are deterministic under any residual order
      SELECT l_orderkey, n_items, total_cents, floor_alloc,
             row_number() OVER (PARTITION BY l_orderkey
               ORDER BY frac DESC, l_linenumber, e_cents) AS fr,
             total_cents
               - sum(floor_alloc) OVER (PARTITION BY l_orderkey) AS rem
      FROM base),
    alloc AS (
      SELECT l_orderkey, n_items, total_cents,
             floor_alloc + CASE WHEN fr <= rem THEN 1 ELSE 0 END AS a
      FROM ranked)
    SELECT CAST(l_orderkey AS BIGINT) AS o_orderkey,
           CAST(max(n_items) AS BIGINT) AS n_items,
           CAST(max(total_cents) AS BIGINT) AS total_cents,
           CAST(sum(a) AS BIGINT) AS sum_alloc_cents,
           CAST(max(a) AS BIGINT) AS max_alloc_cents,
           CAST(min(a) AS BIGINT) AS min_alloc_cents
    FROM alloc GROUP BY l_orderkey
"""


@register(
    "rel_largest_remainder",
    _ALLOC_SQL,
    "largest-remainder (Hamilton) allocation: distribute each order's "
    "total cents across its lineitems proportionally by extended "
    "price — floor shares total*e_i div sum(e), then +1 cent to the "
    "lines with the largest remainders (total*e_i mod sum(e), ties by "
    "line number) until the order total is met EXACTLY. The "
    "allocation every revenue-attribution / invoice-split pipeline "
    "needs: per-line integers that reconcile to the header total by "
    "construction (sum_alloc_cents == total_cents on every row is the "
    "built-in proof). All windows PARTITION BY ORDER — the natural "
    "allocation unit, parallel across orders at any scale; outputs "
    "the per-order summary for the 1%-sampled keyspace. Pure integer "
    "arithmetic on the positive domain (// == div)",
)
def rel_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("e_cents"),
        )
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("total_cents"),
        )
    )
    wq = Window.partitionBy("l_orderkey")
    s = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_linenumber",
        "e_cents",
        "total_cents",
        F.sum("e_cents").over(wq).alias("se"),
        F.count(F.lit(1)).over(wq).alias("n_items"),
    )
    base = s.select(
        "l_orderkey",
        "l_linenumber",
        "e_cents",
        "n_items",
        "total_cents",
        F.expr("total_cents * e_cents div se").alias("floor_alloc"),
        F.expr("(total_cents * e_cents) % se").alias("frac"),
    )
    # e_cents joins the tie-break: synthetic lineitem repeats
    # (l_orderkey, l_linenumber); rows still tied after it are fully
    # interchangeable, so per-order aggregates stay deterministic
    wr = Window.partitionBy("l_orderkey").orderBy(
        F.desc("frac"), F.col("l_linenumber"), F.col("e_cents")
    )
    ranked = base.select(
        "l_orderkey",
        "n_items",
        "total_cents",
        "floor_alloc",
        F.row_number().over(wr).alias("fr"),
        (
            F.col("total_cents") - F.sum("floor_alloc").over(wq)
        ).alias("rem"),
    )
    alloc = ranked.select(
        "l_orderkey",
        "n_items",
        "total_cents",
        F.expr(
            "floor_alloc + CASE WHEN fr <= rem THEN 1 ELSE 0 END"
        ).alias("a"),
    )
    return alloc.groupBy("l_orderkey").agg(
        F.max("n_items").cast("bigint").alias("n_items"),
        F.max("total_cents").cast("bigint").alias("total_cents"),
        F.sum("a").cast("bigint").alias("sum_alloc_cents"),
        F.max("a").cast("bigint").alias("max_alloc_cents"),
        F.min("a").cast("bigint").alias("min_alloc_cents"),
    ).select(
        F.col("l_orderkey").cast("bigint").alias("o_orderkey"),
        "n_items",
        "total_cents",
        "sum_alloc_cents",
        "max_alloc_cents",
        "min_alloc_cents",
    )


# ---------------------------------------------------------------------------
# fn_url_parse
# ---------------------------------------------------------------------------

_URLPARSE_SQL = """
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang
               || '/' || doc_id || '?id=' || doc_id % 7
               || '&page=' || doc_id % 3 || '#sec' || doc_id % 2 AS url
      FROM documents),
    parts AS (
      SELECT doc_id,
             split_part(split_part(url, '//', 2), '/', 1) AS host,
             '/' || array_to_string(
               str_split(split_part(split_part(url, '//', 2), '?', 1), '/')
                 [2:], '/') AS path,
             split_part(split_part(url, '?', 2), '#', 1) AS query,
             split_part(url, '#', 2) AS fragment,
             regexp_extract(url, 'id=([0-9]+)', 1) AS q_id
      FROM urls)
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(count(DISTINCT query) AS BIGINT) AS n_queries,
           CAST(count(DISTINCT fragment) AS BIGINT) AS n_fragments,
           CAST(sum(CAST(q_id AS BIGINT)) AS BIGINT) AS sum_q_id
    FROM parts GROUP BY host
"""


@register(
    "fn_url_parse",
    _URLPARSE_SQL,
    "structured URL extraction with Spark's parse_url builtin (HOST / "
    "PATH / QUERY / REF / keyed QUERY('id')) over synthesized document "
    "URLs, aggregated per host — the extraction member of the URL "
    "suite (dedup_url_canon canonicalizes; this parses; reference S6 "
    "constructs). The oracle mirrors each component with split_part / "
    "regexp string algebra, proving the builtin against a "
    "from-first-principles decomposition. Map-only + one host agg",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("lang"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit("?id="),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("&page="),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("#sec"),
            (F.col("doc_id") % 2).cast("string"),
        ).alias("url"),
    )
    parts = urls.select(
        "doc_id",
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
        F.expr("parse_url(url, 'REF')").alias("fragment"),
        F.expr("parse_url(url, 'QUERY', 'id')").alias("q_id"),
    )
    return parts.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("path").cast("bigint").alias("n_paths"),
        F.countDistinct("query").cast("bigint").alias("n_queries"),
        F.countDistinct("fragment").cast("bigint").alias("n_fragments"),
        F.sum(F.col("q_id").cast("bigint")).cast("bigint").alias("sum_q_id"),
    )
