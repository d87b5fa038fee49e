"""Second relational batch: agg-driven join (Q18 shape), ranking-function
suite, multiset set-ops, lateral explode, blocked edit-distance near-dup,
Bernoulli table sampling, fixed-width histograms.

Registered into the same QUERIES registry (imported at the end of
plans/queries.py). Every query here is SQL-expressible, so every one has an
exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.functions.hashing import md5_key_sql
from jigsaw_spark.operators.dedup import edit_distance_pairs
from jigsaw_spark.operators.samples import bernoulli_sample, bernoulli_threshold_hex
from jigsaw_spark.plans.queries import _t, dec2, dsum, register


# ---------------------------------------------------------------------------
# Q18 shape: aggregate → HAVING → join the tiny agg result back to the dims.
# The scale lesson: the post-HAVING relation is a few rows even at 100 TB, so
# BOTH joins broadcast it — orders and customer are never shuffled.
# ---------------------------------------------------------------------------


@register(
    "q18_large_orders",
    """
    SELECT c_name, o_orderkey,
           round(o_totalprice, 2) AS total_price,
           round(sum_qty, 2)      AS sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
    "TPC-H Q18 shape: hash-agg + HAVING, tiny result broadcast into both joins",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    # big is ~0.1% of orders after HAVING — broadcast it through both joins
    # so the fact/dim tables are scanned once, shuffled never.
    hit = orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
    out = customer.join(
        F.broadcast(hit), customer.c_custkey == hit.o_custkey
    )
    return out.select(
        "c_name",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
        F.round("sum_qty", 2).alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# Ranking-function suite. rank/dense_rank/percent_rank/cume_dist depend only
# on peer groups, so they are deterministic under ties; ntile does NOT, so
# its window adds the key as a tiebreaker to make the order total.
# ---------------------------------------------------------------------------


@register(
    "w7_rank_suite",
    """
    SELECT o_orderkey,
           o_orderpriority,
           bucket,
           rank()         OVER w_ties AS rnk,
           dense_rank()   OVER w_ties AS drnk,
           round(percent_rank() OVER w_ties, 6) AS prnk,
           round(cume_dist()    OVER w_ties, 6) AS cdist,
           ntile(4)       OVER w_total AS quartile
    FROM (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice / 1000) AS BIGINT) AS bucket
      FROM orders
    )
    WINDOW
      w_ties  AS (PARTITION BY o_orderpriority ORDER BY bucket),
      w_total AS (PARTITION BY o_orderpriority ORDER BY bucket, o_orderkey)
    """,
    "rank/dense_rank/percent_rank/cume_dist over tied order + total-order ntile",
)
def w7_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / 1000).alias("bucket"),
    )
    w_ties = Window.partitionBy("o_orderpriority").orderBy("bucket")
    w_total = Window.partitionBy("o_orderpriority").orderBy("bucket", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "bucket",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.round(F.percent_rank().over(w_ties), 6).alias("prnk"),
        F.round(F.cume_dist().over(w_ties), 6).alias("cdist"),
        F.ntile(4).over(w_total).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# Multiset set ops (INTERSECT ALL / EXCEPT ALL). The post-op count aggregate
# keeps the compared result small while still proving multiplicities match.
# ---------------------------------------------------------------------------

_SET_A = "SELECT l_returnflag, l_quantity FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"
_SET_B = "SELECT l_returnflag, l_quantity FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'"


def _year_slice(li: DataFrame, year: int) -> DataFrame:
    return li.filter(
        (F.col("l_shipdate") >= F.lit(f"{year}-01-01"))
        & (F.col("l_shipdate") < F.lit(f"{year + 1}-01-01"))
    ).select("l_returnflag", "l_quantity")


@register(
    "set_intersect_all",
    f"""
    SELECT l_returnflag, l_quantity, count(*) AS n
    FROM (({_SET_A}) INTERSECT ALL ({_SET_B}))
    GROUP BY l_returnflag, l_quantity
    """,
    "multiset intersection — multiplicity = min(count_a, count_b)",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    inter = _year_slice(li, 1996).intersectAll(_year_slice(li, 1997))
    return inter.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "set_except_all",
    f"""
    SELECT l_returnflag, l_quantity, count(*) AS n
    FROM (({_SET_A}) EXCEPT ALL ({_SET_B}))
    GROUP BY l_returnflag, l_quantity
    """,
    "multiset difference — multiplicity = max(0, count_a - count_b)",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    diff = _year_slice(li, 1996).exceptAll(_year_slice(li, 1997))
    return diff.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# Lateral explode (generator surface): word expansion + frequency. The
# explode is a narrow op — no shuffle until the count aggregate.
# ---------------------------------------------------------------------------


@register(
    "fn_explode",
    """
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    HAVING count(*) >= 25
    """,
    "explode/unnest generator + word-frequency aggregate",
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 25)
    )


# ---------------------------------------------------------------------------
# Blocked Levenshtein near-dup (the edit-distance member of the dedup family).
# ---------------------------------------------------------------------------


@register(
    "text_edit_distance",
    """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) AS distance
    FROM documents a
    JOIN documents b
      ON a.lang = b.lang AND a.source = b.source
     AND floor(length(a.text) / 20) = floor(length(b.text) / 20)
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) <= 40
    """,
    "edit-distance near-dup pairs, blocked on (lang, source, length-bucket)",
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return edit_distance_pairs(
        docs,
        key="doc_id",
        text="text",
        block_cols=["lang", "source"],
        length_bucket=20,
        prefix_len=60,
        max_distance=40,
    )


# ---------------------------------------------------------------------------
# Bernoulli sampling (TABLESAMPLE analog): pure filter, no shuffle; the md5
# hex threshold is the same string literal on both sides.
# ---------------------------------------------------------------------------

_BERNOULLI_THRESHOLD = bernoulli_threshold_hex(0.25)


@register(
    "p_bernoulli_sample",
    f"""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price
    FROM orders
    WHERE {md5_key_sql(['o_orderkey'], seed='tablesample-42')} < '{_BERNOULLI_THRESHOLD}'
    """,
    "deterministic Bernoulli sample: md5 hex threshold, shuffle-free",
)
def p_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return bernoulli_sample(orders, ["o_orderkey"], 0.25).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram: floor-bucket + count/sum — one hash aggregate, the
# shape used for distribution profiling at any scale.
# ---------------------------------------------------------------------------


@register(
    "agg_histogram",
    """
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total
    FROM orders
    GROUP BY 1
    """,
    "fixed-width histogram: floor-bucket hash aggregate",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 25000).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec2("o_totalprice")).alias("total"),
        )
    )


@register(
    "j7_full_outer",
    """
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             count(*) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS order_total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-02-01'
      GROUP BY 1),
    s AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             count(*) AS n_ships,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS ship_total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-02-01'
      GROUP BY 1)
    SELECT CAST(COALESCE(o.day, s.day) AS VARCHAR) AS day,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(order_total, 0.0) AS order_total,
           COALESCE(n_ships, 0) AS n_ships,
           COALESCE(ship_total, 0.0) AS ship_total
    FROM o FULL OUTER JOIN s ON o.day = s.day
    """,
    "full-outer join of two independently aggregated daily series "
    "(placed/shipped reconciliation) with COALESCE'd gaps — both sides "
    "pre-aggregated BEFORE the join so the outer join shuffles day-counts, "
    "not raw facts; date filters pushed to both scans",
)
def j7_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    jan = lambda c: (F.col(c) >= F.lit("1997-01-01").cast("timestamp")) & (  # noqa: E731
        F.col(c) < F.lit("1997-02-01").cast("timestamp")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(jan("o_orderdate"))
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec2("o_totalprice")).alias("order_total"),
        )
    )
    s = (
        _t(spark, sf_dir, "lineitem")
        .filter(jan("l_shipdate"))
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_ships"),
            dsum(dec2("l_extendedprice")).alias("ship_total"),
        )
    )
    return (
        o.join(s, "day", "full_outer")
        .select(
            # ISO string, not DATE: pandas renders DuckDB DATE as a
            # midnight Timestamp but Spark DATE as datetime.date — a
            # guaranteed canon mismatch at the driver (r4 sweep find)
            F.col("day").cast("string").alias("day"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("order_total", F.lit(0.0)).alias("order_total"),
            F.coalesce("n_ships", F.lit(0)).alias("n_ships"),
            F.coalesce("ship_total", F.lit(0.0)).alias("ship_total"),
        )
    )
