"""Round-5 batch 13: Pareto classification and bucketed co-located
joins —

- ``rel_pareto_abc``: ABC/Pareto inventory classification per nation —
  customers ranked by revenue, class A covers the first 80% of
  revenue, B to 95%, C the tail; thresholds are exact integer
  cross-multiplications (cum*100 vs pct*total), no percentages
  materialize as floats.
- ``j11_bucketed_join``: the bucketing layout primitive — orders and
  customers written ``bucketBy(8, custkey)`` into the warehouse, read
  back, and joined WITHOUT a shuffle (bucket-aligned scan feeds the
  join directly); the Spark answer to co-located joins, completing
  the layout family (z-order, Hilbert, manifest pruning, compaction
  planning). The oracle is the plain join — identical result, the
  difference is the physical plan, which the test suite asserts has
  no Exchange on the join path.

Float discipline: NO doubles in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# rel_pareto_abc
# ---------------------------------------------------------------------------

_ABC_SQL = """
    WITH rev AS (
      SELECT c.c_nationkey AS nation, c.c_custkey AS ck,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2),
    ranked AS (
      SELECT nation, ck, cents,
             sum(cents) OVER (PARTITION BY nation
                              ORDER BY cents DESC, ck
                              ROWS UNBOUNDED PRECEDING) - cents
               AS cum_prev,
             sum(cents) OVER (PARTITION BY nation) AS total
      FROM rev),
    classed AS (
      -- cross-multiply in DECIMAL(38,0): per-nation cents totals at
      -- 100 TB approach 1e17, so x100 in BIGINT would brush int64 max
      -- (Spark wraps silently; r5 advisor) — decimal is wrap-proof
      SELECT nation, ck, cents,
             CASE WHEN CAST(cum_prev AS DECIMAL(38,0)) * 100
                       < 80 * CAST(total AS DECIMAL(38,0)) THEN 'A'
                  WHEN CAST(cum_prev AS DECIMAL(38,0)) * 100
                       < 95 * CAST(total AS DECIMAL(38,0)) THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked)
    SELECT CAST(nation AS INT) AS nation, abc,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS class_cents
    FROM classed GROUP BY nation, abc
"""


@register(
    "rel_pareto_abc",
    _ABC_SQL,
    "ABC/Pareto classification per nation: customers ranked by "
    "revenue, class A covers the first 80% of revenue, B to 95%, C "
    "the tail (the customer crossing a line belongs to the upper "
    "class — cum_prev comparison). Thresholds are EXACT integer "
    "cross-multiplications (cum*100 vs pct*total) with a total "
    "(revenue desc, custkey) order, so class membership is "
    "bit-deterministic. Shape: one join-agg to the customer dim, "
    "nation-partitioned prefix windows over it, one class agg",
)
def rel_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    rev = (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"]
        )
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_custkey").alias("ck"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    wc = (
        Window.partitionBy("nation")
        .orderBy(F.desc("cents"), "ck")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = rev.select(
        "nation",
        "ck",
        "cents",
        (F.sum("cents").over(wc) - F.col("cents")).alias("cum_prev"),
        F.sum("cents").over(Window.partitionBy("nation")).alias("total"),
    )
    # cross-multiply in decimal(38,0): per-nation cents totals at 100 TB
    # approach 1e17, so x100 in bigint would brush int64 max and Spark
    # wraps silently (r5 advisor) — decimal is wrap-proof
    cum_d = F.col("cum_prev").cast("decimal(38,0)")
    tot_d = F.col("total").cast("decimal(38,0)")
    classed = ranked.select(
        "nation",
        "cents",
        F.when(cum_d * 100 < tot_d * 80, "A")
        .when(cum_d * 100 < tot_d * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy(
        F.col("nation").cast("int").alias("nation"), "abc"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("class_cents"),
    )


# ---------------------------------------------------------------------------
# j11_bucketed_join
# ---------------------------------------------------------------------------

_BUCKETS = 8

_BUCKETED_SQL = """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
"""


@register(
    "j11_bucketed_join",
    _BUCKETED_SQL,
    "bucketed co-located join — the layout primitive that removes the "
    "join shuffle entirely: orders and customers are written "
    "bucketBy(8, custkey) + sortBy into warehouse tables, read back, "
    "and joined bucket-to-bucket (no Exchange on either join input; "
    "tests/test_r19_ops.py asserts it from the physical plan). At "
    "100 TB this is the difference between re-shuffling the fact "
    "table on every join and paying the layout cost ONCE at write "
    "time — the same contract as Hive bucketing / Iceberg bucket "
    "partition transforms. Results are identical to the plain join "
    "(the oracle); only the plan differs",
)
def j11_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    # idempotent rewrite: a stale warehouse dir from a previous session
    # (no longer registered in this session's catalog) blocks
    # saveAsTable with LOCATION_ALREADY_EXISTS — drop both the catalog
    # entry and the directory before writing. The directory is removed
    # through the Hadoop FileSystem API resolved from the warehouse URI,
    # so the cleanup applies on ANY warehouse scheme (file:, s3a:,
    # hdfs:), not just the local filesystem, and a failed delete raises
    # instead of silently leaving the blocking dir (r5 advisor).
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for tbl in ("j11_orders_bucketed", "j11_customer_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        loc = jvm.org.apache.hadoop.fs.Path(warehouse.rstrip("/") + "/" + tbl)
        fs = loc.getFileSystem(hconf)
        if fs.exists(loc) and not fs.delete(loc, True):
            raise RuntimeError(
                f"could not remove stale managed-table location {loc}; "
                "saveAsTable would fail with LOCATION_ALREADY_EXISTS"
            )
    (
        orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .write.bucketBy(_BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("j11_orders_bucketed")
    )
    (
        cust.select("c_custkey", "c_mktsegment")
        .write.bucketBy(_BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable("j11_customer_bucketed")
    )
    ob = spark.table("j11_orders_bucketed")
    cb = spark.table("j11_customer_bucketed")
    return (
        cb.join(ob, cb["c_custkey"] == ob["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )
