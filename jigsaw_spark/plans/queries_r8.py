"""Round-5 batch 2: histogram/observability, sampling, graph, bitmap
algebra, and data-quality operators —

- ``agg_log2_histogram``: exponential (base-2) value histogram — the
  mergeable log-bucketed shape OpenTelemetry/HDR sketches use; bucket
  index is ``floor(log2(cents))`` computed EXACTLY as
  ``length(bin(cents)) - 1`` (no libm anywhere).
- ``p_stratified_kfold``: per-stratum round-robin fold assignment
  (sklearn StratifiedKFold semantics) — unlike the global ``p3``, the
  rank window is PARTITIONED by stratum, so it is fully parallel at
  any scale with no local/distributed strategy switch.
- ``graph_bfs_layers``: bounded-depth BFS distance labels from a seed
  set over the near-dup candidate graph — per layer ONE edge join +
  min-agg, unrolled to 4 SQL stages in the oracle.
- ``agg_bitmap_overlap``: pairwise audience overlap via Spark 4 bitmap
  algebra — per-group custkey bitmaps, |A∩B| recovered by
  inclusion-exclusion |A|+|B|-|A∪B| with ``bitmap_or_agg`` (no
  bitmap_and exists in the registry); the oracle replays with plain
  DISTINCT counts, proving the bitmap path exact.
- ``dq_fk_orphans``: referential-integrity audit (orphan counts +
  coverage) across the fact→dim chain — the dbt-style relationship
  test as one query.
- ``ml_linreg_by_group``: per-group closed-form OLS (slope, intercept,
  r²) of daily revenue vs day index — exact decimal(38,0) moment sums,
  one shared final expression both engines.

Float discipline: every statistic is a rounded double derived from
exact integer/decimal sums through one shared expression; no libm at
all in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# agg_log2_histogram
# ---------------------------------------------------------------------------

_L2H_SQL = """
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE value > 0),
    b AS (
      SELECT event_type,
             CAST(length(bin(cents)) - 1 AS INT) AS bucket,
             cents
      FROM c)
    SELECT event_type, bucket,
           CAST(1 << bucket AS BIGINT) AS bucket_lo,
           CAST((1 << (bucket + 1)) - 1 AS BIGINT) AS bucket_hi,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM b GROUP BY event_type, bucket
"""


@register(
    "agg_log2_histogram",
    _L2H_SQL,
    "exponential (base-2) value histogram per event type — the "
    "mergeable log-bucketed shape OTel/HDR sketches standardize "
    "(relative error bounded per bucket, buckets mergeable by index "
    "addition): bucket = floor(log2(cents)) computed EXACTLY as "
    "length(bin(cents))-1, so no libm enters and the histogram is "
    "bit-identical across engines. ONE hash agg over (type, bucket) — "
    "cardinality bounded by 64 buckets x |types| at any corpus size",
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("value") > 0)
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    b = ev.select(
        "event_type",
        (F.length(F.bin(cents)) - 1).cast("int").alias("bucket"),
        cents.alias("cents"),
    )
    return b.groupBy("event_type", "bucket").agg(
        F.expr("CAST(shiftleft(1L, bucket) AS BIGINT)").alias("bucket_lo"),
        F.expr("CAST(shiftleft(1L, bucket + 1) - 1 AS BIGINT)").alias(
            "bucket_hi"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    ).select(
        "event_type", "bucket", "bucket_lo", "bucket_hi", "n", "sum_cents"
    )


# ---------------------------------------------------------------------------
# p_stratified_kfold
# ---------------------------------------------------------------------------

_SKF_K = 5

_SKF_SQL = f"""
    SELECT doc_id, lang,
           CAST((row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('skfold|' || CAST(doc_id AS VARCHAR)),
                            doc_id) - 1) % {_SKF_K} AS INT) AS fold
    FROM documents
"""


@register(
    "p_stratified_kfold",
    _SKF_SQL,
    "stratified k-fold (sklearn StratifiedKFold semantics): round-robin "
    "over the md5-shuffled order WITHIN each stratum, so every fold "
    "carries each class in proportion — and unlike the global p3 "
    "assignment, the rank window is PARTITIONED by stratum: fully "
    "parallel at any scale, no local/distributed strategy switch needed",
)
def p_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.functions.hashing import md5_key

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        md5_key(F.col("doc_id"), seed="skfold"), "doc_id"
    )
    return docs.select(
        "doc_id",
        "lang",
        ((F.row_number().over(w) - 1) % _SKF_K).cast("int").alias("fold"),
    )


# ---------------------------------------------------------------------------
# graph_bfs_layers
# ---------------------------------------------------------------------------

_BFS_DEPTH = 4


def _bfs_sql() -> str:
    from jigsaw_spark.plans.queries_r7 import _lsh_edges_cte

    head = f"""
    WITH {_lsh_edges_cte()},
    d0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, 0 AS dist FROM edges
      WHERE src % 97 = 0)"""
    stages = []
    for t in range(1, _BFS_DEPTH + 1):
        stages.append(f"""
    d{t} AS MATERIALIZED (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{t - 1}
        UNION ALL
        SELECT e.dst AS node, p.dist + 1 AS dist
        FROM d{t - 1} p JOIN edges e ON p.node = e.src) u
      GROUP BY node)""")
    return (
        head
        + ","
        + ",".join(stages)
        + f"""
    SELECT node, CAST(dist AS INT) AS dist
    FROM d{_BFS_DEPTH}"""
    )


@register(
    "graph_bfs_layers",
    _bfs_sql(),
    "bounded-depth BFS distance labels from a seed set (doc_id%97=0) "
    "over the LSH candidate graph — the reachability primitive under "
    "contamination-spread and cluster-growth audits. Per layer ONE "
    "src-keyed edge join + ONE min-agg (frontier never collected); "
    f"{_BFS_DEPTH} layers unrolled to materialized CTE stages in the "
    "oracle. Min is order-independent, so labels are exact integers "
    "under any partitioning",
)
def graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    dist = (
        edges.filter(F.col("src") % 97 == 0)
        .select(F.col("src").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
    )
    for _ in range(_BFS_DEPTH):
        hop = (
            dist.join(edges, dist["node"] == edges["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(hop)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)  # truncate iterative lineage
        )
    return dist.select("node", F.col("dist").cast("int").alias("dist"))


# ---------------------------------------------------------------------------
# agg_bitmap_overlap
# ---------------------------------------------------------------------------

_BMO_SQL = """
    WITH pr AS (SELECT DISTINCT o_orderpriority AS p FROM orders),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2 FROM pr a JOIN pr b ON a.p < b.p),
    sets AS (
      SELECT o_orderpriority AS p, o_custkey AS k FROM orders GROUP BY 1, 2),
    sz AS (SELECT p, count(*) AS n FROM sets GROUP BY p),
    inter AS (
      SELECT s1.p AS p1, s2.p AS p2, count(*) AS both
      FROM sets s1 JOIN sets s2 ON s1.k = s2.k AND s1.p < s2.p
      GROUP BY 1, 2)
    SELECT pr.p1, pr.p2,
           CAST(za.n AS BIGINT) AS n1,
           CAST(zb.n AS BIGINT) AS n2,
           CAST(coalesce(i.both, 0) AS BIGINT) AS n_both,
           CAST(za.n + zb.n - coalesce(i.both, 0) AS BIGINT) AS n_union
    FROM pairs pr
    JOIN sz za ON pr.p1 = za.p
    JOIN sz zb ON pr.p2 = zb.p
    LEFT JOIN inter i ON pr.p1 = i.p1 AND pr.p2 = i.p2
"""


@register(
    "agg_bitmap_overlap",
    _BMO_SQL,
    "pairwise audience overlap (customers ordering under BOTH "
    "priorities) via Spark 4 BITMAP ALGEBRA: per-group custkey bitmaps "
    "(bitmap_bucket_number/bitmap_construct_agg), per-group sizes from "
    "bitmap_count, pair UNION sizes from bitmap_or_agg over the two "
    "groups' bucket rows, and the intersection recovered exactly by "
    "inclusion-exclusion |A|+|B|-|AuB| (the registry exposes no "
    "bitmap_and). The corpus shuffles ONCE into KB-per-bucket bitmaps; "
    "all pair work runs on the bitmap dim. Oracle replays with plain "
    "DISTINCT joins — bitmaps are exact, so counts match bit-for-bit",
)
def agg_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # one bitmap row per (priority, bucket) — the corpus' only shuffle
    bm = (
        orders.select(
            F.col("o_orderpriority").alias("p"),
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("p", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .localCheckpoint(eager=False)  # reused by sizes AND both pair sides
    )
    sz = bm.groupBy("p").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n")
    )
    # per pair: stack both groups' bucket rows, bitmap_or_agg by bucket,
    # sum the bucket counts — the union size without any id re-shuffle
    pairs = (
        sz.select(F.col("p").alias("p1"))
        .crossJoin(sz.select(F.col("p").alias("p2")))
        .filter(F.col("p1") < F.col("p2"))
    )
    stacked = pairs.join(
        bm.select("p", "bucket", "bm"),
        (F.col("p") == F.col("p1")) | (F.col("p") == F.col("p2")),
    )
    union_sz = (
        stacked.groupBy("p1", "p2", "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("u"))
        .groupBy("p1", "p2")
        .agg(F.sum(F.expr("bitmap_count(u)")).alias("n_union"))
    )
    s1 = sz.select(F.col("p").alias("p1"), F.col("n").alias("n1"))
    s2 = sz.select(F.col("p").alias("p2"), F.col("n").alias("n2"))
    return (
        union_sz.join(F.broadcast(s1), "p1")
        .join(F.broadcast(s2), "p2")
        .select(
            "p1",
            "p2",
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            (F.col("n1") + F.col("n2") - F.col("n_union"))
            .cast("bigint")
            .alias("n_both"),
            F.col("n_union").cast("bigint").alias("n_union"),
        )
    )


# ---------------------------------------------------------------------------
# dq_fk_orphans
# ---------------------------------------------------------------------------

_FK_SQL = """
    SELECT
      CAST((SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
           AS BIGINT) AS li_orphans,
      CAST((SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
           AS BIGINT) AS ord_orphans,
      CAST((SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey))
           AS BIGINT) AS idle_customers,
      CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS li_total,
      CAST((SELECT count(*) FROM orders) AS BIGINT) AS ord_total
"""


@register(
    "dq_fk_orphans",
    _FK_SQL,
    "referential-integrity audit (the dbt 'relationships' test as one "
    "query): orphan counts along lineitem->orders->customer plus the "
    "reverse idle-customer count and totals for coverage ratios. Each "
    "leg is ONE anti/semi join on the key (broadcast when the dim "
    "side is small); exact integers only",
)
def dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li_orphans = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    ).count()
    ord_orphans = orders.join(
        cust.select("c_custkey"),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    ).count()
    idle = cust.join(
        orders.select("o_custkey"),
        cust["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    ).count()
    return spark.createDataFrame(
        [(li_orphans, ord_orphans, idle, li.count(), orders.count())],
        "li_orphans bigint, ord_orphans bigint, idle_customers bigint, "
        "li_total bigint, ord_total bigint",
    )


# ---------------------------------------------------------------------------
# ml_linreg_by_group
# ---------------------------------------------------------------------------

_OLS_SQL = """
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_id,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2),
    rel AS (
      SELECT event_type,
             day_id - min(day_id) OVER (PARTITION BY event_type) AS x,
             y
      FROM daily),
    m AS (
      SELECT event_type,
             count(*) AS n,
             sum(CAST(x AS DECIMAL(38,0))) AS sx,
             sum(CAST(y AS DECIMAL(38,0))) AS sy,
             sum(CAST(x * y AS DECIMAL(38,0))) AS sxy,
             sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
             sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy
      FROM rel GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6)
             AS slope_per_day,
           round((CAST(sy AS DOUBLE) / n
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE)
                    * (CAST(sx AS DOUBLE) / n)) / 100.0, 4) AS intercept,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 * CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
    FROM m
"""


@register(
    "ml_linreg_by_group",
    _OLS_SQL,
    "per-group closed-form OLS trend (slope $/day, intercept, r^2) of "
    "daily revenue vs day index — the grouped regression primitive "
    "behind every 'trend per segment' report. Moments are exact "
    "decimal(38,0) sums of integer (day-index, cents) pairs (x "
    "re-based per group so products stay small), finals are one shared "
    "double expression rounded once — bit-identical across engines. "
    "Corpus -> ONE (type, day) hash agg -> ONE moment agg per group",
)
def ml_linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(86400000000)).cast("bigint").alias(
            "day_id"
        ),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("y"))
    rel = daily.select(
        "event_type",
        (
            F.col("day_id")
            - F.min("day_id").over(Window.partitionBy("event_type"))
        ).alias("x"),
        "y",
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = rel.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x") * F.col("y"))).alias("sxy"),
        F.sum(d(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(d(F.col("y")) * d(F.col("y"))).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = (n * sxy - sx * sy).cast("double")
    varx = (n * sxx - sx * sx).cast("double")
    vary = (n * syy - sy * sy).cast("double")
    slope = cov / varx
    return m.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.round(slope / 100.0, 6).alias("slope_per_day"),
        F.round(
            (sy.cast("double") / n - slope * (sx.cast("double") / n)) / 100.0,
            4,
        ).alias("intercept"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# layout_hilbert
# ---------------------------------------------------------------------------

_HIL_P = 8  # 256 x 256 grid, 16-bit key
_HIL_N = 1 << _HIL_P


def _hilbert_stage_exprs(s: int, keep: str) -> list[str]:
    """One xy2d loop iteration (Wikipedia/Warren algorithm) as portable
    SQL column expressions evaluated against the PREVIOUS stage's
    (x, y, d). No ^ operator anywhere (DuckDB's ^ is POWER): the
    quadrant (3*rx) XOR ry collapses to the branchless arithmetic form
    CASE rx=0 -> ry, rx=1 -> 3-ry."""
    rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
    quadrant = f"(CASE WHEN {rx} = 1 THEN 3 - {ry} ELSE {ry} END)"
    new_x = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {_HIL_N - 1} - y ELSE y END) ELSE x END AS x"
    )
    new_y = (
        f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {_HIL_N - 1} - x ELSE x END) ELSE y END AS y"
    )
    new_d = f"d + {s * s} * {quadrant} AS d"
    return [keep, new_x, new_y, new_d]


def _hilbert_sql() -> str:
    head = f"""
    WITH h0 AS (
      SELECT o_orderkey,
             CAST(o_custkey % {_HIL_N} AS BIGINT) AS x,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) % {_HIL_N}
                  AS BIGINT) AS y,
             CAST(o_custkey % {_HIL_N} AS BIGINT) AS x0,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) % {_HIL_N}
                  AS BIGINT) AS y0,
             CAST(0 AS BIGINT) AS d
      FROM orders)"""
    stages = []
    i = 0
    s = _HIL_N // 2
    while s > 0:
        i += 1
        exprs = _hilbert_stage_exprs(s, "o_orderkey")
        stages.append(
            f",\n    h{i} AS (SELECT {exprs[0]}, x0, y0, "
            f"{exprs[1]}, {exprs[2]}, {exprs[3]} FROM h{i - 1})"
        )
        s //= 2
    return (
        head
        + "".join(stages)
        + f"""
    SELECT CAST(d >> 9 AS BIGINT) AS file_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(d) AS BIGINT) AS hmin,
           CAST(max(d) AS BIGINT) AS hmax,
           CAST(max(x0) - min(x0) AS BIGINT) AS x_span,
           CAST(max(y0) - min(y0) AS BIGINT) AS y_span
    FROM h{i} GROUP BY 1"""
    )


@register(
    "layout_hilbert",
    _hilbert_sql(),
    "Hilbert-curve clustering key over (custkey, price-cents) — the "
    "locality-preserving layout behind Databricks liquid clustering; "
    "vs Morton (layout_zorder), consecutive key ranges form compact "
    "squares with no Z-shape diagonal jumps, so per-file min/max boxes "
    "on BOTH raw dimensions shrink. The xy2d bit walk (8 rotate/"
    "reflect stages, pure integer CASE arithmetic — portable: no ^, "
    "which DuckDB parses as POWER) is generated ONCE and shared "
    "verbatim: Spark replays it as 8 chained selectExpr stages "
    "(map-only, whole-stage codegen), the oracle as 8 chained CTEs. "
    "Emits the per-file-bucket skipping manifest (row count, key "
    "extents, and the raw-dimension spans that prove locality)",
)
def layout_hilbert(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    df = orders.selectExpr(
        "o_orderkey",
        f"CAST(o_custkey % {_HIL_N} AS BIGINT) AS x",
        f"CAST(CAST(round(o_totalprice * 100) AS BIGINT) % {_HIL_N}"
        " AS BIGINT) AS y",
        f"CAST(o_custkey % {_HIL_N} AS BIGINT) AS x0",
        f"CAST(CAST(round(o_totalprice * 100) AS BIGINT) % {_HIL_N}"
        " AS BIGINT) AS y0",
        "CAST(0 AS BIGINT) AS d",
    )
    s = _HIL_N // 2
    while s > 0:
        exprs = _hilbert_stage_exprs(s, "o_orderkey")
        df = df.selectExpr(exprs[0], "x0", "y0", *exprs[1:])
        s //= 2
    return df.groupBy(
        F.expr("CAST(d >> 9 AS BIGINT)").alias("file_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("d").cast("bigint").alias("hmin"),
        F.max("d").cast("bigint").alias("hmax"),
        (F.max("x0") - F.min("x0")).cast("bigint").alias("x_span"),
        (F.max("y0") - F.min("y0")).cast("bigint").alias("y_span"),
    )
