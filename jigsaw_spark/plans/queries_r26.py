"""Round-6 batch 3: VARIANT semi-structured access, table fingerprints,
clustering coefficients, and dynamic partition pruning —

- ``fn_variant_agg``: Spark 4's VARIANT type surface — ``parse_json`` →
  ``variant_get``/``try_variant_get`` path extraction with typed casts,
  aggregated per event type; the open-schema JSON path that keeps
  extraction JVM-side (no per-row Python, no rigid schema).
- ``dq_table_checksum``: order-insensitive exact row-set fingerprints
  (md5-int48 key hashes summed in decimal, reduced mod 2^61) for every
  table — the migration/replication validation primitive: two engines
  or two copies agree iff (n_rows, checksum) agree per table.
- ``graph_clustering_coeff``: per-node local clustering coefficient
  2T/(d(d-1)) in integer micro-units over the MinHash-LSH candidate
  graph — completes the triangle diagnostic into the standard
  cluster-vs-chain score.
- ``j13_dpp_join``: dynamic partition pruning — the fact table written
  partitioned-by-key into the warehouse, joined against a filtered dim:
  Spark injects a runtime partition filter so unselected partitions are
  never read (asserted from the physical plan in tests). Results equal
  the plain filtered aggregate (the oracle), only the scan differs.

Float discipline: NO doubles in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# fn_variant
# ---------------------------------------------------------------------------

_VARIANT_SQL = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
           CAST(min(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS min_k,
           CAST(max(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN json_extract(props, '$.absent') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events GROUP BY event_type
"""


@register(
    "fn_variant_agg",
    _VARIANT_SQL,
    "Spark 4 VARIANT surface: parse_json once per row, then "
    "variant_get('$.k', 'long') typed path extraction and "
    "try_variant_get for an absent path (NULL, no error) — the "
    "open-schema semi-structured access that stays fully JVM-side "
    "(shredded binary encoding, no per-row Python, no fixed schema "
    "declaration), aggregated per event type. Oracle = DuckDB "
    "json_extract on the same paths",
)
def fn_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    absent = F.try_variant_get(v, "$.absent", "long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.sum(F.when(absent.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing"),
    )


# ---------------------------------------------------------------------------
# dq_table_checksum
# ---------------------------------------------------------------------------

_CK_MOD = 2_305_843_009_213_693_952  # 2^61 — headroom below int64 max

# (table, engine-shared key expression) — the key string is the row's
# IDENTITY for fingerprinting (multiset semantics: duplicate keys hash
# identically and sum twice, so repeated (orderkey, linenumber) pairs in
# the synthetic lineitem still fingerprint deterministically)
_CK_KEYS = [
    ("region", "'r|' || CAST(r_regionkey AS STRING)"),
    ("nation", "'n|' || CAST(n_nationkey AS STRING)"),
    ("customer", "'c|' || CAST(c_custkey AS STRING)"),
    ("supplier", "'s|' || CAST(s_suppkey AS STRING)"),
    ("part", "'p|' || CAST(p_partkey AS STRING)"),
    ("orders", "'o|' || CAST(o_orderkey AS STRING)"),
    (
        "lineitem",
        "'l|' || CAST(l_orderkey AS STRING) || '|' "
        "|| CAST(l_linenumber AS STRING)",
    ),
    ("events", "'e|' || CAST(event_id AS STRING)"),
    ("documents", "'d|' || CAST(doc_id AS STRING)"),
    ("embeddings", "'v|' || CAST(vec_id AS STRING)"),
]


def _checksum_sql() -> str:
    parts = []
    for tbl, key in _CK_KEYS:
        duck_key = key.replace(" AS STRING", " AS VARCHAR")
        parts.append(
            f"""
    SELECT '{tbl}' AS tbl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(('0x' || substr(md5({duck_key}), 1, 12))::UBIGINT)
                % {_CK_MOD} AS BIGINT) AS key_checksum
    FROM {tbl}"""
        )
    return " UNION ALL ".join(parts)


@register(
    "dq_table_checksum",
    _checksum_sql(),
    "order-insensitive exact table fingerprints: per table, row count + "
    "the sum of md5-int48 key hashes in decimal(38,0), reduced mod 2^61 "
    "— integer addition commutes, so the checksum is identical under "
    "ANY partitioning, engine, or row order, and two copies of a table "
    "agree iff (n_rows, checksum) agree: the migration/replication/"
    "backfill validation primitive (one map-side-combinable agg per "
    "table, no sort, no collect). Key strings are table-prefixed so "
    "cross-table id collisions cannot cancel",
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = []
    for tbl, key in _CK_KEYS:
        df = _t(spark, sf_dir, tbl)
        h = F.expr(
            f"CAST(conv(substring(md5({key}), 1, 12), 16, 10) "
            "AS DECIMAL(38,0))"
        )
        frames.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.expr(
                    f"CAST(sum(CAST(conv(substring(md5({key}), 1, 12), 16, 10)"
                    f" AS DECIMAL(38,0))) % {_CK_MOD} AS BIGINT)"
                ).alias("key_checksum"),
            ).select(F.lit(tbl).alias("tbl"), "n_rows", "key_checksum")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# graph_clustering_coeff
# ---------------------------------------------------------------------------


def _coeff_sql() -> str:
    from jigsaw_spark.plans.queries_r7 import _lsh_edges_cte

    return f"""
    WITH {_lsh_edges_cte()},
    tri AS (
      SELECT p1.a AS a, p1.b AS b, p2.b AS c
      FROM pairs p1
      JOIN pairs p2 ON p2.a = p1.b
      JOIN pairs p3 ON p3.a = p1.a AND p3.b = p2.b),
    tcnt AS (
      SELECT node, count(*) AS n_tri
      FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node),
    deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src)
    SELECT deg.node,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
           CAST(2 * coalesce(t.n_tri, 0) * 1000000
                // (deg.d * (deg.d - 1)) AS BIGINT) AS coeff_micro
    FROM deg LEFT JOIN tcnt t ON deg.node = t.node
    WHERE deg.d >= 2
"""


@register(
    "graph_clustering_coeff",
    _coeff_sql(),
    "local clustering coefficient 2T/(d(d-1)) per node (integer micro) "
    "over the MinHash-LSH candidate graph — near 1e6 the node sits in "
    "a duplicate CLIQUE (safe to collapse wholesale), near 0 it chains "
    "borderline collisions (keep pairwise verification). Triangles use "
    "the canonical a<b<c compact-forward enumeration (fan-out bounded "
    "by LSH-capped candidate degree); ONE pair list localCheckpoint "
    "feeds both the triangle joins and the degree agg",
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    p = (
        minhash_lsh_pairs(docs, "doc_id", num_hashes=16, bands=4)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint()
    )
    ab_bc = (
        p.alias("p1")
        .join(p.alias("p2"), F.col("p1.b") == F.col("p2.a"))
        .select(
            F.col("p1.a").alias("a"),
            F.col("p1.b").alias("b"),
            F.col("p2.b").alias("c"),
        )
    )
    p3 = p.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = ab_bc.join(
        p3,
        (ab_bc["a"] == p3["ta"]) & (ab_bc["c"] == p3["tc"]),
        "left_semi",
    )
    tcnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    edges = p.select(F.col("a").alias("node")).unionAll(
        p.select(F.col("b").alias("node"))
    )
    deg = edges.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    return (
        deg.filter(F.col("d") >= 2)
        .join(tcnt, "node", "left_outer")
        .select(
            "node",
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_tri"),
            F.expr(
                "CAST(2 * coalesce(n_tri, 0) * 1000000 "
                "div (d * (d - 1)) AS BIGINT)"
            ).alias("coeff_micro"),
        )
    )


# ---------------------------------------------------------------------------
# j13_dpp_join
# ---------------------------------------------------------------------------

_DPP_SQL = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY event_type
"""


@register(
    "j13_dpp_join",
    _DPP_SQL,
    "dynamic partition pruning: events written PARTITIONED BY "
    "(event_type) into the warehouse, then joined to a dim filtered to "
    "2 of 5 types — Spark injects a dynamicpruning subquery into the "
    "fact scan's PartitionFilters, so the 3 unselected partitions are "
    "never read (tests/test_r26_ops.py asserts it from the physical "
    "plan). At 100 TB this is the standard star-schema accelerator: "
    "the dim filter prunes fact IO at PLANNING-result time instead of "
    "scanning everything into the join. Results = the plain filtered "
    "aggregate (the oracle); only the scan differs. Same stale-dir "
    "Hadoop-FS cleanup discipline as j11 — and the same SINGLE-WRITER "
    "assumption: the managed table name is fixed, so two concurrent "
    "SESSIONS running this query race on the warehouse dir (the "
    "driver's serial gate never does; don't run two local gates at "
    "once — measured as a chmod-on-missing-temp-file task failure "
    "when pytest and verify_oracle overlapped, r10)",
)
def j13_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    tbl = "j13_events_part"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    loc = jvm.org.apache.hadoop.fs.Path(warehouse.rstrip("/") + "/" + tbl)
    fs = loc.getFileSystem(hconf)
    if fs.exists(loc) and not fs.delete(loc, True):
        raise RuntimeError(
            f"could not remove stale managed-table location {loc}"
        )
    (
        ev.select(
            "event_id",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
            "event_type",
        )
        .write.partitionBy("event_type")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(tbl)
    )
    fact = spark.table(tbl)
    dim = (
        ev.select("event_type")
        .distinct()
        .filter(F.col("event_type").isin("view", "purchase"))
    )
    return (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )
