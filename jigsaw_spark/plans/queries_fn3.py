"""Scalar/array/conditional function surface + value-window suite.

The reference's scalar usage is thin (SURVEY §2.7: prefix/suffix tests,
path concat, division, modulo — `jigsaw/io_utils.py:121,149,248,381-384`,
`jigsaw/models/bbox/model.py:334-337`); the generalized engine exposes the
full built-in function surface. Each suite here pins a family of
`pyspark.sql.functions` against the DuckDB equivalents so the driver's
hash gate proves cross-engine semantics (not just "runs").

Cross-engine gotchas encoded below:
- DuckDB ``list_distinct``/``list_intersect`` do NOT preserve order →
  every array-set result is wrapped in a sort on both sides.
- Array elements hash via their string rendering → integer arrays only
  (float arrays differ in trailing-digit rendering).
- ``split_part``/``instr``/``translate``/``lpad`` agree exactly; regex
  functions are avoided here (Java vs RE2 dialect drift) — the regex
  surface is covered by fn_scalar with dialect-safe patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register


@register(
    "fn_strings",
    """
    SELECT c_custkey,
           split_part(c_name, '#', 2)             AS name_id,
           lpad(CAST(c_custkey % 1000 AS VARCHAR), 6, '0') AS padded,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
           reverse(left(c_name, 8))               AS rev8,
           instr(c_name, '#')                     AS uspos,
           repeat(right(c_mktsegment, 2), 2)      AS rep2,
           length(c_name) + length(c_mktsegment)  AS total_len,
           md5(c_name)                            AS name_md5
    FROM customer
    """,
    "string-function suite: split_part/lpad/translate/reverse/left/right/"
    "instr/repeat/length/md5 — all JVM-side, zero-shuffle projection",
)
def fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_id"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 6, "0").alias("padded"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_tr"),
        F.reverse(F.substring(F.col("c_name"), 1, 8)).alias("rev8"),
        F.instr(F.col("c_name"), "#").alias("uspos"),
        F.repeat(F.substring(F.col("c_mktsegment"), -2, 2), 2).alias("rep2"),
        (F.length("c_name") + F.length("c_mktsegment")).alias("total_len"),
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
    )


@register(
    "fn_arrays",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             list_sort(list(l_linenumber)) AS lines,
             list_sort(list_distinct(list(l_partkey % 100))) AS pk_mod
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           array_to_string(lines, ',')        AS lines_csv,
           len(lines)                         AS n_lines,
           array_to_string(lines[1:2], ',')   AS first2_csv,
           coalesce(list_position(lines, 3), 0) AS pos3,
           list_max(pk_mod)                   AS max_pk,
           coalesce(array_to_string(
                      list_sort(list_intersect(pk_mod, [0,1,2,3,4])), ','),
                    '')                       AS low_pk_csv,
           list_has_any(pk_mod, [97,98,99])   AS has_high
    FROM per_order
    """,
    "array-function suite over grouped collect: sort/distinct/slice/"
    "position/max/intersect/overlap — one shuffle (the groupBy), then "
    "pure JVM array kernels; arrays emitted as CSV strings (the driver's "
    "pandas canonicalizer cannot sort array-typed columns)",
)
def fn_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("lines"),
        F.sort_array(
            F.array_distinct(F.collect_list(F.col("l_partkey") % 100))
        ).alias("pk_mod"),
    )
    def _csv(c):
        return F.array_join(F.transform(c, lambda x: x.cast("string")), ",")

    return per_order.select(
        "l_orderkey",
        _csv(F.col("lines")).alias("lines_csv"),
        F.size("lines").alias("n_lines"),
        _csv(F.slice("lines", 1, 2)).alias("first2_csv"),
        F.array_position("lines", 3).alias("pos3"),
        F.array_max("pk_mod").alias("max_pk"),
        _csv(
            F.sort_array(
                F.array_intersect(
                    "pk_mod", F.array(*[F.lit(x) for x in range(5)])
                )
            )
        ).alias("low_pk_csv"),
        F.arrays_overlap(
            "pk_mod", F.array(F.lit(97), F.lit(98), F.lit(99))
        ).alias("has_high"),
    )


@register(
    "fn_conditional",
    """
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           least(round(c_acctbal, 2), 5000.0)    AS capped_bal,
           greatest(round(c_acctbal, 2), 0.0)    AS floored_bal,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'high' END                  AS bal_band,
           ifnull(nullif(c_nationkey, 0), -1)    AS nation_or_neg
    FROM customer
    """,
    "conditional/null surface: coalesce/nullif/least/greatest/CASE/ifnull "
    "— constant-folded, zero-shuffle projection",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal"), 2)
    return cust.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        F.least(bal, F.lit(5000.0)).alias("capped_bal"),
        F.greatest(bal, F.lit(0.0)).alias("floored_bal"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.ifnull(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nation_or_neg"
        ),
    )


@register(
    "w8_value_windows",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_key,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_key,
           lag(round(o_totalprice, 2), 1, 0.0) OVER w AS prev_price,
           lead(round(o_totalprice, 2), 1, -1.0) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "value-window suite: first/last/nth_value with explicit full frames "
    "(the default frame truncates last_value at the current row in both "
    "engines), lag/lead with defaults — one shuffle on the partition key",
)
def w8_value_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    price = F.round(F.col("o_totalprice"), 2)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(wfull).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_key"),
        F.lag(price, 1, 0.0).over(w).alias("prev_price"),
        F.lead(price, 1, -1.0).over(w).alias("next_price"),
    )


@register(
    "fn_regex",
    r"""
    SELECT c_custkey,
           regexp_extract(c_name, 'Customer#([0-9]+)', 1) AS cust_digits,
           len(regexp_extract_all(c_name, '[0-9]')) AS n_digits,
           regexp_matches(c_name, '^Customer#[0-9]+$') AS well_formed,
           regexp_replace(c_mktsegment, '[AEIOU]', '*', 'g') AS seg_masked
    FROM customer
    """,
    "regex surface with dialect-safe patterns (char classes + anchors, no "
    "lookaround): capture-group extract, match count, full-match test, "
    "global replace — zero-shuffle codegen projection",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), r"Customer#([0-9]+)", 1).alias(
            "cust_digits"
        ),
        F.size(F.regexp_extract_all(F.col("c_name"), F.lit("[0-9]"), 0)).alias(
            "n_digits"
        ),
        F.col("c_name").rlike(r"^Customer#[0-9]+$").alias("well_formed"),
        F.regexp_replace(F.col("c_mktsegment"), "[AEIOU]", "*").alias(
            "seg_masked"
        ),
    )


@register(
    "fn_null_order",
    """
    SELECT c_custkey, seg_null
    FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_null
          FROM customer)
    ORDER BY seg_null NULLS FIRST, c_custkey
    LIMIT 400
    """,
    "explicit null-ordering: NULLS FIRST sort + deterministic key "
    "tiebreak through a LIMIT — both engines must agree on the boundary",
)
def fn_null_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_null"),
        )
        .orderBy(F.col("seg_null").asc_nulls_first(), F.col("c_custkey").asc())
        .limit(400)
    )


@register(
    "fn_codec",
    """
    SELECT c_custkey,
           to_base64(c_name::BLOB)               AS name_b64,
           hex(c_mktsegment)                     AS seg_hex,
           from_base64(to_base64(c_name::BLOB))::VARCHAR AS roundtrip,
           length(to_base64(c_name::BLOB))       AS b64_len
    FROM customer
    """,
    "binary codec surface: base64 / hex / base64-roundtrip over UTF-8 "
    "bytes — the opaque-payload encoding path for multimodal columns; "
    "zero-shuffle projection",
)
def fn_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    name_bin = F.col("c_name").cast("binary")
    b64 = F.base64(name_bin)
    return cust.select(
        "c_custkey",
        b64.alias("name_b64"),
        F.hex(F.col("c_mktsegment").cast("binary")).alias("seg_hex"),
        F.unbase64(b64).cast("string").alias("roundtrip"),
        F.length(b64).alias("b64_len"),
    )
