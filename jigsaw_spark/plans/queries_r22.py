"""Round-5 batch 16: leakage-safe splitting and rule audits —

- ``p_leakage_safe_split``: near-dup-aware train/test split — every
  document inherits the fold of its duplicate-cluster keeper (SimHash
  connected components), so near-duplicates can NEVER straddle the
  train/test boundary; the split-contamination fix that per-doc
  hashing cannot provide. Singletons are their own keeper.
- ``dq_rule_violations``: the dbt-style declarative rule audit — four
  cross-field/domain rules evaluated in ONE scan each with violation
  counts and rates; the contract layer every ingest runs.

Float discipline: NO doubles in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.functions.hashing import md5_key, md5_key_sql
from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# p_leakage_safe_split
# ---------------------------------------------------------------------------


def _lss_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _SIMHASH_CTE

    return f"""
    WITH RECURSIVE {_SIMHASH_CTE},
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp AS MATERIALIZED (
      SELECT u AS doc_id, least(u, min(v)) AS keeper
      FROM reach GROUP BY u),
    assigned AS (
      SELECT d.doc_id,
             coalesce(c.keeper, d.doc_id) AS keeper
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
    SELECT doc_id, CAST(keeper AS BIGINT) AS keeper,
           CASE WHEN ('0x' || substr(
                  {md5_key_sql(['keeper'], seed='lss')}, 1, 12))::UBIGINT
                  % 10 < 8
                THEN 'train' ELSE 'test' END AS split
    FROM assigned
"""


@register(
    "p_leakage_safe_split",
    _lss_sql(),
    "near-dup-aware 80/20 train/test split: every document inherits "
    "the split of its duplicate-cluster KEEPER (min doc id of its "
    "SimHash connected component; singletons keep themselves), so "
    "near-duplicates can never straddle the boundary — the "
    "split-contamination fix per-doc hashing cannot provide (a doc "
    "and its near-copy hash independently). Split is the md5 stream "
    "of the KEEPER id (8/10 train). Composes the components operator "
    "+ one left join + map-only assignment; the split remains stable "
    "as clusters grow (keeper = min id is monotone under unions). "
    "Spark runs the graph EXACT-DEDUP-FIRST (r6 scale fix): byte-"
    "identical copies collapse before SimHash pairing, so duplication "
    "can never densify the pair graph into x|copies|² cliques (the "
    "15.6x probe). Result-identical to the oracle's all-docs graph: "
    "exact dups share a signature, so every edge through a dup is "
    "mirrored through its keeper, components and minima are unchanged.",
)
def p_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import near_dup_keepers

    docs = _t(spark, sf_dir, "documents")
    assigned = near_dup_keepers(docs, "doc_id")
    return assigned.select(
        "doc_id",
        F.col("keeper").cast("bigint").alias("keeper"),
        F.when(
            F.pmod(
                F.conv(
                    F.substring(md5_key(F.col("keeper"), seed="lss"), 1, 12),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(10),
            )
            < 8,
            "train",
        )
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# dq_rule_violations
# ---------------------------------------------------------------------------

_RULES_SQL = """
    WITH li AS (
      SELECT l_quantity, l_discount, l_tax, l_extendedprice, l_shipdate
      FROM lineitem),
    a AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                      THEN 1 ELSE 0 END) AS v_qty,
             sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                      THEN 1 ELSE 0 END) AS v_disc,
             sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
               AS v_price,
             sum(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                       OR l_shipdate >= TIMESTAMP '1999-01-01'
                      THEN 1 ELSE 0 END) AS v_date
      FROM li)
    SELECT rule, n_rows, n_violations,
           CAST(n_violations * 1000000 // n_rows AS BIGINT) AS rate_micro,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT)
             AS passes
    FROM (
      SELECT 'quantity_in_1_50' AS rule, CAST(n AS BIGINT) AS n_rows,
             CAST(v_qty AS BIGINT) AS n_violations FROM a
      UNION ALL
      SELECT 'discount_in_0_10pct', CAST(n AS BIGINT),
             CAST(v_disc AS BIGINT) FROM a
      UNION ALL
      SELECT 'price_positive', CAST(n AS BIGINT),
             CAST(v_price AS BIGINT) FROM a
      UNION ALL
      SELECT 'shipdate_in_range', CAST(n AS BIGINT),
             CAST(v_date AS BIGINT) FROM a) t
"""


@register(
    "dq_rule_violations",
    _RULES_SQL,
    "declarative rule audit (the dbt-test / Deequ-constraint layer): "
    "four domain/cross-field rules on lineitem — quantity in [1,50], "
    "discount in [0, 0.1], positive price, shipdate in the valid "
    "window — evaluated in ONE conditional aggregate and unpivoted to "
    "a per-rule report with violation counts, micro rates, and a "
    "pass flag. The ingest contract every pipeline runs before "
    "publishing a partition",
)
def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
            ).otherwise(0)
        ).alias("v_qty"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1
            ).otherwise(0)
        ).alias("v_disc"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias(
            "v_price"
        ),
        F.sum(
            F.when(
                (F.col("l_shipdate") < F.lit("1992-01-01").cast("timestamp"))
                | (
                    F.col("l_shipdate")
                    >= F.lit("1999-01-01").cast("timestamp")
                ),
                1,
            ).otherwise(0)
        ).alias("v_date"),
    )
    return a.selectExpr(
        """stack(4,
             'quantity_in_1_50', CAST(n AS BIGINT), CAST(v_qty AS BIGINT),
             'discount_in_0_10pct', CAST(n AS BIGINT),
               CAST(v_disc AS BIGINT),
             'price_positive', CAST(n AS BIGINT), CAST(v_price AS BIGINT),
             'shipdate_in_range', CAST(n AS BIGINT), CAST(v_date AS BIGINT)
           ) AS (rule, n_rows, n_violations)"""
    ).selectExpr(
        "rule",
        "n_rows",
        "n_violations",
        "CAST(n_violations * 1000000 div n_rows AS BIGINT) AS rate_micro",
        "CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT)"
        " AS passes",
    )
