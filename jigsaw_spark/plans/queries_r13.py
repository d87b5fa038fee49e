"""Round-5 batch 7: exact percentiles, multivariate OLS, negative
sampling, key discovery, and class rebalancing —

- ``agg_percentile_exact``: nearest-rank p25/p50/p75 per group — the
  EXACT percentile definition (value at rank ceil(p*n/100)), a pure
  integer selection over the distinct-value cumulative dim, no
  interpolation and hence no floats.
- ``ml_ols_2feature``: per-group TWO-feature closed-form OLS via the
  2x2 normal equations — determinant and coefficient numerators in
  exact decimal(38,0)/HUGEINT arithmetic over anchor-centered
  integers, coefficients emitted as truncated-division micro-units
  (the tdiv discipline). Extends the single-feature grouped OLS.
- ``p_negative_sampling``: deterministic contrastive negative
  sampling — k hash-drawn negatives per document with self-collisions
  filtered, the sampler every embedding/contrastive trainer needs,
  reproducible on any cluster.
- ``dq_uniqueness_keys``: candidate-key discovery (Deequ uniqueness
  check) — exact distinct counts for four key combinations in one
  scan each, with the row-tuple distinct (injective, no separator
  ambiguity).
- ``p_class_balance_resample``: exact oversampling to the majority
  class size — every class replicates floor(target/n) times plus one
  extra copy for the md5-first remainder docs, landing EXACTLY on
  target per class (vs the jitter of probabilistic oversampling).

Float discipline: NO doubles in this module; percentile values, OLS
coefficients, and replication counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.functions.hashing import md5_key, md5_key_sql
from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# agg_percentile_exact
# ---------------------------------------------------------------------------

_PCT_SQL = """
    WITH g AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             count(*) AS c
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, cents,
             sum(c) OVER (PARTITION BY event_type ORDER BY cents) AS cc,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM g)
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(min(CASE WHEN cc >= (25 * n + 99) // 100 THEN cents END)
                AS BIGINT) AS p25_cents,
           CAST(min(CASE WHEN cc >= (50 * n + 99) // 100 THEN cents END)
                AS BIGINT) AS p50_cents,
           CAST(min(CASE WHEN cc >= (75 * n + 99) // 100 THEN cents END)
                AS BIGINT) AS p75_cents
    FROM cum GROUP BY event_type
"""


@register(
    "agg_percentile_exact",
    _PCT_SQL,
    "exact nearest-rank percentiles (p25/p50/p75) of value-cents per "
    "event type: the value at rank ceil(p*n/100) — a PURE INTEGER "
    "selection (no interpolation, no floats) over the distinct-value "
    "cumulative dim, so results are bit-identical at any partitioning. "
    "Shape: one hash agg to the |distinct cents| dim, one partitioned "
    "prefix window, then ONE conditional-min agg emits all three "
    "percentiles wide (no join, no nested loop) — the fact table is "
    "scanned once. The exact companion to the approx-percentile "
    "sketches",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    cum = g.select(
        "event_type",
        "cents",
        F.sum("c").over(w).alias("cc"),
        F.sum("c").over(Window.partitionBy("event_type")).alias("n"),
    )
    def pick(p: int):
        return (
            F.min(
                F.when(
                    F.col("cc") >= F.expr(f"({p} * n + 99) div 100"),
                    F.col("cents"),
                )
            )
            .cast("bigint")
            .alias(f"p{p}_cents")
        )

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"), pick(25), pick(50), pick(75)
    )


# ---------------------------------------------------------------------------
# ml_ols_2feature
# ---------------------------------------------------------------------------

# truncated division toward zero with a positive divisor — Spark's `div`
# already truncates; DuckDB `//` floors, so the oracle needs the CASE form
# (the tdiv discipline from the exact-iterative quartet).
_TDIV = "CASE WHEN {x} >= 0 THEN {x} // {d} ELSE -((-({x})) // {d}) END"

_OLS2_SQL = f"""
    WITH pts AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_quantity, 0) AS BIGINT) AS x1,
             CAST(round(l_discount * 100, 0) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
      FROM lineitem),
    anchors AS MATERIALIZED (
      SELECT grp, count(*) AS n,
             CAST(sum(x1) AS BIGINT) // count(*) AS m1,
             CAST(sum(x2) AS BIGINT) // count(*) AS m2,
             CAST(sum(y) AS BIGINT) // count(*) AS my
      FROM pts GROUP BY grp),
    c AS (
      SELECT p.grp, a.n, a.m1, a.m2, a.my,
             p.x1 - a.m1 AS u, p.x2 - a.m2 AS v, p.y - a.my AS d
      FROM pts p JOIN anchors a ON p.grp = a.grp),
    m AS (
      SELECT grp, any_value(n) AS n,
             any_value(m1) AS m1, any_value(m2) AS m2,
             any_value(my) AS my,
             CAST(sum(u * u) AS HUGEINT) AS suu,
             CAST(sum(v * v) AS HUGEINT) AS svv,
             CAST(sum(u * v) AS HUGEINT) AS suv,
             CAST(sum(u * d) AS HUGEINT) AS suy,
             CAST(sum(v * d) AS HUGEINT) AS svy
      FROM c GROUP BY grp),
    sol AS (
      SELECT grp, n, m1, m2, my,
             suu * svv - suv * suv AS det,
             (suy * svv - svy * suv) * 1000000 AS n1,
             (svy * suu - suy * suv) * 1000000 AS n2
      FROM m)
    SELECT grp AS l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN det > 0
                     THEN {_TDIV.format(x='n1', d='det')}
                     ELSE 0 END AS BIGINT) AS b1_micro,
           CAST(CASE WHEN det > 0
                     THEN {_TDIV.format(x='n2', d='det')}
                     ELSE 0 END AS BIGINT) AS b2_micro,
           CAST(my * 1000000
                - CASE WHEN det > 0
                       THEN {_TDIV.format(x='n1', d='det')} ELSE 0 END * m1
                - CASE WHEN det > 0
                       THEN {_TDIV.format(x='n2', d='det')} ELSE 0 END * m2
                AS BIGINT) AS b0_micro
    FROM sol
"""


@register(
    "ml_ols_2feature",
    _OLS2_SQL,
    "per-group TWO-feature closed-form OLS (price-cents ~ quantity + "
    "discount-pct per return flag) via the 2x2 normal equations on "
    "ANCHOR-CENTERED integers: group means snap to integers by floor "
    "division, centered moments accumulate in decimal(38,0)/HUGEINT "
    "(exact, order-independent), and coefficients are Cramer-rule "
    "ratios emitted as truncated-division micro-units — the tdiv "
    "discipline, so Spark div and the DuckDB CASE form agree on "
    "negatives. Degenerate groups (det<=0) emit 0. ONE moment agg per "
    "group after one fact scan — the multivariate extension of "
    "ml_linreg_by_group",
)
def ml_ols_2feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round("l_quantity", 0).cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
    )
    anchors = pts.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(x1) AS BIGINT) div count(*)").alias("m1"),
        F.expr("CAST(sum(x2) AS BIGINT) div count(*)").alias("m2"),
        F.expr("CAST(sum(y) AS BIGINT) div count(*)").alias("my"),
    )
    c = pts.join(F.broadcast(anchors), "grp").select(
        "grp",
        "n",
        "m1",
        "m2",
        "my",
        (F.col("x1") - F.col("m1")).alias("u"),
        (F.col("x2") - F.col("m2")).alias("v"),
        (F.col("y") - F.col("my")).alias("d"),
    )
    dec = "decimal(38,0)"
    m = c.groupBy("grp").agg(
        F.first("n").alias("n"),
        F.first("m1").alias("m1"),
        F.first("m2").alias("m2"),
        F.first("my").alias("my"),
        F.sum((F.col("u") * F.col("u")).cast(dec)).alias("suu"),
        F.sum((F.col("v") * F.col("v")).cast(dec)).alias("svv"),
        F.sum((F.col("u") * F.col("v")).cast(dec)).alias("suv"),
        F.sum((F.col("u") * F.col("d")).cast(dec)).alias("suy"),
        F.sum((F.col("v") * F.col("d")).cast(dec)).alias("svy"),
    )
    sol = m.select(
        "grp",
        "n",
        "m1",
        "m2",
        "my",
        (F.col("suu") * F.col("svv") - F.col("suv") * F.col("suv")).alias(
            "det"
        ),
        (
            (F.col("suy") * F.col("svv") - F.col("svy") * F.col("suv"))
            * F.lit(1000000).cast(dec)
        ).alias("n1"),
        (
            (F.col("svy") * F.col("suu") - F.col("suy") * F.col("suv"))
            * F.lit(1000000).cast(dec)
        ).alias("n2"),
    )
    b1 = F.expr("CASE WHEN det > 0 THEN n1 div det ELSE 0 END")
    b2 = F.expr("CASE WHEN det > 0 THEN n2 div det ELSE 0 END")
    return sol.select(
        F.col("grp").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n"),
        b1.cast("bigint").alias("b1_micro"),
        b2.cast("bigint").alias("b2_micro"),
        (
            F.col("my") * 1000000
            - b1.cast("bigint") * F.col("m1")
            - b2.cast("bigint") * F.col("m2")
        )
        .cast("bigint")
        .alias("b0_micro"),
    )


# ---------------------------------------------------------------------------
# p_negative_sampling
# ---------------------------------------------------------------------------

_NEG_K = 4
_NEG_CAND = 6

_NEG_SQL = f"""
    WITH nn AS (SELECT count(*) AS n, max(doc_id) AS mx FROM documents),
    cand AS (
      SELECT d.doc_id, i,
             CAST(('0x' || substr(
                md5(concat_ws('|', 'negsamp', CAST(d.doc_id AS VARCHAR),
                              CAST(i AS VARCHAR))), 1, 12))::UBIGINT
               % CAST(nn.mx + 1 AS UBIGINT) AS BIGINT) AS neg_id
      FROM documents d
      CROSS JOIN (SELECT unnest(range({_NEG_CAND})) AS i) ii
      CROSS JOIN nn),
    valid AS (
      SELECT doc_id, neg_id, min(i) AS first_i
      FROM cand WHERE neg_id <> doc_id
      GROUP BY doc_id, neg_id),
    ranked AS (
      SELECT doc_id, neg_id,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY first_i, neg_id) AS neg_rank
      FROM valid)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(neg_rank AS INT) AS neg_rank,
           CAST(neg_id AS BIGINT) AS neg_id
    FROM ranked WHERE neg_rank <= {_NEG_K}
"""


@register(
    "p_negative_sampling",
    _NEG_SQL,
    "deterministic contrastive negative sampling: 4 negatives per "
    "document drawn from the md5 stream modulo the id space, self-"
    "collisions filtered, duplicates collapsed to their first draw, "
    "rank total on (draw index, id) — the reproducible sampler every "
    "contrastive/embedding trainer needs (6 candidate draws make 4 "
    "survivors overwhelmingly certain; the rank window caps at k "
    "regardless). Map-only candidate generation against a 1-row "
    "broadcast id-space scalar; the dedup agg and rank window "
    "partition per document. Note: ids here are dense, so modulo maps "
    "onto real docs — sparse id spaces would route through a "
    "zipWithIndex-style dense rank dim first",
)
def p_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    nn = docs.agg(F.max("doc_id").alias("mx"))
    cand = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_CAND - 1))).alias("i"),
            "mx",
        )
        .select(
            "doc_id",
            "i",
            F.pmod(
                F.conv(
                    F.substring(
                        md5_key(
                            F.col("doc_id"), F.col("i"), seed="negsamp"
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.col("mx") + 1,
            ).alias("neg_id"),
        )
    )
    valid = (
        cand.filter(F.col("neg_id") != F.col("doc_id"))
        .groupBy("doc_id", "neg_id")
        .agg(F.min("i").alias("first_i"))
    )
    ranked = valid.withColumn(
        "neg_rank",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("first_i", "neg_id")
        ),
    ).filter(F.col("neg_rank") <= _NEG_K)
    return ranked.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("neg_rank").cast("int").alias("neg_rank"),
        F.col("neg_id").cast("bigint").alias("neg_id"),
    )


# ---------------------------------------------------------------------------
# dq_uniqueness_keys
# ---------------------------------------------------------------------------

_UNIQ_SQL = """
    WITH a AS (
      SELECT count(*) AS n,
             count(DISTINCT l_orderkey) AS d1,
             count(DISTINCT (l_orderkey, l_linenumber)) AS d2,
             count(DISTINCT (l_partkey, l_suppkey)) AS d3,
             count(DISTINCT (l_orderkey, l_partkey, l_suppkey)) AS d4
      FROM lineitem)
    SELECT key_name, n_rows, n_distinct,
           CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS INT)
             AS is_unique
    FROM (
      SELECT 'l_orderkey' AS key_name, CAST(n AS BIGINT) AS n_rows,
             CAST(d1 AS BIGINT) AS n_distinct FROM a
      UNION ALL
      SELECT 'l_orderkey,l_linenumber', CAST(n AS BIGINT),
             CAST(d2 AS BIGINT) FROM a
      UNION ALL
      SELECT 'l_partkey,l_suppkey', CAST(n AS BIGINT),
             CAST(d3 AS BIGINT) FROM a
      UNION ALL
      SELECT 'l_orderkey,l_partkey,l_suppkey', CAST(n AS BIGINT),
             CAST(d4 AS BIGINT) FROM a) t
"""


@register(
    "dq_uniqueness_keys",
    _UNIQ_SQL,
    "candidate-key discovery (the Deequ uniqueness check): exact "
    "distinct counts for four key combinations of lineitem vs the row "
    "count, unpivoted to a per-key report with an is_unique verdict. "
    "Tuple-distinct (count(DISTINCT struct)) is injective by "
    "construction — no separator-ambiguity class (the snapshot_diff "
    "lesson). One scan computes all four; at production scale each "
    "distinct is its own partial-agg shuffle on the key",
)
def dq_uniqueness_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("d1"),
        F.countDistinct("l_orderkey", "l_linenumber").alias("d2"),
        F.countDistinct("l_partkey", "l_suppkey").alias("d3"),
        F.countDistinct("l_orderkey", "l_partkey", "l_suppkey").alias("d4"),
    )
    return a.selectExpr(
        """stack(4,
             'l_orderkey', CAST(n AS BIGINT), CAST(d1 AS BIGINT),
             'l_orderkey,l_linenumber', CAST(n AS BIGINT),
               CAST(d2 AS BIGINT),
             'l_partkey,l_suppkey', CAST(n AS BIGINT), CAST(d3 AS BIGINT),
             'l_orderkey,l_partkey,l_suppkey', CAST(n AS BIGINT),
               CAST(d4 AS BIGINT)
           ) AS (key_name, n_rows, n_distinct)"""
    ).selectExpr(
        "key_name",
        "n_rows",
        "n_distinct",
        "CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS INT)"
        " AS is_unique",
    )


# ---------------------------------------------------------------------------
# p_class_balance_resample
# ---------------------------------------------------------------------------

_CBR_SQL = f"""
    WITH cls AS MATERIALIZED (
      SELECT lang, count(*) AS nc FROM documents GROUP BY lang),
    tgt AS (SELECT max(nc) AS target FROM cls),
    ranked AS (
      SELECT d.doc_id, d.lang, c.nc, t.target,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY {md5_key_sql(['d.doc_id'], seed='cbr')}, d.doc_id)
               AS rn
      FROM documents d
      JOIN cls c ON d.lang = c.lang
      CROSS JOIN tgt t),
    reps AS (
      SELECT doc_id, lang, nc, target,
             target // nc
               + CASE WHEN rn <= target % nc THEN 1 ELSE 0 END AS n_rep
      FROM ranked),
    outp AS (
      SELECT lang, doc_id,
             unnest(range(1, n_rep + 1)) AS copy_id
      FROM reps WHERE n_rep >= 1)
    SELECT lang, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(copy_id AS INT) AS copy_id
    FROM outp
"""


@register(
    "p_class_balance_resample",
    _CBR_SQL,
    "exact class-balance oversampling to the majority class size: "
    "every class replicates floor(target/n_c) times, and the md5-"
    "first (target mod n_c) docs get one extra copy — so every class "
    "lands EXACTLY on target rows (deterministic, vs probabilistic "
    "oversampling's binomial jitter), the imbalanced-training-set fix "
    "with reproducible membership. Shape: class counts are a "
    "broadcast dim, the remainder rank window partitions per class, "
    "replication is one bounded explode (fan-out = target/n_c). The "
    "classifier-side twin of the temperature-mixture sampler",
)
def p_class_balance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    cls = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nc"))
    tgt = cls.agg(F.max("nc").alias("target"))
    ranked = (
        docs.select("doc_id", "lang")
        .join(F.broadcast(cls), "lang")
        .crossJoin(F.broadcast(tgt))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(
                    md5_key(F.col("doc_id"), seed="cbr"), "doc_id"
                )
            ),
        )
    )
    reps = ranked.select(
        "lang",
        "doc_id",
        (
            F.expr("target div nc")
            + F.when(F.col("rn") <= F.expr("target % nc"), 1).otherwise(0)
        ).alias("n_rep"),
    ).filter(F.col("n_rep") >= 1)
    return reps.select(
        "lang",
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(F.sequence(F.lit(1), F.col("n_rep"))).alias("copy_id"),
    ).withColumn("copy_id", F.col("copy_id").cast("int"))
