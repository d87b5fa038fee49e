"""Round-5 batch 15: synthetic-text watermark detection and
equi-depth statistics —

- ``text_watermark_detect``: greenlist watermark detection
  (Kirchenbauer et al. 2023 style): each bigram's "green" membership
  is a seeded hash parity of the (prev, token) pair, natural text
  lands at ~50% green, watermarked text is biased high — the z-score
  (2g - n)/sqrt(n) flags it. The detector every synthetic-data
  filter now needs; counts are exact integers, the z is one shared
  snapped expression.
- ``agg_equidepth_hist``: 8-bucket equi-depth histogram boundaries
  per event type (values at ranks ceil(i*n/8)) — the ANALYZE
  statistics every cost-based optimizer keeps, as one conditional-min
  agg over the distinct-value cumulative dim (the nearest-rank
  percentile machinery generalized to a boundary vector).

Float discipline: the only double is the watermark z — exact integer
numerator over IEEE sqrt(n), round-snapped 9-then-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register
from jigsaw_spark.operators.text import tokens_sql

# ---------------------------------------------------------------------------
# text_watermark_detect
# ---------------------------------------------------------------------------

_WM_SQL = f"""
    WITH toks AS (
      SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
    bg AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(t[i] || '|' || t[i+1] || '|wm'),
                                       1, 2))::UBIGINT % 2 = 0
                  THEN 1 ELSE 0 END AS green
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) ii
      WHERE len(t) >= 2),
    agg AS (
      SELECT doc_id, count(*) AS n, sum(green) AS g
      FROM bg GROUP BY doc_id)
    SELECT doc_id, CAST(n AS BIGINT) AS n_bigrams,
           CAST(g AS BIGINT) AS n_green,
           round(round(CAST(2 * g - n AS DOUBLE)
                       / sqrt(CAST(n AS DOUBLE)), 9), 4) AS z
    FROM agg
"""


@register(
    "text_watermark_detect",
    _WM_SQL,
    "greenlist watermark detector (Kirchenbauer et al. 2023 style) "
    "for synthetic-text screening: each bigram is 'green' when the "
    "seeded hash parity of (prev, token) says so, so natural text "
    "sits at ~50% green and generator-biased text scores high; z = "
    "(2g - n)/sqrt(n) is the standard one-proportion test. Counts "
    "are exact integers from one gram explode + hash agg (the NB/"
    "DSIR shape); the z is ONE shared expression (IEEE sqrt, "
    "round-snapped 9-then-4). Docs below 2 tokens are excluded by "
    "construction",
)
def text_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr("text").alias("t")).filter(
        F.size("t") >= 2
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(t, 1, size(t) - 1), (x, i) ->"
                " CASE WHEN conv(substring(md5(concat(x, '|', t[i + 1],"
                " '|wm')), 1, 2), 16, 10) % 2 = 0 THEN 1 ELSE 0 END)"
            )
        ).alias("green"),
    )
    agg = bg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("green").alias("g")
    )
    return agg.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_bigrams"),
        F.col("g").cast("bigint").alias("n_green"),
        F.round(
            F.round(
                (2 * F.col("g") - F.col("n")).cast("double")
                / F.sqrt(F.col("n").cast("double")),
                9,
            ),
            4,
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# agg_equidepth_hist
# ---------------------------------------------------------------------------

_EDH_SQL = """
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
           CAST(min(CASE WHEN cc >= (1 * n + 7) // 8 THEN cents END)
                AS BIGINT) AS b1,
           CAST(min(CASE WHEN cc >= (2 * n + 7) // 8 THEN cents END)
                AS BIGINT) AS b2,
           CAST(min(CASE WHEN cc >= (3 * n + 7) // 8 THEN cents END)
                AS BIGINT) AS b3,
           CAST(min(CASE WHEN cc >= (4 * n + 7) // 8 THEN cents END)
                AS BIGINT) AS b4,
           CAST(min(CASE WHEN cc >= (5 * n + 7) // 8 THEN cents END)
                AS BIGINT) AS b5,
           CAST(min(CASE WHEN cc >= (6 * n + 7) // 8 THEN cents END)
                AS BIGINT) AS b6,
           CAST(min(CASE WHEN cc >= (7 * n + 7) // 8 THEN cents END)
                AS BIGINT) AS b7,
           CAST(min(CASE WHEN cc >= n THEN cents END) AS BIGINT) AS b8
    FROM cum GROUP BY event_type
"""


@register(
    "agg_equidepth_hist",
    _EDH_SQL,
    "8-bucket equi-depth histogram boundaries per event type — the "
    "ANALYZE statistics a cost-based optimizer keeps for selectivity "
    "estimation: boundary i is the value at rank ceil(i*n/8) "
    "(nearest-rank, pure integer selection, b8 = max). ONE "
    "conditional-min agg over the distinct-value cumulative dim — "
    "the exact-percentile machinery generalized to the boundary "
    "vector, no join, no floats, one fact scan",
)
def agg_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
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

    def b(i: int):
        return (
            F.min(
                F.when(
                    F.col("cc") >= F.expr(f"({i} * n + 7) div 8"),
                    F.col("cents"),
                )
            )
            .cast("bigint")
            .alias(f"b{i}")
        )

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"), *[b(i) for i in range(1, 9)]
    )
