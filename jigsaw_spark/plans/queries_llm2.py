"""LLM-pipeline batch 2: repetition filtering and benchmark contamination.

Two more first-class training-data curation operators (beyond the dedup /
similarity / text families in queries_llm.py), both standard steps in
large-corpus pipelines:

- **Repetition detection** (the Gopher/C4-style "repetitive document"
  rule): a document whose word n-grams are mostly duplicates of each
  other is boilerplate/spam; score = duplicate-3-gram fraction.
- **Benchmark contamination**: count how many of a document's distinct
  n-grams also occur in a held-out "benchmark" set; train/test overlap
  is measured by exactly this kind of n-gram collision join (the
  standard 8-13-gram overlap check, scaled down to 4-grams for the
  synthetic corpus).

Both are pure DataFrame compositions over the shared shingle kernel
(`operators/text.py` — same tokenizer the dedup family uses), with exact
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.operators.text import shingles_expr, shingles_sql, tokens_expr, tokens_sql
from jigsaw_spark.plans.queries import _t, register


# ---------------------------------------------------------------------------
# Repetition: duplicate word-3-gram fraction per document. Shuffle-free —
# the whole score is higher-order array functions folded into the scan
# projection (shingles → distinct → sizes), no explode, no groupBy.
# ---------------------------------------------------------------------------


@register(
    "text_repetition",
    f"""
    WITH sh AS (
      SELECT doc_id,
             {shingles_sql(tokens_sql("text"), 3)} AS grams
      FROM documents
      WHERE len({tokens_sql("text")}) >= 3
    )
    SELECT doc_id,
           len(grams) AS n_grams,
           round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
             AS dup_frac,
           CASE WHEN 1.0 - len(list_distinct(grams))::DOUBLE / len(grams)
                     > 0.5
                THEN true ELSE false END AS is_repetitive
    FROM sh
    """,
    "Gopher-style repetition rule: duplicate 3-gram fraction per doc, "
    "zero-shuffle (array kernels inside the scan projection)",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_expr("text").alias("t")).filter(
        F.size("t") >= 3
    )
    grams = toks.select("doc_id", shingles_expr("t", 3).alias("grams"))
    dup_frac = F.round(
        1.0
        - F.size(F.array_distinct("grams")).cast("double") / F.size("grams"),
        6,
    )
    return grams.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        dup_frac.alias("dup_frac"),
        (dup_frac > 0.5).alias("is_repetitive"),
    )


# ---------------------------------------------------------------------------
# Contamination: distinct-4-gram overlap between the corpus and a
# "benchmark" subset (doc_id % 50 == 0 → 2% of docs, the held-out stand-in).
# The benchmark's distinct gram set is tiny relative to the corpus → built
# once and BROADCAST; the probe side explodes distinct grams per doc and
# semi-joins the broadcast, so the corpus never shuffles. At 100 TB this is
# exactly the shape you want: benchmark n-gram sets are MBs (bounded by the
# eval suites), corpus is the 100 TB side, and a broadcast hash semi-join
# keeps it map-side; the per-doc re-aggregation groups on doc_id, the same
# key the explode preserved, so AQE coalesces it locally.
# ---------------------------------------------------------------------------


@register(
    "text_contamination",
    f"""
    WITH grams AS (
      SELECT doc_id,
             list_distinct({shingles_sql(tokens_sql("text"), 4)}) AS grams
      FROM documents
      WHERE len({tokens_sql("text")}) >= 4
    ), bench AS (
      SELECT DISTINCT unnest(grams) AS g FROM grams WHERE doc_id % 50 = 0
    ), probe AS (
      SELECT doc_id, unnest(grams) AS g
      FROM grams WHERE doc_id % 50 <> 0
    ), hits AS (
      SELECT p.doc_id, count(*) AS n_contaminated
      FROM probe p JOIN bench b ON p.g = b.g
      GROUP BY p.doc_id
    )
    SELECT g.doc_id,
           len(g.grams) AS n_grams,
           coalesce(h.n_contaminated, 0) AS n_contaminated,
           round(coalesce(h.n_contaminated, 0)::DOUBLE / len(g.grams), 6)
             AS contamination
    FROM grams g LEFT JOIN hits h ON g.doc_id = h.doc_id
    WHERE g.doc_id % 50 <> 0
    """,
    "benchmark-contamination check: distinct-4-gram collision join of the "
    "corpus against a broadcast benchmark gram set",
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", tokens_expr("text").alias("t"))
        .filter(F.size("t") >= 4)
        .select("doc_id", F.array_distinct(shingles_expr("t", 4)).alias("grams"))
    )
    bench = F.broadcast(
        grams.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    probe = grams.filter(F.col("doc_id") % 50 != 0)
    hits = (
        probe.select("doc_id", F.explode("grams").alias("g"))
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .withColumnRenamed("doc_id", "hit_doc_id")
    )
    return (
        probe.join(hits, probe["doc_id"] == hits["hit_doc_id"], "left")
        .select(
            "doc_id",
            F.size("grams").alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.coalesce("n_contaminated", F.lit(0)).cast("double")
                / F.size("grams"),
                6,
            ).alias("contamination"),
        )
    )


# ---------------------------------------------------------------------------
# Data-mixture sampling: weighted exact-N selection over the corpus, with
# per-source weights (the "sample src3 3x as much as src1" step every
# training-data mixture applies). Weight here derives from the source id so
# the oracle can recompute it without a dim table; in production it's a
# broadcast-joined weights dimension.
# ---------------------------------------------------------------------------


@register(
    "p_weighted_sample",
    """
    WITH weighted AS (
      SELECT doc_id, source,
             CAST(1.0 + CAST(substr(source, 4) AS INT) % 7 AS DOUBLE) AS w,
             ln((('0x' || substr(
                    md5(concat_ws('|', 'wsample-42', CAST(doc_id AS VARCHAR))),
                    1, 12))::UBIGINT + 1.0) / 281474976710656.0)
               / (1.0 + CAST(substr(source, 4) AS INT) % 7) AS wkey
      FROM documents
    )
    SELECT doc_id, source, w
    FROM weighted
    ORDER BY wkey DESC, doc_id
    LIMIT 100
    """,
    "Efraimidis-Spirakis weighted exact-N sample (data-mixture sampling): "
    "ln(u)/w rank keys from the md5 stream, TakeOrdered top-N",
)
def p_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.samples import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    w = 1.0 + F.substring("source", 4, 10).cast("int") % 7
    return weighted_sample(
        docs.select("doc_id", "source", w.alias("w")),
        100,
        ["doc_id"],
        F.col("w"),
    )
