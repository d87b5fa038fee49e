"""Round-5 batch 5: readability scoring, t-closeness, classifier
evaluation, time-weighted averaging, and compaction planning —

- ``text_readability``: Flesch reading-ease per document from exact
  integer word/sentence/syllable counts (vowel-group syllable
  heuristic) — the classic curation quality score beside the
  length/punct/stopword heuristics already in the engine.
- ``privacy_tcloseness``: t-closeness of quasi-identifier groups
  (Li et al. 2007): the ordered-attribute Earth-Mover's Distance
  between each group's sensitive-value distribution and the global
  one, in exact integer micro-units — completes the k-anonymity /
  l-diversity / t-closeness release-audit trio.
- ``ml_confusion_metrics``: confusion matrix + precision/recall/F1
  for the Naive Bayes domain gate vs ground truth — the eval report
  every curation classifier ships with; all floor-division micro-ints.
- ``ts_twap``: duration-weighted average value per event type (the
  TWAP estimator): each observation weighted by its holding interval,
  exact decimal(38,0) integer arithmetic end-to-end.
- ``layout_compaction_bins``: the Delta/Iceberg OPTIMIZE bin-packing
  plan — small files packed sequentially into target-size compaction
  groups per table partition via one partitioned cumulative-sum
  window; all integer.

Float discipline: NO doubles anywhere in this module — every score is
an exact integer (floor-division milli/micro-units, decimal(38,0)
accumulators). The readability score is deliberately integer
milli-units because its natural float form hit a decimal midpoint
(55.38625 at 4 digits) where Spark's BigDecimal HALF_UP and
DuckDB/Python binary rounding disagree — the round-snap pattern does
NOT protect exact-rational values that land on midpoints, only
libm-fed irrationals. The t-closeness buckets shift balances
non-negative before floor division because Spark ``div`` truncates
toward zero while DuckDB ``//`` floors (divergent on negatives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register
from jigsaw_spark.operators.text import tokens_expr, tokens_sql

# ---------------------------------------------------------------------------
# text_readability
# ---------------------------------------------------------------------------

_READ_SQL = f"""
    WITH c AS (
      SELECT doc_id,
             CAST(len({tokens_sql('text')}) AS BIGINT) AS n_words,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                  AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(CASE WHEN n_words > 0
                     THEN 206835 - (1015 * n_words) // n_sentences
                          - (84600 * n_syllables) // n_words
                     ELSE 0 END AS BIGINT) AS flesch_milli
    FROM c
"""


@register(
    "text_readability",
    _READ_SQL,
    "Flesch reading-ease per document — the classic readability "
    "curation score. Words are the engine's shared tokenizer, "
    "sentences are terminal-punctuation runs (floored at 1), "
    "syllables the standard vowel-group heuristic — all exact integer "
    "counts from single regex passes (JVM-side, no UDF). The score is "
    "emitted in EXACT integer milli-units via floor division "
    "(206835 - 1015*W div S - 84600*Syl div W, all terms positive so "
    "div == //), sidestepping the decimal-midpoint rounding class "
    "entirely; empty docs emit 0. Map-only at any scale",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    c = docs.select(
        "doc_id",
        F.size(tokens_expr("text")).cast("bigint").alias("n_words"),
        F.greatest(
            F.lit(1),
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")),
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast("bigint")
        .alias("n_syllables"),
    )
    return c.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "CAST(CASE WHEN n_words > 0"
            " THEN 206835 - (1015 * n_words) div n_sentences"
            " - (84600 * n_syllables) div n_words"
            " ELSE 0 END AS BIGINT)"
        ).alias("flesch_milli"),
    )


# ---------------------------------------------------------------------------
# privacy_tcloseness
# ---------------------------------------------------------------------------

_TCLOSE_SQL = """
    WITH v AS (
      SELECT c_mktsegment AS seg,
             (CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) // 100000
               AS bucket
      FROM customer),
    buckets AS MATERIALIZED (
      SELECT DISTINCT bucket FROM v),
    m AS (SELECT count(*) AS m FROM buckets),
    segs AS MATERIALIZED (
      SELECT seg, count(*) AS ng FROM v GROUP BY seg),
    n AS (SELECT count(*) AS n FROM v),
    gc AS (
      SELECT seg, bucket, count(*) AS r FROM v GROUP BY seg, bucket),
    tc AS (
      SELECT bucket, count(*) AS c FROM v GROUP BY bucket),
    grid AS (
      SELECT s.seg, s.ng, b.bucket,
             coalesce(gc.r, 0) AS r, tc.c
      FROM segs s CROSS JOIN buckets b
      JOIN tc ON tc.bucket = b.bucket
      LEFT JOIN gc ON gc.seg = s.seg AND gc.bucket = b.bucket),
    cums AS (
      SELECT seg, ng, bucket,
             sum(r) OVER w AS cr, sum(c) OVER w AS cc
      FROM grid
      WINDOW w AS (PARTITION BY seg ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING)),
    emd AS (
      SELECT seg, ng,
             sum(abs(CAST(cr AS HUGEINT) * n.n
                     - CAST(cc AS HUGEINT) * ng)) AS sd
      FROM cums CROSS JOIN n GROUP BY seg, ng)
    SELECT emd.seg AS segment,
           CAST(emd.ng AS BIGINT) AS n_rows,
           CAST(CASE WHEN m.m > 1
                     THEN CAST(1000000 AS HUGEINT) * emd.sd
                          // (CAST(m.m - 1 AS HUGEINT) * emd.ng * n.n)
                     ELSE 0 END AS BIGINT) AS tcloseness_micro
    FROM emd CROSS JOIN m CROSS JOIN n
"""


@register(
    "privacy_tcloseness",
    _TCLOSE_SQL,
    "t-closeness audit (Li et al. 2007) of quasi-identifier groups "
    "(market segment) against an ordered sensitive attribute (account "
    "balance in $1000 bins): the ordered-EMD formula (1/(m-1)) * "
    "sum_j |cumP_group - cumP_global| evaluated WITHOUT floats — "
    "cumulative differences are cross-multiplied to the common "
    "denominator N_g*N and accumulated in decimal(38,0)/HUGEINT, then "
    "floor-divided to micro-units. Completes the k-anon/l-div/"
    "t-closeness release trio. Shape: two hash aggs + a (segments x "
    "bins) grid dim with partitioned cumsum windows — the corpus is "
    "scanned once; everything downstream is dim-sized",
)
def privacy_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    v = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.expr(
            "(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000) div 100000"
        ).alias("bucket"),
    )
    buckets = v.select("bucket").distinct()
    m = buckets.agg(F.count(F.lit(1)).alias("m"))
    segs = v.groupBy("seg").agg(F.count(F.lit(1)).alias("ng"))
    n = v.agg(F.count(F.lit(1)).alias("n"))
    gc = v.groupBy("seg", "bucket").agg(F.count(F.lit(1)).alias("r"))
    tc = v.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        segs.crossJoin(F.broadcast(buckets))
        .join(F.broadcast(tc), "bucket")
        .join(F.broadcast(gc), ["seg", "bucket"], "left_outer")
        .select(
            "seg",
            "ng",
            "bucket",
            F.coalesce("r", F.lit(0)).alias("r"),
            "c",
        )
    )
    w = (
        Window.partitionBy("seg")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = grid.select(
        "seg",
        "ng",
        F.sum("r").over(w).alias("cr"),
        F.sum("c").over(w).alias("cc"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    emd = (
        cums.crossJoin(F.broadcast(n))
        .select(
            "seg",
            "ng",
            F.abs(dec("cr") * F.col("n") - dec("cc") * F.col("ng")).alias(
                "d"
            ),
        )
        .groupBy("seg", "ng")
        .agg(F.sum("d").alias("sd"))
    )
    return (
        emd.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(n))
        .select(
            F.col("seg").alias("segment"),
            F.col("ng").cast("bigint").alias("n_rows"),
            F.expr(
                "CAST(CASE WHEN m > 1"
                " THEN CAST(1000000 AS DECIMAL(38,0)) * sd"
                " div (CAST(m - 1 AS DECIMAL(38,0)) * ng * n)"
                " ELSE 0 END AS BIGINT)"
            ).alias("tcloseness_micro"),
        )
    )


# ---------------------------------------------------------------------------
# ml_confusion_metrics
# ---------------------------------------------------------------------------


def _confusion_sql() -> str:
    from jigsaw_spark.plans.queries_r7 import _nb_sql

    return f"""
    WITH nb AS ({_nb_sql()}),
    j AS (
      SELECT nb.pred = 'en' AS p, d.lang = 'en' AS t
      FROM nb JOIN documents d ON nb.doc_id = d.doc_id),
    cm AS (
      SELECT
        CAST(sum(CASE WHEN p AND t THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN p AND NOT t THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN NOT p AND t THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(sum(CASE WHEN NOT p AND NOT t THEN 1 ELSE 0 END) AS BIGINT)
          AS tn
      FROM j),
    pr AS (
      SELECT tp, fp, fn, tn,
             CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp)
                  ELSE 0 END AS precision_micro,
             CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
                  ELSE 0 END AS recall_micro,
             (tp + tn) * 1000000 // (tp + fp + fn + tn) AS accuracy_micro
      FROM cm)
    SELECT tp, fp, fn, tn,
           CAST(precision_micro AS BIGINT) AS precision_micro,
           CAST(recall_micro AS BIGINT) AS recall_micro,
           CAST(CASE WHEN precision_micro + recall_micro > 0
                     THEN 2 * precision_micro * recall_micro
                          // (precision_micro + recall_micro)
                     ELSE 0 END AS BIGINT) AS f1_micro,
           CAST(accuracy_micro AS BIGINT) AS accuracy_micro
    FROM pr
"""


@register(
    "ml_confusion_metrics",
    _confusion_sql(),
    "classifier evaluation report for the Naive Bayes domain gate: "
    "confusion matrix (TP/FP/FN/TN) vs ground-truth language labels "
    "on the held-out odd half, with precision/recall/F1/accuracy as "
    "EXACT floor-division micro-units (F1 is the harmonic mean of the "
    "micro-unit P and R — integer in, integer out, zero-denominator "
    "guarded). The eval every curation classifier ships with. Shape: "
    "the classifier's per-doc output joins truth on doc_id, ONE "
    "4-counter agg; the report is a 1-row frame",
)
def ml_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_r7 import ml_nbayes_classify

    docs = _t(spark, sf_dir, "documents")
    nb = ml_nbayes_classify(spark, sf_dir).select("doc_id", "pred")
    j = nb.join(docs.select("doc_id", "lang"), "doc_id").select(
        (F.col("pred") == "en").alias("p"), (F.col("lang") == "en").alias("t")
    )
    cm = j.agg(
        F.sum(F.when(F.col("p") & F.col("t"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("p") & ~F.col("t"), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(~F.col("p") & F.col("t"), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when(~F.col("p") & ~F.col("t"), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
    )
    pr = cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CASE WHEN tp + fp > 0 THEN tp * 1000000 div (tp + fp)"
            " ELSE 0 END"
        ).alias("precision_micro"),
        F.expr(
            "CASE WHEN tp + fn > 0 THEN tp * 1000000 div (tp + fn)"
            " ELSE 0 END"
        ).alias("recall_micro"),
        F.expr("(tp + tn) * 1000000 div (tp + fp + fn + tn)").alias(
            "accuracy_micro"
        ),
    )
    return pr.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.col("precision_micro").cast("bigint").alias("precision_micro"),
        F.col("recall_micro").cast("bigint").alias("recall_micro"),
        F.expr(
            "CAST(CASE WHEN precision_micro + recall_micro > 0"
            " THEN 2 * precision_micro * recall_micro"
            " div (precision_micro + recall_micro)"
            " ELSE 0 END AS BIGINT)"
        ).alias("f1_micro"),
        F.col("accuracy_micro").cast("bigint").alias("accuracy_micro"),
    )


# ---------------------------------------------------------------------------
# ts_twap
# ---------------------------------------------------------------------------

_TWAP_SQL = """
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS x, event_id,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    seg AS (
      SELECT event_type, cents,
             lead(x) OVER (PARTITION BY event_type
                           ORDER BY x, event_id) - x AS dur_us
      FROM e),
    agg AS (
      SELECT event_type,
             count(dur_us) AS n_segments,
             sum(CAST(dur_us AS HUGEINT)) AS total_dur,
             sum(CAST(cents AS HUGEINT) * dur_us) AS wsum
      FROM seg WHERE dur_us IS NOT NULL GROUP BY event_type)
    SELECT event_type,
           CAST(n_segments AS BIGINT) AS n_segments,
           CAST(total_dur AS BIGINT) AS total_dur_us,
           CAST(CASE WHEN total_dur > 0 THEN wsum // total_dur
                     ELSE 0 END AS BIGINT) AS twap_cents
    FROM agg
"""


@register(
    "ts_twap",
    _TWAP_SQL,
    "time-weighted average value per event type (the TWAP estimator): "
    "each observation weighted by its holding interval to the next "
    "observation (lead window totally ordered by ts+event_id; the "
    "open-ended last observation is excluded, the standard "
    "convention). Weighted sums accumulate cents*micros products in "
    "decimal(38,0)/HUGEINT — exact at any scale — and the average is "
    "one floor division back to cents. Window partitions on "
    "event_type; one agg; zero-duration series guarded",
)
def ts_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.unix_micros("ts").alias("x"),
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("x", "event_id")
    seg = e.select(
        "event_type",
        "cents",
        (F.lead("x").over(w) - F.col("x")).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    agg = seg.groupBy("event_type").agg(
        F.count("dur_us").alias("n_segments"),
        F.sum(F.col("dur_us").cast("decimal(38,0)")).alias("total_dur"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("dur_us")
        ).alias("wsum"),
    )
    return agg.select(
        "event_type",
        F.col("n_segments").cast("bigint").alias("n_segments"),
        F.col("total_dur").cast("bigint").alias("total_dur_us"),
        F.expr(
            "CAST(CASE WHEN total_dur > 0 THEN wsum div total_dur"
            " ELSE 0 END AS BIGINT)"
        ).alias("twap_cents"),
    )


# ---------------------------------------------------------------------------
# layout_compaction_bins
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 409600  # simulated bytes per compaction group

_COMPACT_SQL = f"""
    WITH files AS (
      SELECT o_orderpriority AS part,
             ('0x' || substr(md5('cfile|' || CAST(o_orderkey AS VARCHAR)),
                             1, 12))::UBIGINT % 128 AS file_id,
             count(*) * 100 AS bytes
      FROM orders GROUP BY 1, 2),
    packed AS (
      SELECT part, file_id, bytes,
             (sum(bytes) OVER (PARTITION BY part ORDER BY file_id
                               ROWS UNBOUNDED PRECEDING) - bytes)
               // {_COMPACT_TARGET} AS bin_id
      FROM files)
    SELECT part, CAST(bin_id AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS bytes,
           CAST(min(file_id) AS BIGINT) AS first_file,
           CAST(max(file_id) AS BIGINT) AS last_file
    FROM packed GROUP BY part, bin_id
"""


@register(
    "layout_compaction_bins",
    _COMPACT_SQL,
    "small-file compaction plan — the Delta/Iceberg OPTIMIZE "
    "bin-packing step as an auditable query: per table partition "
    "(order priority), the simulated file manifest (128 hash files "
    "with byte sizes) is packed sequentially into target-size "
    "compaction groups via bin = floor(prefix_bytes / target) from "
    "ONE partitioned cumulative-sum window; the output is the rewrite "
    "manifest (files, bytes, id span per group). All integer; the "
    "manifest is a |files|-row dim so every step after the one "
    "per-file agg is dim-sized",
)
def layout_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.col("o_orderpriority").alias("part"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cfile|"),
                            F.col("o_orderkey").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(128),
        ).alias("file_id"),
    ).agg((F.count(F.lit(1)) * 100).alias("bytes"))
    packed = files.select(
        "part",
        "file_id",
        "bytes",
        F.expr(
            f"CAST((sum(bytes) OVER (PARTITION BY part ORDER BY file_id"
            f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes)"
            f" div {_COMPACT_TARGET} AS BIGINT)"
        ).alias("bin_id"),
    )
    return packed.groupBy("part", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("bytes"),
        F.min("file_id").cast("bigint").alias("first_file"),
        F.max("file_id").cast("bigint").alias("last_file"),
    )
