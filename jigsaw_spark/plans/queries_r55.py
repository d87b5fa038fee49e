"""Round-10 queue: calibration drift and vocabulary growth (module
queries_r55 sits BEHIND the 50-slot certification window by the
documented overflow policy — these two queries are the next round's
queue, the r40 pattern: replica-verified now, driver row next round).

- ``ml_calibration_drift``: does calibration DECAY over time? The
  10-bin reliability table is built on the TRAIN half of the timeline
  (bins and score bounds from train only — the production constraint)
  and then the SAME frozen bins are filled with the TEST half; per
  bin: train confidence/accuracy vs test accuracy, plus both ECEs and
  the drift. ml_reliability_ece answers "can the probabilities be
  trusted"; this answers "for how long" — the temporal companion, the
  same axis ml_threshold_transfer adds to ml_cost_threshold.
- ``text_vocab_growth``: the Heaps'-law curve — vocabulary size after
  each decile of the corpus (deciles of the doc_id VALUE RANGE — an
  equal-count cut would need a global rank over every document, a
  single-task funnel at 100 TB; the value cut is two broadcast bounds
  and a map-side expression): per decile, cumulative distinct types,
  new types added, and tokens seen. The dedup-effectiveness
  diagnostic: a template-polluted corpus flattens early (new
  documents add tokens but no types), a deduped one keeps growing —
  read BEFORE and AFTER dedup to price the treatment. EXACT: each
  type is attributed to the decile of its minimum doc_id; cumulative
  sums run over the 10-row decile dim.

Scale notes (100 TB): calibration drift is two fact hash-aggs into
the shared 10-bin dim (train pass + test pass; bounds from a 1-row
broadcast); vocab growth is one explode -> (tok, doc) hash-agg ->
per-type min-doc agg -> 10-bucket histogram -> cumulative over 10
rows — the token dim is vocabulary-bounded and NO global rank or
window touches anything bigger than 10 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ml_calibration_drift
# ---------------------------------------------------------------------------

_CAL_DRIFT_SQL = """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             epoch_us(ts) // 86400000000 // 7 AS w
      FROM events),
    span AS MATERIALIZED (
      SELECT (min(w) + max(w)) // 2 + 1 AS cut FROM s),
    tb AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi
      FROM s WHERE w < (SELECT cut FROM span)),
    p AS (
      SELECT y, w >= (SELECT cut FROM span) AS is_test,
             least(CASE WHEN (SELECT hi - lo FROM tb) = 0 THEN 500000
                        ELSE (cents - (SELECT lo FROM tb)) * 1000000
                             // (SELECT hi - lo FROM tb) END, 999999)
               AS p_micro
      FROM s),
    b AS (
      SELECT CAST(least(greatest(p_micro, 0) // 100000, 9) AS INT)
               AS bin,
             is_test,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p_micro) AS BIGINT) AS sp,
             CAST(sum(y) AS BIGINT) AS pos
      FROM p GROUP BY 1, 2),
    wide AS (
      SELECT bin,
             CAST(coalesce(sum(CASE WHEN NOT is_test THEN n END), 0)
                  AS BIGINT) AS n_train,
             CAST(coalesce(sum(CASE WHEN NOT is_test THEN sp END), 0)
                  AS BIGINT) AS sp_train,
             CAST(coalesce(sum(CASE WHEN NOT is_test THEN pos END), 0)
                  AS BIGINT) AS pos_train,
             CAST(coalesce(sum(CASE WHEN is_test THEN n END), 0)
                  AS BIGINT) AS n_test,
             CAST(coalesce(sum(CASE WHEN is_test THEN pos END), 0)
                  AS BIGINT) AS pos_test
      FROM b GROUP BY 1),
    tot AS MATERIALIZED (
      SELECT CAST(sum(n_train) AS BIGINT) AS nt,
             CAST(sum(n_test) AS BIGINT) AS ne
      FROM wide)
    SELECT CAST(bin AS INT) AS bin,
           n_train, pos_train, n_test, pos_test,
           CAST(CASE WHEN n_train = 0 THEN 0
                ELSE sp_train // n_train END AS BIGINT)
             AS conf_train_micro,
           CAST(CASE WHEN n_train = 0 THEN 0
                ELSE pos_train * 1000000 // n_train END AS BIGINT)
             AS acc_train_micro,
           CAST(CASE WHEN n_test = 0 THEN 0
                ELSE pos_test * 1000000 // n_test END AS BIGINT)
             AS acc_test_micro,
           CAST(sum(abs(sp_train - 1000000 * pos_train)) OVER ()
                // (SELECT nt FROM tot) AS BIGINT) AS ece_train_micro,
           CAST(sum(CASE WHEN n_test = 0 THEN 0
                ELSE abs(sp_train * n_test // greatest(n_train, 1)
                         - 1000000 * pos_test) END) OVER ()
                // (SELECT ne FROM tot) AS BIGINT) AS ece_test_micro
    FROM wide
"""


@register(
    "ml_calibration_drift",
    _CAL_DRIFT_SQL,
    "calibration drift: the 10-bin reliability table built on the "
    "TRAIN half of the timeline (bins AND score bounds from train "
    "only — the production constraint; out-of-range test scores clamp "
    "into the edge bins) and re-filled with the TEST half — per bin "
    "train confidence vs train/test accuracy, plus both ECEs "
    "(test ECE uses the train-bin mean confidence scaled to the test "
    "fill, the frozen-calibration-card reading). "
    "ml_reliability_ece answers 'can the probabilities be trusted'; "
    "this answers 'for how long' — the temporal axis "
    "ml_threshold_transfer adds to ml_cost_threshold, applied to "
    "calibration. EXACT: integer micro units with floor division "
    "end-to-end; empty bins report 0 by convention. Shape: two fact "
    "hash-aggs into the shared 10-bin dim; the global windows run "
    "over those <= 20 bounded rows",
)
def ml_calibration_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.expr("unix_micros(ts) div 86400000000 div 7").alias("w"),
    )
    span = s.agg(F.expr("(min(w) + max(w)) div 2 + 1").alias("cut"))
    sc = s.crossJoin(F.broadcast(span))
    tb = sc.filter(F.col("w") < F.col("cut")).agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    p = sc.crossJoin(F.broadcast(tb)).select(
        "y",
        (F.col("w") >= F.col("cut")).alias("is_test"),
        F.expr(
            "least(CASE WHEN hi - lo = 0 THEN 500000"
            " ELSE (cents - lo) * 1000000 div (hi - lo) END, 999999)"
        ).alias("p_micro"),
    )
    b = p.groupBy(
        F.expr(
            "CAST(least(greatest(p_micro, 0) div 100000, 9) AS INT)"
        ).alias("bin"),
        "is_test",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p_micro").cast("bigint").alias("sp"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    wide = b.groupBy("bin").agg(
        F.coalesce(
            F.sum(F.when(~F.col("is_test"), F.col("n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_train"),
        F.coalesce(
            F.sum(F.when(~F.col("is_test"), F.col("sp"))), F.lit(0)
        )
        .cast("bigint")
        .alias("sp_train"),
        F.coalesce(
            F.sum(F.when(~F.col("is_test"), F.col("pos"))), F.lit(0)
        )
        .cast("bigint")
        .alias("pos_train"),
        F.coalesce(
            F.sum(F.when(F.col("is_test"), F.col("n"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_test"),
        F.coalesce(
            F.sum(F.when(F.col("is_test"), F.col("pos"))), F.lit(0)
        )
        .cast("bigint")
        .alias("pos_test"),
    )
    tot = wide.agg(
        F.sum("n_train").cast("bigint").alias("nt"),
        F.sum("n_test").cast("bigint").alias("ne"),
    )
    w_all = Window.partitionBy()
    return wide.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("int").alias("bin"),
        "n_train",
        "pos_train",
        "n_test",
        "pos_test",
        F.expr(
            "CAST(CASE WHEN n_train = 0 THEN 0"
            " ELSE sp_train div n_train END AS BIGINT)"
        ).alias("conf_train_micro"),
        F.expr(
            "CAST(CASE WHEN n_train = 0 THEN 0"
            " ELSE pos_train * 1000000 div n_train END AS BIGINT)"
        ).alias("acc_train_micro"),
        F.expr(
            "CAST(CASE WHEN n_test = 0 THEN 0"
            " ELSE pos_test * 1000000 div n_test END AS BIGINT)"
        ).alias("acc_test_micro"),
        F.expr(
            "CAST(sum(abs(sp_train - 1000000 * pos_train))"
            " OVER () div nt AS BIGINT)"
        ).alias("ece_train_micro"),
        F.expr(
            "CAST(sum(CASE WHEN n_test = 0 THEN 0"
            " ELSE abs(sp_train * n_test div greatest(n_train, 1)"
            " - 1000000 * pos_test) END)"
            " OVER () div ne AS BIGINT)"
        ).alias("ece_test_micro"),
    )


# ---------------------------------------------------------------------------
# text_vocab_growth
# ---------------------------------------------------------------------------


def _vocab_growth_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH bounds AS MATERIALIZED (
      SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
    decs AS (SELECT unnest(range(10)) AS decile),
    tok AS (
      SELECT d.doc_id, unnest({tokens_sql('text')}) AS tok
      FROM documents d),
    tok_counts AS (
      SELECT t.tok, t.doc_id, count(*) AS c
      FROM tok t GROUP BY 1, 2),
    first_seen AS (
      SELECT tok, min(doc_id) AS first_doc,
             CAST(sum(c) AS BIGINT) AS total
      FROM tok_counts GROUP BY 1),
    dec_docs AS (
      SELECT least((tc.doc_id - (SELECT lo FROM bounds)) * 10
                   // ((SELECT hi - lo FROM bounds) + 1), 9) AS decile,
             CAST(sum(tc.c) AS BIGINT) AS tokens
      FROM tok_counts tc GROUP BY 1),
    dec_types AS (
      SELECT least((fs.first_doc - (SELECT lo FROM bounds)) * 10
                   // ((SELECT hi - lo FROM bounds) + 1), 9) AS decile,
             CAST(count(*) AS BIGINT) AS new_types
      FROM first_seen fs GROUP BY 1),
    merged AS (
      SELECT d.decile,
             CAST(coalesce(dd.tokens, 0) AS BIGINT) AS tokens,
             CAST(coalesce(dt.new_types, 0) AS BIGINT) AS new_types
      FROM decs d
      LEFT JOIN dec_docs dd ON d.decile = dd.decile
      LEFT JOIN dec_types dt ON d.decile = dt.decile)
    SELECT CAST(decile AS INT) AS decile,
           CAST(sum(tokens) OVER (ORDER BY decile) AS BIGINT)
             AS cum_tokens,
           new_types,
           CAST(sum(new_types) OVER (ORDER BY decile) AS BIGINT)
             AS cum_types
    FROM merged
"""


@register(
    "text_vocab_growth",
    _vocab_growth_sql(),
    "the Heaps'-law vocabulary growth curve: the corpus is cut into 10 "
    "deciles of the doc_id VALUE RANGE (a deliberate design choice — "
    "an equal-COUNT cut needs a global rank over every document, a "
    "single-task funnel at 100 TB; the value-range cut is a broadcast "
    "of two bounds and a map-side expression, and parameterizes the "
    "same monotone corpus-order curve); per decile the cumulative "
    "tokens, the NEW types first appearing there (each type "
    "attributed to the decile of its minimum doc_id), and the "
    "cumulative vocabulary — the dedup-effectiveness diagnostic (a "
    "template-polluted corpus flattens early: new documents add "
    "tokens but no types; read before/after dedup to price the "
    "treatment, beside text_lexical_diversity's endpoint TTR). EXACT: "
    "integer counts and floor-division cuts; every decile emits a row "
    "(a 10-row decile dim left-joins both aggregates). Shape: one "
    "explode -> (tok, doc) hash-agg -> per-type min-doc agg "
    "(vocabulary-bounded) and one decile hash-agg — NO global rank, "
    "no window over anything bigger than 10 rows",
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    )
    tok_counts = (
        docs.select("doc_id", F.explode(tokens_expr("text")).alias("tok"))
        .groupBy("tok", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    first_seen = tok_counts.groupBy("tok").agg(
        F.min("doc_id").alias("first_doc"),
        F.sum("c").cast("bigint").alias("total"),
    )
    dec_expr = "least(({col} - lo) * 10 div (hi - lo + 1), 9)"
    dec_docs = (
        tok_counts.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.expr(dec_expr.format(col="doc_id")).alias("decile")
        )
        .agg(F.sum("c").cast("bigint").alias("tokens"))
    )
    dec_types = (
        first_seen.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.expr(dec_expr.format(col="first_doc")).alias("decile")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_types"))
    )
    decs = F.broadcast(
        spark.createDataFrame([(i,) for i in range(10)], "decile int")
    )
    merged = (
        decs.join(
            dec_docs.withColumn(
                "decile", F.col("decile").cast("int")
            ),
            "decile",
            "left",
        )
        .join(
            dec_types.withColumn(
                "decile", F.col("decile").cast("int")
            ),
            "decile",
            "left",
        )
        .select(
            "decile",
            F.coalesce(F.col("tokens"), F.lit(0))
            .cast("bigint")
            .alias("tokens"),
            F.coalesce(F.col("new_types"), F.lit(0))
            .cast("bigint")
            .alias("new_types"),
        )
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return merged.select(
        F.col("decile").cast("int").alias("decile"),
        F.sum("tokens").over(wc).cast("bigint").alias("cum_tokens"),
        "new_types",
        F.sum("new_types").over(wc).cast("bigint").alias("cum_types"),
    )
