"""Round-10 batch 2: the evaluation/fairness/calibration deepening —
group fairness gaps, Brier decomposition, per-group AUC, selective
prediction, and confident-learning label-noise estimation.

- ``ml_fairness_parity``: demographic parity + equalized odds over the
  shared min-max score model at the fixed 0.5 operating point, groups
  = user_id % 5 (the deterministic protected-attribute stand-in): per
  cohort, selection rate / TPR / FPR in micro, plus the global
  max-min gaps (DP gap; EO gap = worse of the TPR and FPR spreads) —
  the pre-deployment fairness gate next to the calibration gate
  (ml_reliability_ece) and the cost gate (ml_cost_threshold).
- ``ml_brier_decomp``: Murphy decomposition of the Brier score over
  the 10 confidence-decile bins — reliability (calibration gap),
  resolution (how much the bins separate the base rate), uncertainty
  (base-rate variance): REL - RES + UNC is the binned Brier identity.
  ml_brier_log_loss gives the number; this explains WHERE it comes
  from (a model can be well-calibrated and useless — REL small, RES
  small — or sharp but miscalibrated).
- ``ml_auc_by_group``: exact per-group ROC AUC (Mann-Whitney with
  half-credit ties) of n_chars vs lang='en' per SOURCE — the slice
  discriminations behind ml_auc_exact's single number: a global AUC
  can hide a collapsed slice (the ml_error_slices question asked of
  ranking quality). Same contingency-table shape, window partitioned
  by group.
- ``ml_risk_coverage``: selective prediction (the risk-coverage
  curve): at confidence thresholds 0.5..0.9, the fraction of traffic
  the model keeps (coverage) and its accuracy on the kept slice —
  abstention is the first mitigation every production classifier
  ships; this prices it. Confidence = max(p, 1-p) at the 0.5
  operating point.
- ``ml_confident_learning``: confident-learning label-noise estimate
  (Northcutt's confident joint, binary form): per-class confidence
  thresholds = the class's mean predicted probability; examples
  confidently predicted into a class (prob >= that class's
  threshold, argmax on double-qualify, ties to class 1) fill the
  (given label x confident prediction) joint; off-diagonal mass is
  the estimated label-noise rate — the curation signal that decides
  whether a label column can be trusted for filtering.

Scale notes (100 TB): every query is one or two fact hash-aggs into a
bounded dim (5 cohorts, 10 bins, 5 thresholds, 2x2 joint, |sources|
groups); the only windows run over those bounded dims; the per-group
AUC walks the per-(group, distinct-score) contingency table — bounded
by group x value domain, never the corpus; decimal(38,0) carries the
squared-gap numerators (the ml_auc_exact discipline) so 1e9-row bins
cannot wrap int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# Shared events score model (the ml_reliability_ece convention): cents =
# round(value*100), y = purchase, p_micro = min-max over full data.
_SCORE_CTE = """s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             user_id
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM s),
    p AS (
      SELECT y, user_id,
             CASE WHEN (SELECT hi - lo FROM t) = 0 THEN 500000
                  ELSE (cents - (SELECT lo FROM t)) * 1000000
                       // (SELECT hi - lo FROM t) END AS p_micro
      FROM s)"""


def _score_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        "user_id",
    )
    t = s.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "y",
        "user_id",
        "n",
        F.expr(
            "CASE WHEN hi - lo = 0 THEN 500000"
            " ELSE (cents - lo) * 1000000 div (hi - lo) END"
        ).alias("p_micro"),
    )


# ---------------------------------------------------------------------------
# ml_fairness_parity
# ---------------------------------------------------------------------------

_FAIR_SQL = f"""
    WITH {_SCORE_CTE},
    g AS (
      SELECT CAST(user_id % 5 AS INT) AS cohort,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN p_micro >= 500000 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_predpos,
             CAST(sum(CASE WHEN p_micro >= 500000 AND y = 1
               THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM p GROUP BY 1),
    rates AS (
      SELECT cohort, n, n_pos, n_predpos, tp,
             CAST(n_predpos - tp AS BIGINT) AS fp,
             CAST(n_predpos * 1000000 // n AS BIGINT) AS sel_micro,
             CAST(CASE WHEN n_pos = 0 THEN 0
               ELSE tp * 1000000 // n_pos END AS BIGINT) AS tpr_micro,
             CAST(CASE WHEN n - n_pos = 0 THEN 0
               ELSE (n_predpos - tp) * 1000000 // (n - n_pos) END
               AS BIGINT) AS fpr_micro
      FROM g)
    SELECT cohort, n, n_pos, n_predpos, tp, fp,
           sel_micro, tpr_micro, fpr_micro,
           CAST(max(sel_micro) OVER () - min(sel_micro) OVER ()
             AS BIGINT) AS dp_gap_micro,
           CAST(greatest(
             max(tpr_micro) OVER () - min(tpr_micro) OVER (),
             max(fpr_micro) OVER () - min(fpr_micro) OVER ())
             AS BIGINT) AS eo_gap_micro
    FROM rates
"""


@register(
    "ml_fairness_parity",
    _FAIR_SQL,
    "group-fairness audit over the shared min-max score model at the "
    "fixed 0.5 operating point, cohorts = user_id % 5 (deterministic "
    "protected-attribute stand-in): per cohort — population, positive "
    "base, selected count, TP/FP, selection rate, TPR, FPR in micro — "
    "plus the global demographic-parity gap (max-min selection rate) "
    "and equalized-odds gap (worse of the TPR and FPR spreads): the "
    "pre-deployment fairness gate next to the calibration gate "
    "(ml_reliability_ece) and the cost gate (ml_cost_threshold); "
    "empty classes report 0 rates by convention. EXACT: integer "
    "counts and floor-division rates end-to-end. Shape: ONE fact "
    "hash-agg into a 5-row cohort dim; the gap windows run over those "
    "5 bounded rows",
)
def ml_fairness_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _score_df(spark, sf_dir)
    g = p.groupBy(
        F.pmod(F.col("user_id"), F.lit(5)).cast("int").alias("cohort")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(F.when(F.col("p_micro") >= 500000, 1).otherwise(0))
        .cast("bigint")
        .alias("n_predpos"),
        F.sum(
            F.when((F.col("p_micro") >= 500000) & (F.col("y") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
    )
    rates = g.select(
        "cohort",
        "n",
        "n_pos",
        "n_predpos",
        "tp",
        (F.col("n_predpos") - F.col("tp")).cast("bigint").alias("fp"),
        F.expr("CAST(n_predpos * 1000000 div n AS BIGINT)").alias(
            "sel_micro"
        ),
        F.expr(
            "CAST(CASE WHEN n_pos = 0 THEN 0"
            " ELSE tp * 1000000 div n_pos END AS BIGINT)"
        ).alias("tpr_micro"),
        F.expr(
            "CAST(CASE WHEN n - n_pos = 0 THEN 0"
            " ELSE (n_predpos - tp) * 1000000 div (n - n_pos) END"
            " AS BIGINT)"
        ).alias("fpr_micro"),
    )
    w = Window.partitionBy()
    return rates.select(
        "*",
        (F.max("sel_micro").over(w) - F.min("sel_micro").over(w))
        .cast("bigint")
        .alias("dp_gap_micro"),
        F.greatest(
            F.max("tpr_micro").over(w) - F.min("tpr_micro").over(w),
            F.max("fpr_micro").over(w) - F.min("fpr_micro").over(w),
        )
        .cast("bigint")
        .alias("eo_gap_micro"),
    )


# ---------------------------------------------------------------------------
# ml_brier_decomp
# ---------------------------------------------------------------------------

_BRIER_DECOMP_SQL = f"""
    WITH {_SCORE_CTE},
    b AS (
      SELECT least(p_micro // 100000, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_b,
             CAST(sum(p_micro) AS BIGINT) AS sp,
             CAST(sum(y) AS BIGINT) AS pos
      FROM p GROUP BY 1),
    tot AS MATERIALIZED (
      SELECT CAST(sum(n_b) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS pos
      FROM b),
    base AS MATERIALIZED (
      SELECT CAST(pos * 1000000 // n AS BIGINT) AS base_micro FROM tot),
    terms AS (
      SELECT
        CAST(sum(CAST((sp // n_b - 1000000 * pos // n_b)
          * (sp // n_b - 1000000 * pos // n_b) AS HUGEINT) * n_b)
          // ((SELECT n FROM tot) * 1000000) AS BIGINT) AS rel_micro,
        CAST(sum(CAST((1000000 * pos // n_b - (SELECT base_micro FROM base))
          * (1000000 * pos // n_b - (SELECT base_micro FROM base))
          AS HUGEINT) * n_b)
          // ((SELECT n FROM tot) * 1000000) AS BIGINT) AS res_micro
      FROM b)
    SELECT (SELECT n FROM tot) AS n,
           (SELECT base_micro FROM base) AS base_micro,
           rel_micro, res_micro,
           CAST((SELECT base_micro FROM base)
             * (1000000 - (SELECT base_micro FROM base)) // 1000000
             AS BIGINT) AS unc_micro,
           CAST(rel_micro - res_micro
             + (SELECT base_micro FROM base)
               * (1000000 - (SELECT base_micro FROM base)) // 1000000
             AS BIGINT) AS brier_binned_micro
    FROM terms
"""


@register(
    "ml_brier_decomp",
    _BRIER_DECOMP_SQL,
    "Murphy decomposition of the Brier score over the shared 10-bin "
    "confidence deciles: reliability (mean squared calibration gap, "
    "weighted by bin mass), resolution (how far bin accuracies "
    "separate from the base rate), uncertainty (base-rate variance), "
    "and the binned-Brier identity REL - RES + UNC — "
    "ml_brier_log_loss gives the score, this explains WHERE it comes "
    "from (calibrated-but-useless vs sharp-but-miscalibrated are "
    "different failures with different fixes, and only the "
    "decomposition distinguishes them). EXACT: per-bin confidences "
    "and accuracies are floored to micro first (deterministic on both "
    "engines), squared gaps are carried in int128/decimal(38,0) — the "
    "ml_auc_exact discipline — and divided once at the end. Shape: "
    "ONE fact hash-agg into 10 bins; every later stage runs over "
    "those 10 bounded rows",
)
def ml_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _score_df(spark, sf_dir)
    b = p.groupBy(
        F.expr("least(p_micro div 100000, 9)").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("p_micro").cast("bigint").alias("sp"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = b.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("tpos"),
    ).withColumn(
        "base_micro", F.expr("CAST(tpos * 1000000 div n AS BIGINT)")
    )
    terms = (
        b.crossJoin(F.broadcast(tot))
        .agg(
            F.expr(
                "CAST(sum(CAST((sp div n_b - 1000000 * pos div n_b)"
                " * (sp div n_b - 1000000 * pos div n_b)"
                " AS DECIMAL(38,0)) * n_b)"
                " div (max(n) * 1000000) AS BIGINT)"
            ).alias("rel_micro"),
            F.expr(
                "CAST(sum(CAST((1000000 * pos div n_b - base_micro)"
                " * (1000000 * pos div n_b - base_micro)"
                " AS DECIMAL(38,0)) * n_b)"
                " div (max(n) * 1000000) AS BIGINT)"
            ).alias("res_micro"),
            F.max("n").alias("n"),
            F.max("base_micro").alias("base_micro"),
        )
    )
    return terms.select(
        "n",
        "base_micro",
        "rel_micro",
        "res_micro",
        F.expr(
            "CAST(base_micro * (1000000 - base_micro) div 1000000"
            " AS BIGINT)"
        ).alias("unc_micro"),
        F.expr(
            "CAST(rel_micro - res_micro"
            " + base_micro * (1000000 - base_micro) div 1000000"
            " AS BIGINT)"
        ).alias("brier_binned_micro"),
    )


# ---------------------------------------------------------------------------
# ml_auc_by_group
# ---------------------------------------------------------------------------

_AUC_GRP_SQL = """
    WITH s AS (
      SELECT source, n_chars AS score,
             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS c0
      FROM documents GROUP BY source, n_chars),
    p AS (
      SELECT source, c1, c0,
             coalesce(sum(c0) OVER (PARTITION BY source ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS c0_below
      FROM s),
    t AS (
      SELECT source,
             CAST(sum(c1) AS BIGINT) AS n_pos,
             CAST(sum(c0) AS BIGINT) AS n_neg,
             sum(CAST(2 * c0_below * c1 + c0 * c1 AS HUGEINT)) AS num
      FROM p GROUP BY 1)
    SELECT source, n_pos, n_neg,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.0
                ELSE round(CAST(num AS DOUBLE)
                  / (2.0 * CAST(n_pos AS DOUBLE)
                     * CAST(n_neg AS DOUBLE)), 6) END AS auc
    FROM t
"""


@register(
    "ml_auc_by_group",
    _AUC_GRP_SQL,
    "exact per-group ROC AUC (Mann-Whitney with half-credit ties) of "
    "score n_chars against label lang='en', grouped by SOURCE — the "
    "slice view behind ml_auc_exact's single number: a global AUC can "
    "hide a collapsed slice exactly as a global accuracy does "
    "(ml_error_slices), and per-domain ranking quality is what "
    "decides whether one quality model can gate every source. Groups "
    "with an empty class report 0.0 by convention. EXACT: the "
    "ml_auc_exact contingency-table discipline per group — corpus -> "
    "ONE (group, score) hash-agg -> prefix window bounded by group x "
    "value domain -> per-group agg; the numerator rides in "
    "int128/decimal(38,0)",
)
def ml_auc_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source", F.col("n_chars").alias("score")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1)).alias("c0"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    p = s.select(
        "source",
        "c1",
        "c0",
        F.coalesce(F.sum("c0").over(w), F.lit(0)).alias("c0_below"),
    )
    t = p.groupBy("source").agg(
        F.sum("c1").cast("bigint").alias("n_pos"),
        F.sum("c0").cast("bigint").alias("n_neg"),
        F.sum(
            (2 * F.col("c0_below") * F.col("c1") + F.col("c0") * F.col("c1"))
            .cast("decimal(38,0)")
        ).alias("num"),
    )
    return t.select(
        "source",
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.0"
            " ELSE round(CAST(num AS DOUBLE)"
            " / (2.0 * CAST(n_pos AS DOUBLE)"
            " * CAST(n_neg AS DOUBLE)), 6) END"
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# ml_risk_coverage
# ---------------------------------------------------------------------------

_RISK_COV_SQL = f"""
    WITH {_SCORE_CTE},
    scored AS (
      SELECT y,
             CASE WHEN p_micro >= 500000 THEN 1 ELSE 0 END AS pred,
             greatest(p_micro, 1000000 - p_micro) AS conf
      FROM p),
    ths AS (SELECT unnest([500000, 600000, 700000, 800000, 900000])
              AS thresh),
    cov AS (
      SELECT t.thresh,
             CAST(count(*) AS BIGINT) AS n_covered,
             CAST(sum(CASE WHEN s.pred = s.y THEN 1 ELSE 0 END)
               AS BIGINT) AS n_correct
      FROM scored s JOIN ths t ON s.conf >= t.thresh
      GROUP BY 1)
    SELECT CAST(d.thresh AS BIGINT) AS thresh,
           CAST(coalesce(c.n_covered, 0) AS BIGINT) AS n_covered,
           CAST(coalesce(c.n_correct, 0) AS BIGINT) AS n_correct,
           CAST(coalesce(c.n_covered, 0) * 1000000
             // (SELECT n FROM t) AS BIGINT) AS coverage_micro,
           CAST(CASE WHEN coalesce(c.n_covered, 0) = 0 THEN 0
             ELSE c.n_correct * 1000000 // c.n_covered END AS BIGINT)
             AS acc_micro
    FROM ths d LEFT JOIN cov c ON d.thresh = c.thresh
"""


@register(
    "ml_risk_coverage",
    _RISK_COV_SQL,
    "selective-prediction risk-coverage table over the shared score "
    "model: at confidence thresholds 0.5-0.9 (confidence = "
    "max(p, 1-p) at the fixed 0.5 operating point), the covered "
    "traffic share and the accuracy on the kept slice — abstention is "
    "the first mitigation a production classifier ships, and this "
    "prices the abstain/serve tradeoff (ml_cost_threshold tunes WHERE "
    "to cut; this tunes WHETHER to answer). Thresholds with no "
    "covered traffic report 0 by convention. EXACT: integer counts, "
    "floor-division rates. Shape: ONE fact scan fanned by a broadcast "
    "5-row threshold dim (theta join on conf >= t), then a 5-row "
    "hash-agg — no windows, no second scan",
)
def ml_risk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _score_df(spark, sf_dir)
    scored = p.select(
        "y",
        "n",
        F.when(F.col("p_micro") >= 500000, 1).otherwise(0).alias("pred"),
        F.greatest(
            F.col("p_micro"), F.lit(1000000) - F.col("p_micro")
        ).alias("conf"),
    )
    ths = F.broadcast(
        spark.createDataFrame(
            [(500000,), (600000,), (700000,), (800000,), (900000,)],
            "thresh bigint",
        )
    )
    cov = (
        scored.join(ths, scored["conf"] >= ths["thresh"])
        .groupBy("thresh")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_covered"),
            F.sum(F.when(F.col("pred") == F.col("y"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
        )
    )
    n_total = p.agg(F.max("n").alias("n"))
    return (
        ths.join(cov, "thresh", "left")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col("thresh").cast("bigint").alias("thresh"),
            F.coalesce("n_covered", F.lit(0))
            .cast("bigint")
            .alias("n_covered"),
            F.coalesce("n_correct", F.lit(0))
            .cast("bigint")
            .alias("n_correct"),
            F.expr(
                "CAST(coalesce(n_covered, 0) * 1000000 div n AS BIGINT)"
            ).alias("coverage_micro"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_covered, 0) = 0 THEN 0"
                " ELSE n_correct * 1000000 div n_covered END AS BIGINT)"
            ).alias("acc_micro"),
        )
    )


# ---------------------------------------------------------------------------
# ml_confident_learning
# ---------------------------------------------------------------------------

_CL_SQL = f"""
    WITH {_SCORE_CTE},
    th AS MATERIALIZED (
      SELECT
        CAST(sum(CASE WHEN y = 1 THEN p_micro ELSE 0 END)
          // greatest(sum(y), 1) AS BIGINT) AS t1,
        CAST(sum(CASE WHEN y = 0 THEN 1000000 - p_micro ELSE 0 END)
          // greatest(count(*) - sum(y), 1) AS BIGINT) AS t0
      FROM p),
    joint AS (
      SELECT y,
             CASE
               WHEN p_micro >= (SELECT t1 FROM th)
                    AND 1000000 - p_micro >= (SELECT t0 FROM th)
                 THEN CASE WHEN p_micro >= 1000000 - p_micro
                   THEN 1 ELSE 0 END
               WHEN p_micro >= (SELECT t1 FROM th) THEN 1
               WHEN 1000000 - p_micro >= (SELECT t0 FROM th) THEN 0
               ELSE -1
             END AS pred
      FROM p),
    c AS (
      SELECT y, pred, CAST(count(*) AS BIGINT) AS n
      FROM joint WHERE pred >= 0 GROUP BY 1, 2)
    SELECT CAST(y AS INT) AS y, CAST(pred AS INT) AS pred, n,
           CAST(n * 1000000 // sum(n) OVER () AS BIGINT) AS share_micro,
           CAST(sum(CASE WHEN y <> pred THEN n ELSE 0 END) OVER ()
             * 1000000 // sum(n) OVER () AS BIGINT) AS noise_micro
    FROM c
"""


@register(
    "ml_confident_learning",
    _CL_SQL,
    "confident-learning label-noise estimate (the confident joint, "
    "binary form): per-class confidence thresholds = the class's mean "
    "predicted probability over the shared score model; each example "
    "confidently predicted into a class (prob >= that class's "
    "threshold; argmax when both qualify, ties to class 1; dropped "
    "when neither) fills the (given label x confident prediction) "
    "2x2 joint — off-diagonal mass over counted mass is the estimated "
    "label-noise rate, THE curation signal for whether a label column "
    "can gate training data (a noisy label filter silently deletes "
    "good data). EXACT: thresholds are floor-divided means of integer "
    "micros; every cell an integer count. Shape: two fact hash-aggs "
    "(thresholds, then the joint) with a 1-row broadcast between "
    "them; the share/noise windows run over <= 4 joint rows",
)
def ml_confident_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _score_df(spark, sf_dir)
    th = p.agg(
        F.expr(
            "CAST(sum(CASE WHEN y = 1 THEN p_micro ELSE 0 END)"
            " div greatest(sum(y), 1) AS BIGINT)"
        ).alias("t1"),
        F.expr(
            "CAST(sum(CASE WHEN y = 0 THEN 1000000 - p_micro ELSE 0 END)"
            " div greatest(count(1) - sum(y), 1) AS BIGINT)"
        ).alias("t0"),
    )
    joint = p.crossJoin(F.broadcast(th)).select(
        "y",
        F.expr(
            "CASE"
            " WHEN p_micro >= t1 AND 1000000 - p_micro >= t0"
            " THEN CASE WHEN p_micro >= 1000000 - p_micro"
            " THEN 1 ELSE 0 END"
            " WHEN p_micro >= t1 THEN 1"
            " WHEN 1000000 - p_micro >= t0 THEN 0"
            " ELSE -1 END"
        ).alias("pred"),
    )
    c = (
        joint.filter(F.col("pred") >= 0)
        .groupBy("y", "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return c.select(
        F.col("y").cast("int").alias("y"),
        F.col("pred").cast("int").alias("pred"),
        "n",
        F.expr(
            "CAST(n * 1000000 div sum(n) OVER () AS BIGINT)"
        ).alias("share_micro"),
        F.expr(
            "CAST(sum(CASE WHEN y <> pred THEN n ELSE 0 END) OVER ()"
            " * 1000000 div sum(n) OVER () AS BIGINT)"
        ).alias("noise_micro"),
    )
