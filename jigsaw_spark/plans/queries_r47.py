"""Round-9 batch 7: quantile-forecast scoring, lexical diversity, and
cost-sensitive threshold selection.

- ``ts_pinball_loss``: pinball (quantile) loss of the weekly
  seasonal-naive forecast at q=0.5 and q=0.9 per event type — the
  scoring rule for QUANTILE forecasts (MASE/MAPE grade point
  forecasts; a P90 capacity forecast is graded by pinball, which
  penalizes under-prediction q/(1-q) times harder). Exact: with q in
  integer percent the loss q*(y-f) / (q-100)*(y-f) is pure integer
  centi-cent arithmetic.
- ``text_lexical_diversity``: per-language type-token ratio and hapax
  share — the corpus-health twins (a scraped corpus full of templated
  text shows low TTR; one full of OCR noise shows a bloated hapax
  tail). Complements text_entropy/readability in the quality family.
- ``ml_cost_threshold``: cost-sensitive operating-point selection over
  the shared min-max score model: with FP cost 1 and FN cost 5, sweep
  every distinct score threshold and return the argmin-cost point
  (highest threshold on ties) next to the all-negative baseline —
  the step AFTER the curves (ml_auc_exact / ml_pr_curve / ml_auprc
  grade the ranking; this picks where to cut it).

Scale notes (100 TB): pinball is the MASE shape (day-grain pre-agg +
one shifted-key join, x2 quantile dim); lexical diversity is one
explode -> (lang, token) hash-agg -> per-lang rollup; the threshold
sweep's cumulative windows run over the DISTINCT-SCORE dim
(value-domain bounded — the ml_auc_exact discipline), never the facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ts_pinball_loss
# ---------------------------------------------------------------------------

_PINBALL_SQL = """
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    joined AS (
      SELECT a.event_type, a.cents - b.cents AS diff
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day = a.day - 7),
    qdim AS (SELECT unnest([50, 90]) AS q),
    losses AS (
      SELECT j.event_type, q.q,
             CASE WHEN j.diff >= 0 THEN q.q * j.diff
                  ELSE (q.q - 100) * j.diff END AS loss_centi
      FROM joined j CROSS JOIN qdim q)
    SELECT event_type, CAST(q AS INT) AS q,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(loss_centi) AS BIGINT) AS sum_loss_centi,
           CAST(sum(loss_centi) * 10000 // count(*) AS BIGINT)
             AS mean_loss_micro
    FROM losses GROUP BY 1, 2
"""


@register(
    "ts_pinball_loss",
    _PINBALL_SQL,
    "pinball (quantile) loss of the weekly seasonal-naive forecast at "
    "q=0.5 and q=0.9 per event type — the proper scoring rule for "
    "QUANTILE forecasts: MASE/MAPE grade the point forecast, but a "
    "P90 capacity forecast must be graded by pinball, which charges "
    "under-prediction q/(1-q) times more than over-prediction (at "
    "q=0.5 it is half the absolute error — the consistency check "
    "against ts_mase's numerator). EXACT: q in integer percent makes "
    "each loss term q*(y-f) or (q-100)*(y-f) pure integer centi-cents; "
    "the mean is one integer division to micro-cents. Shape: the "
    "ts_mase shape — day-grain pre-agg, ONE shifted-key equi-join, a "
    "2-row quantile dim crossed in, one hash-agg",
)
def ts_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    b = daily.select(
        F.col("event_type").alias("bet"),
        (F.col("day") + 7).alias("bday"),
        F.col("cents").alias("bcents"),
    )
    joined = daily.alias("a").join(
        b,
        (F.col("a.event_type") == F.col("bet"))
        & (F.col("a.day") == F.col("bday")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("a.cents") - F.col("bcents")).alias("diff"),
    )
    qdim = F.broadcast(spark.createDataFrame([(50,), (90,)], "q int"))
    losses = joined.crossJoin(qdim).select(
        "event_type",
        "q",
        F.when(
            F.col("diff") >= 0, F.col("q").cast("bigint") * F.col("diff")
        )
        .otherwise((F.col("q").cast("bigint") - 100) * F.col("diff"))
        .alias("loss_centi"),
    )
    return losses.groupBy("event_type", "q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("loss_centi").cast("bigint").alias("sum_loss_centi"),
        F.expr(
            "CAST(sum(loss_centi) * 10000 div count(*) AS BIGINT)"
        ).alias("mean_loss_micro"),
    ).select(
        "event_type",
        F.col("q").cast("int").alias("q"),
        "n",
        "sum_loss_centi",
        "mean_loss_micro",
    )


# ---------------------------------------------------------------------------
# text_lexical_diversity
# ---------------------------------------------------------------------------


def _lexical_diversity_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH tok AS (
      SELECT lang, unnest({tokens_sql('text')}) AS tok FROM documents),
    counts AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2)
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(count(*) * 1000000 // sum(c) AS BIGINT) AS ttr_micro,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000
                // count(*) AS BIGINT) AS hapax_milli
    FROM counts GROUP BY 1
"""


@register(
    "text_lexical_diversity",
    _lexical_diversity_sql(),
    "per-language type-token ratio and hapax-legomenon share — the "
    "corpus-health twins every curation run reads: templated/boiler-"
    "plate-heavy corpora show a collapsed TTR (few types, many "
    "tokens), OCR- or mojibake-polluted corpora show a bloated hapax "
    "tail (types seen exactly once). Complements text_entropy and the "
    "readability/quality gates with vocabulary-level signals. Exact "
    "integer micro/milli ratios. Shape: one explode -> (lang, token) "
    "hash-agg -> per-lang rollup; the token dim is vocabulary-bounded, "
    "the corpus is scanned once",
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    counts = (
        docs.select("lang", F.explode(tokens_expr("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return counts.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr(
            "CAST(count(*) * 1000000 div sum(c) AS BIGINT)"
        ).alias("ttr_micro"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000"
            " div count(*) AS BIGINT)"
        ).alias("hapax_milli"),
    )


# ---------------------------------------------------------------------------
# ml_cost_threshold
# ---------------------------------------------------------------------------

_COST_FP = 1
_COST_FN = 5

_COST_THRESHOLD_SQL = f"""
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS npos
      FROM s),
    p AS (
      SELECT y,
             CASE WHEN (SELECT hi - lo FROM t) = 0 THEN 500000
                  ELSE (cents - (SELECT lo FROM t)) * 1000000
                       // (SELECT hi - lo FROM t) END AS p_micro
      FROM s),
    g AS (
      SELECT p_micro, CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(y) AS BIGINT) AS pos_k
      FROM p GROUP BY 1),
    c AS (
      SELECT p_micro,
             sum(pos_k) OVER (ORDER BY p_micro DESC) AS tp,
             sum(n_k - pos_k) OVER (ORDER BY p_micro DESC) AS fp
      FROM g),
    costs AS (
      SELECT p_micro, tp, fp,
             (SELECT npos FROM t) - tp AS fn,
             {_COST_FP} * fp
               + {_COST_FN} * ((SELECT npos FROM t) - tp) AS cost
      FROM c),
    best AS (
      SELECT * FROM costs
      ORDER BY cost, p_micro DESC LIMIT 1)
    SELECT CAST(b.p_micro AS BIGINT) AS best_threshold_micro,
           CAST(b.tp AS BIGINT) AS tp,
           CAST(b.fp AS BIGINT) AS fp,
           CAST(b.fn AS BIGINT) AS fn,
           CAST(b.cost AS BIGINT) AS best_cost,
           CAST({_COST_FN} * (SELECT npos FROM t) AS BIGINT)
             AS all_negative_cost
    FROM best b
"""


@register(
    "ml_cost_threshold",
    _COST_THRESHOLD_SQL,
    "cost-sensitive operating-point selection over the shared min-max "
    "score model: with FP cost 1 and FN cost 5 (the asymmetric-cost "
    "reality of fraud/abuse/medical screens), sweep EVERY distinct "
    "score threshold (predict positive at p >= t) and return the "
    "argmin-cost point — highest threshold on ties — next to the "
    "all-negative baseline cost. The step AFTER the curves: "
    "ml_auc_exact / ml_pr_curve / ml_auprc_exact grade the ranking, "
    "this picks where to cut it, and it is the number a deployment "
    "actually configures. Exact integers end-to-end (costs are "
    "integer counts times literal integer costs). Shape: one fact "
    "hash-agg into the distinct-score dim; cumulative windows and the "
    "top-1 ordering run over that value-domain-bounded dim only",
)
def ml_cost_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    t = s.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("npos"),
    )
    p = s.crossJoin(F.broadcast(t)).select(
        "y",
        "npos",
        F.expr(
            "CASE WHEN hi - lo = 0 THEN 500000"
            " ELSE (cents - lo) * 1000000 div (hi - lo) END"
        ).alias("p_micro"),
    )
    g = p.groupBy("p_micro").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("y").cast("bigint").alias("pos_k"),
        F.first("npos").alias("npos"),
    )
    w = (
        Window.orderBy(F.desc("p_micro"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    costs = g.select(
        "p_micro",
        "npos",
        F.sum("pos_k").over(w).alias("tp"),
        F.sum(F.col("n_k") - F.col("pos_k")).over(w).alias("fp"),
    ).select(
        "p_micro",
        "npos",
        "tp",
        "fp",
        (F.col("npos") - F.col("tp")).alias("fn"),
        (
            F.lit(_COST_FP) * F.col("fp")
            + F.lit(_COST_FN) * (F.col("npos") - F.col("tp"))
        ).alias("cost"),
    )
    best = costs.orderBy("cost", F.desc("p_micro")).limit(1)
    return best.select(
        F.col("p_micro").cast("bigint").alias("best_threshold_micro"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.col("cost").cast("bigint").alias("best_cost"),
        (F.lit(_COST_FN) * F.col("npos"))
        .cast("bigint")
        .alias("all_negative_cost"),
    )
