"""Round-8 batch: proper scoring rules, ranking/agreement metrics,
survival analysis, cross-table reconciliation, and embedding drift —

- ``ml_brier_log_loss``: Brier score (exact integer micro^2 units) and
  log loss (pre-rounded nano-nat terms, integer-summed) for the
  min-max-normalized value score against the purchase outcome — the
  proper-scoring-rule pair every probabilistic model report needs
  (``ml_calibration_bins`` shows WHERE miscalibration lives; these are
  the single-number versions).
- ``ml_ndcg_exact``: DCG/IDCG/NDCG@10 per event_type (users ranked by
  exact spend, graded relevance = purchase count) — the ranking-quality
  metric for search/recommendation eval.
- ``ml_survival_km``: Kaplan-Meier time-to-first-purchase (users who
  never purchase are right-censored at their last activity day) —
  conversion expressed as a survival curve, the censoring-aware twin
  of ``rel_funnel_conversion``.
- ``ml_kappa_mcc``: Cohen's kappa (exact integer micro-units) and
  Matthews correlation for the Naive Bayes domain gate's confusion
  matrix — the chance-corrected agreement metrics
  ``ml_confusion_metrics`` does not give.
- ``dq_reconciliation``: cross-table financial reconciliation — per
  order, o_totalprice vs the lineitem-recomputed total in EXACT cents
  (integer percent discount/tax), discrepancies bucketed by sign x
  decimal-digit magnitude, orders with no lineitems reported as their
  own class. The double-entry audit every warehouse load runs.
- ``dq_embedding_drift``: per-label centroid drift between the two
  vec_id-parity halves of the embedding table, kept EXACT as integer
  rationals: per-dimension difference numerators over a common
  denominator, L1 drift numerator, and the argmax dimension — a
  training/serving skew screen with zero floats.
- ``ts_rolling_median``: 7-day rolling exact median (x2 units, so the
  even-count midpoint stays integer) of daily cents per event_type —
  the robust-trend smoother (vs ``ts_ewma``'s mean-based one).

Scale notes (100 TB): every query is hash-agg shaped with bounded-dim
windows. NDCG's per-group rank windows partition by event_type (top-10
extraction; per-partition sort is the classic top-k); Kaplan-Meier's
only unpartitioned window runs over distinct lifetime DAYS (bounded by
the calendar span, not |users|); rolling median partitions by series
key; reconciliation is one lineitem hash-agg + one orders join;
embedding drift is a posexplode -> (label, dim) hash-agg (map-side
combinable, |labels| x dim cells). Brier/log-loss are single
map+agg passes with DECIMAL(38,0) sums (bigint would wrap at ~1e6
rows x 1e12 max term).

Float discipline: Brier, kappa, reconciliation, embedding drift, and
rolling median are exact integers end-to-end. Log loss pre-rounds each
term to integer nano-nats BEFORE summing (identical double inputs on
both engines -> identical integers -> order-free exact sums; a raw
float sum over unbounded rows would drift past any snap). NDCG /
survival emit libm-fed doubles over BOUNDED term counts (<=10 per
group / ordered cumulative along the day dim) with the
round(round(x, 9), 6) snap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ml_brier_log_loss
# ---------------------------------------------------------------------------

_BRIER_SQL = """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi, count(*) AS n FROM s),
    p AS (
      SELECT y,
             CASE WHEN (SELECT hi - lo FROM t) = 0 THEN 500000
                  ELSE (cents - (SELECT lo FROM t)) * 1000000
                       // (SELECT hi - lo FROM t) END AS p_micro
      FROM s),
    terms AS (
      SELECT y, p_micro,
             least(greatest(p_micro, 1), 999999) AS p1
      FROM p),
    nano AS (
      SELECT (p_micro - y * 1000000) * (p_micro - y * 1000000) AS sq_e12,
             CAST(round(CASE WHEN y = 1
                    THEN -ln(CAST(p1 AS DOUBLE) / 1000000.0)
                    ELSE -ln(CAST(1000000 - p1 AS DOUBLE) / 1000000.0)
                  END * 1000000000.0, 0) AS BIGINT) AS ll_nano
      FROM terms)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n,
           CAST(sum(sq_e12) // (SELECT n FROM t) AS BIGINT) AS brier_e12,
           CAST(sum(ll_nano) // ((SELECT n FROM t) * 1000) AS BIGINT)
             AS log_loss_micro
    FROM nano
"""


@register(
    "ml_brier_log_loss",
    _BRIER_SQL,
    "proper scoring rules for the min-max-normalized value score vs "
    "the purchase outcome: Brier score in exact integer micro^2 units "
    "(mean squared (p - y), floor division) and log loss in integer "
    "micro-nats — each row's -ln term is computed from identical "
    "integer-derived doubles on both engines and ROUNDED TO INTEGER "
    "NANO-NATS BEFORE SUMMING, so the sum is order-free exact integer "
    "arithmetic at any row count (a raw float sum over unbounded rows "
    "drifts past any snap; this is the scalable form of the MI/ln "
    "discipline). p clamped to [1e-6, 1-1e-6] for the logs only. "
    "Shape: ONE events scan, broadcast min/max/n, one map pass, one "
    "agg — sums in DECIMAL(38,0) (DuckDB HUGEINT) so nothing wraps at "
    "1e12 rows x 1e12 max term",
)
def ml_brier_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    t = s.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    p = s.crossJoin(F.broadcast(t)).select(
        "y",
        "n",
        F.expr(
            "CASE WHEN hi - lo = 0 THEN CAST(500000 AS BIGINT)"
            " ELSE (cents - lo) * 1000000 div (hi - lo) END"
        ).alias("p_micro"),
    )
    terms = p.withColumn(
        "p1", F.expr("least(greatest(p_micro, 1), 999999)")
    )
    nano = terms.select(
        "n",
        F.expr(
            "CAST((p_micro - y * 1000000) * (p_micro - y * 1000000)"
            " AS DECIMAL(38,0))"
        ).alias("sq_e12"),
        F.expr(
            "CAST(CAST(round(CASE WHEN y = 1"
            " THEN -ln(CAST(p1 AS DOUBLE) / 1000000.0)"
            " ELSE -ln(CAST(1000000 - p1 AS DOUBLE) / 1000000.0)"
            " END * 1000000000.0, 0) AS BIGINT) AS DECIMAL(38,0))"
        ).alias("ll_nano"),
    )
    return nano.agg(
        F.max("n").cast("bigint").alias("n"),
        F.expr("CAST(sum(sq_e12) div max(n) AS BIGINT)").alias("brier_e12"),
        F.expr(
            "CAST(sum(ll_nano) div (max(n) * 1000) AS BIGINT)"
        ).alias("log_loss_micro"),
    )


# ---------------------------------------------------------------------------
# ml_ndcg_exact
# ---------------------------------------------------------------------------

_NDCG_SQL = """
    WITH u AS (
      SELECT event_type, user_id,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS spend
      FROM events GROUP BY 1, 2),
    rel AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS r
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    c AS (
      SELECT u.event_type, u.user_id, u.spend,
             coalesce(rel.r, 0) AS r
      FROM u LEFT JOIN rel ON u.user_id = rel.user_id),
    ranked AS (
      SELECT event_type, r,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY spend DESC, user_id) AS rn,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY r DESC, user_id) AS irn
      FROM c),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_users,
             sum(CASE WHEN rn <= 10 THEN
                   CAST(r AS DOUBLE) * ln(2.0)
                   / ln(CAST(rn + 1 AS DOUBLE)) ELSE 0 END) AS dcg,
             sum(CASE WHEN irn <= 10 THEN
                   CAST(r AS DOUBLE) * ln(2.0)
                   / ln(CAST(irn + 1 AS DOUBLE)) ELSE 0 END) AS idcg
      FROM ranked GROUP BY 1)
    SELECT event_type, n_users,
           round(round(dcg, 9), 6) AS dcg_at10,
           round(round(idcg, 9), 6) AS idcg_at10,
           CASE WHEN idcg = 0 THEN 0.0
                ELSE round(round(dcg / idcg, 9), 6) END AS ndcg_at10
    FROM g
"""


@register(
    "ml_ndcg_exact",
    _NDCG_SQL,
    "NDCG@10 per event_type: users ranked by exact spend cents (tie: "
    "user_id), graded relevance = the user's purchase count; DCG = sum "
    "rel_i * ln(2)/ln(i+1) over the top 10, IDCG from the "
    "relevance-ideal ordering of the SAME candidate set, NDCG guarded "
    "at idcg=0 — the ranking-quality metric behind search/reco eval. "
    "log2 is spelled ln(2)/ln(x) IDENTICALLY on both engines (Spark's "
    "log2 and DuckDB's log2 need not agree to the ulp; the explicit "
    "ln ratio does). Both rank windows partition by event_type — the "
    "classic per-group top-k; sums are <=10 libm terms per group, "
    "snapped round(round(x,9),6). Integer ranks/relevance elsewhere",
)
def ml_ndcg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("event_type", "user_id").agg(
        F.sum(
            F.round(F.col("value") * 100, 0).cast("bigint")
        ).alias("spend")
    )
    rel = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    c = u.join(rel, "user_id", "left").select(
        "event_type",
        "user_id",
        "spend",
        F.coalesce("r", F.lit(0).cast("bigint")).alias("r"),
    )
    wd = Window.partitionBy("event_type").orderBy(
        F.desc("spend"), F.col("user_id")
    )
    wi = Window.partitionBy("event_type").orderBy(
        F.desc("r"), F.col("user_id")
    )
    ranked = c.select(
        "event_type",
        "r",
        F.row_number().over(wd).alias("rn"),
        F.row_number().over(wi).alias("irn"),
    )
    term = "CAST(r AS DOUBLE) * ln(2.0) / ln(CAST({i} + 1 AS DOUBLE))"
    g = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(
            F.expr(
                f"CASE WHEN rn <= 10 THEN {term.format(i='rn')}"
                " ELSE 0 END"
            )
        ).alias("dcg"),
        F.sum(
            F.expr(
                f"CASE WHEN irn <= 10 THEN {term.format(i='irn')}"
                " ELSE 0 END"
            )
        ).alias("idcg"),
    )
    return g.select(
        "event_type",
        "n_users",
        F.round(F.round("dcg", 9), 6).alias("dcg_at10"),
        F.round(F.round("idcg", 9), 6).alias("idcg_at10"),
        F.when(F.col("idcg") == 0, F.lit(0.0))
        .otherwise(F.round(F.round(F.col("dcg") / F.col("idcg"), 9), 6))
        .alias("ndcg_at10"),
    )


# ---------------------------------------------------------------------------
# ml_survival_km
# ---------------------------------------------------------------------------

_KM_SQL = """
    WITH life AS (
      SELECT user_id,
             min(epoch_us(ts) // 86400000000) AS fd,
             max(epoch_us(ts) // 86400000000) AS ld,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(ts) // 86400000000 END) AS pd
      FROM events GROUP BY 1),
    t AS MATERIALIZED (SELECT count(*) AS n_users FROM life),
    obs AS (
      SELECT CASE WHEN pd IS NOT NULL THEN pd - fd ELSE ld - fd END AS dur,
             CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM life),
    g AS (
      SELECT dur,
             CAST(sum(ev) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS m
      FROM obs GROUP BY 1),
    risk AS (
      SELECT dur, d,
             (SELECT n_users FROM t)
               - coalesce(sum(m) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM g),
    lns AS (
      SELECT dur, d, n_risk,
             CASE WHEN d > 0 AND d < n_risk
                  THEN ln(CAST(n_risk - d AS DOUBLE)
                          / CAST(n_risk AS DOUBLE))
                  ELSE 0.0 END AS lnt,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS dead
      FROM risk),
    surv AS (
      SELECT dur, d, n_risk,
             sum(lnt) OVER (ORDER BY dur) AS cln,
             max(dead) OVER (ORDER BY dur) AS anydead
      FROM lns)
    SELECT CAST(dur AS BIGINT) AS t_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           d AS n_events,
           CASE WHEN anydead = 1 THEN 0.0
                ELSE round(round(exp(cln), 9), 6) END AS survival
    FROM surv WHERE d > 0
"""


@register(
    "ml_survival_km",
    _KM_SQL,
    "Kaplan-Meier time-to-first-purchase: duration = days from the "
    "user's first event to their first purchase; users who never "
    "purchase are right-CENSORED at their last activity day (their "
    "conversion clock is still running); per event time: at-risk "
    "count, events, and the product-limit survival estimate — "
    "conversion as the censoring-aware survival curve "
    "rel_funnel_conversion cannot express. S(t) is "
    "computed as exp(cumulative sum of ln((n-d)/n)) along the day dim "
    "— identical integer-ratio ln arguments, identical accumulation "
    "order on both engines, round(round(x,9),6) snap; n_risk hits 0 -> "
    "survival pinned to exactly 0. The only unpartitioned window runs "
    "over DISTINCT LIFETIME DAYS (calendar-span bounded, not |users|); "
    "everything upstream is one user-keyed hash agg. Positive-epoch "
    "domain (events are post-1970; floor/trunc day division agrees)",
)
def ml_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        F.expr("min(unix_micros(ts) div 86400000000)").alias("fd"),
        F.expr("max(unix_micros(ts) div 86400000000)").alias("ld"),
        F.expr(
            "min(CASE WHEN event_type = 'purchase'"
            " THEN unix_micros(ts) div 86400000000 END)"
        ).alias("pd"),
    )
    t = life.agg(F.count(F.lit(1)).alias("n_users"))
    obs = life.crossJoin(F.broadcast(t)).select(
        F.expr(
            "CASE WHEN pd IS NOT NULL THEN pd - fd ELSE ld - fd END"
        ).alias("dur"),
        F.expr("CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END").alias("ev"),
        "n_users",
    )
    g = obs.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.max("n_users").alias("n_users"),
    )
    wprev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = g.select(
        "dur",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("m").over(wprev), F.lit(0))
        ).alias("n_risk"),
    )
    lns = risk.select(
        "dur",
        "d",
        "n_risk",
        F.expr(
            "CASE WHEN d > 0 AND d < n_risk"
            " THEN ln(CAST(n_risk - d AS DOUBLE)"
            " / CAST(n_risk AS DOUBLE)) ELSE 0.0 END"
        ).alias("lnt"),
        F.expr("CASE WHEN d >= n_risk THEN 1 ELSE 0 END").alias("dead"),
    )
    wcum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    surv = lns.select(
        "dur",
        "d",
        "n_risk",
        F.sum("lnt").over(wcum).alias("cln"),
        F.max("dead").over(wcum).alias("anydead"),
    )
    return surv.filter(F.col("d") > 0).select(
        F.col("dur").cast("bigint").alias("t_days"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.when(F.col("anydead") == 1, F.lit(0.0))
        .otherwise(F.round(F.round(F.exp("cln"), 9), 6))
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# ml_kappa_mcc
# ---------------------------------------------------------------------------


def _kappa_sql() -> str:
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
    k AS (
      SELECT tp, fp, fn, tn,
             CAST(tp + fp + fn + tn AS DECIMAL(38,0)) AS n,
             CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)
               + CAST(fn + tn AS DECIMAL(38,0)) * (fp + tn) AS x
      FROM cm),
    o AS (
      SELECT tp, fp, fn, tn,
             n * (tp + tn) - x AS knum,
             n * n - x AS kden,
             CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn AS mnum,
             sqrt((CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE))
                  * (CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)))
               AS mden
      FROM k)
    SELECT tp, fp, fn, tn,
           CAST(CASE WHEN kden = 0 THEN 0
                WHEN knum < 0 THEN -((-knum * 1000000) // kden)
                ELSE (knum * 1000000) // kden END AS BIGINT)
             AS kappa_micro,
           CASE WHEN mden = 0 THEN 0.0
                ELSE round(round(mnum / mden, 9), 6) END AS mcc
    FROM o
"""


@register(
    "ml_kappa_mcc",
    _kappa_sql(),
    "chance-corrected agreement for the Naive Bayes domain gate's "
    "confusion matrix: Cohen's kappa as EXACT integer micro-units "
    "((N*(tp+tn) - X) / (N^2 - X) with X the chance-agreement product "
    "sum, DECIMAL(38,0) so N^2 never wraps, truncation-toward-zero "
    "spelled as the CASE-guarded // on the DuckDB side to match "
    "Spark's div on negatives) and the Matthews correlation from the "
    "same four counters (products as doubles — identical operands -> "
    "identical IEEE results — with the round(round(x,9),6) snap; "
    "mden=0 guarded). Completes ml_confusion_metrics' P/R/F1 report "
    "with the two metrics that survive class imbalance. Shape: the "
    "classifier pipeline + ONE 4-counter agg; the report is 1 row",
)
def ml_kappa_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_r7 import ml_nbayes_classify

    docs = _t(spark, sf_dir, "documents")
    nb = ml_nbayes_classify(spark, sf_dir).select("doc_id", "pred")
    j = nb.join(docs.select("doc_id", "lang"), "doc_id").select(
        (F.col("pred") == "en").alias("p"),
        (F.col("lang") == "en").alias("t"),
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
    k = cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("CAST(tp + fp + fn + tn AS DECIMAL(38,0))").alias("n"),
        F.expr(
            "CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)"
            " + CAST(fn + tn AS DECIMAL(38,0)) * (fp + tn)"
        ).alias("x"),
    )
    o = k.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr("n * (tp + tn) - x").alias("knum"),
        F.expr("n * n - x").alias("kden"),
        F.expr("CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn").alias(
            "mnum"
        ),
        F.expr(
            "sqrt((CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE))"
            " * (CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)))"
        ).alias("mden"),
    )
    return o.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CAST(CASE WHEN kden = 0 THEN 0"
            " ELSE (knum * 1000000) div kden END AS BIGINT)"
        ).alias("kappa_micro"),
        F.when(F.col("mden") == 0, F.lit(0.0))
        .otherwise(F.round(F.round(F.col("mnum") / F.col("mden"), 9), 6))
        .alias("mcc"),
    )


# ---------------------------------------------------------------------------
# dq_reconciliation
# ---------------------------------------------------------------------------

_RECON_SQL = """
    WITH li AS (
      SELECT l_orderkey,
             sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                 * (100 + CAST(round(l_tax * 100, 0) AS BIGINT)))
               AS micro4
      FROM lineitem GROUP BY 1),
    d AS (
      SELECT CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS o_cents,
             CASE WHEN li.micro4 IS NULL THEN NULL
                  ELSE CAST(round(o.o_totalprice * 100, 0) AS BIGINT)
                       - CAST(li.micro4 // 10000 AS BIGINT) END AS diff
      FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey),
    b AS (
      SELECT CASE WHEN diff IS NULL THEN 2
                  WHEN diff > 0 THEN 1
                  WHEN diff < 0 THEN -1 ELSE 0 END AS sign,
             CASE WHEN diff IS NULL OR diff = 0 THEN 0
                  ELSE length(CAST(abs(diff) AS VARCHAR)) END AS digits,
             coalesce(abs(diff), 0) AS ad
      FROM d)
    SELECT CAST(sign AS INT) AS sign,
           CAST(digits AS INT) AS digits,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(ad) AS BIGINT) AS sum_abs_diff_cents
    FROM b GROUP BY 1, 2
"""


@register(
    "dq_reconciliation",
    _RECON_SQL,
    "cross-table financial reconciliation: per order, o_totalprice vs "
    "the lineitem-recomputed total sum(extprice * (1-disc) * (1+tax)) "
    "carried in EXACT cents x 1e4 integer units (discount/tax are "
    "integer percents in this data; floor-div back to cents on the "
    "all-positive domain where // and div agree), discrepancies "
    "bucketed by sign x decimal-digit magnitude (digit count via "
    "string length — no float log10 at bucket boundaries), orders "
    "with NO lineitems reported as sign=2. The double-entry audit "
    "every warehouse load runs; this synthetic data does not maintain "
    "the invariant, which is exactly what the report shows. Shape: "
    "ONE lineitem hash-agg + one orders join + one bucket agg",
)
def dq_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
                    " * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"
                    " * (100 + CAST(round(l_tax * 100, 0) AS BIGINT))"
                )
            ).alias("micro4")
        )
    )
    o = _t(spark, sf_dir, "orders")
    d = o.join(
        li, o["o_orderkey"] == li["l_orderkey"], "left"
    ).select(
        F.expr(
            "CASE WHEN micro4 IS NULL THEN NULL"
            " ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT)"
            " - CAST(micro4 div 10000 AS BIGINT) END"
        ).alias("diff")
    )
    b = d.select(
        F.expr(
            "CASE WHEN diff IS NULL THEN 2 WHEN diff > 0 THEN 1"
            " WHEN diff < 0 THEN -1 ELSE 0 END"
        ).alias("sign"),
        F.expr(
            "CASE WHEN diff IS NULL OR diff = 0 THEN 0"
            " ELSE length(CAST(abs(diff) AS STRING)) END"
        ).alias("digits"),
        F.expr("coalesce(abs(diff), 0)").alias("ad"),
    )
    return b.groupBy(
        F.col("sign").cast("int").alias("sign"),
        F.col("digits").cast("int").alias("digits"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("ad").cast("bigint").alias("sum_abs_diff_cents"),
    )


# ---------------------------------------------------------------------------
# dq_embedding_drift
# ---------------------------------------------------------------------------

_DRIFT_SQL = """
    WITH cells AS (
      SELECT label, CAST(i AS INT) AS pos,
             sum(CASE WHEN vec_id % 2 = 0 THEN
                   CAST(round(embedding[CAST(i + 1 AS INT)]::DOUBLE
                              * 1000000, 0) AS BIGINT) ELSE 0 END) AS se,
             sum(CASE WHEN vec_id % 2 = 1 THEN
                   CAST(round(embedding[CAST(i + 1 AS INT)]::DOUBLE
                              * 1000000, 0) AS BIGINT) ELSE 0 END) AS so,
             sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS ne,
             sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS no
      FROM embeddings, range(64) t(i)
      GROUP BY 1, 2),
    diffs AS (
      SELECT label, pos,
             CAST(se * no - so * ne AS BIGINT) AS dnum,
             CAST(ne * no AS BIGINT) AS den,
             CAST(ne AS BIGINT) AS ne, CAST(no AS BIGINT) AS no
      FROM cells WHERE ne > 0 AND no > 0)
    SELECT label,
           max(ne) AS n_even,
           max(no) AS n_odd,
           CAST(max(den) AS BIGINT) AS den,
           CAST(sum(abs(dnum)) AS BIGINT) AS l1_drift_num,
           CAST(max(abs(dnum) * 64 + 63 - pos) // 64 AS BIGINT)
             AS max_abs_diff_num,
           CAST(63 - max(abs(dnum) * 64 + 63 - pos) % 64 AS INT)
             AS max_dim
    FROM diffs GROUP BY label
"""


@register(
    "dq_embedding_drift",
    _DRIFT_SQL,
    "per-label centroid drift between the vec_id-parity halves of the "
    "embedding table, EXACT integer rationals end-to-end (micro-unit "
    "coordinate quantization; per-dimension centroid difference kept "
    "as numerator se*n_odd - so*n_even over the common denominator "
    "n_even*n_odd — no float division anywhere): L1 drift numerator, "
    "max per-dimension drift, and WHICH dimension drifted most "
    "(argmax packed as max(|d|*64 + 63-pos), ties -> lowest dim) — "
    "the training/serving skew screen run before any cosine-based "
    "dedup/ANN trusts two embedding snapshots. Shape: posexplode -> "
    "ONE (label, dim) hash-agg (map-side combinable, |labels| x 64 "
    "cells) -> one label agg. At 1e12-row scale lift se*no to "
    "DECIMAL(38,0); the synthetic domain stays far below int64",
)
def dq_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cells = (
        emb.select(
            "label",
            (F.col("vec_id") % 2).alias("half"),
            F.posexplode(
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x: F.round(x * 1000000, 0).cast("long"),
                )
            ).alias("pos", "q"),
        )
        .groupBy("label", "pos")
        .agg(
            F.sum(F.when(F.col("half") == 0, F.col("q")).otherwise(0)).alias(
                "se"
            ),
            F.sum(F.when(F.col("half") == 1, F.col("q")).otherwise(0)).alias(
                "so"
            ),
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ne"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("no"),
        )
    )
    diffs = cells.filter((F.col("ne") > 0) & (F.col("no") > 0)).select(
        "label",
        "pos",
        F.expr("CAST(se * no - so * ne AS BIGINT)").alias("dnum"),
        F.expr("CAST(ne * no AS BIGINT)").alias("den"),
        F.col("ne").cast("bigint").alias("ne"),
        F.col("no").cast("bigint").alias("no"),
    )
    return diffs.groupBy("label").agg(
        F.max("ne").alias("n_even"),
        F.max("no").alias("n_odd"),
        F.max("den").cast("bigint").alias("den"),
        F.sum(F.abs(F.col("dnum"))).cast("bigint").alias("l1_drift_num"),
        F.expr(
            "CAST(max(abs(dnum) * 64 + 63 - pos) div 64 AS BIGINT)"
        ).alias("max_abs_diff_num"),
        F.expr(
            "CAST(63 - max(abs(dnum) * 64 + 63 - pos) % 64 AS INT)"
        ).alias("max_dim"),
    )


# ---------------------------------------------------------------------------
# ts_rolling_median
# ---------------------------------------------------------------------------

_ROLLMED_SQL = """
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    rolled AS (
      SELECT event_type, day, cents,
             list_sort(list(cents) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
      FROM daily)
    SELECT event_type,
           CAST(day AS BIGINT) AS day,
           CAST(cents AS BIGINT) AS cents,
           CAST(len(win) AS INT) AS n_in_window,
           CAST(win[(len(win) - 1) // 2 + 1]
                + win[len(win) // 2 + 1] AS BIGINT) AS med_x2
    FROM rolled
"""


@register(
    "ts_rolling_median",
    _ROLLMED_SQL,
    "7-day rolling EXACT median of daily cents per event_type, emitted "
    "in x2 units so the even-count midpoint (mean of the two middle "
    "values) stays integer — the robust trend smoother (ts_ewma is the "
    "mean-based, outlier-sensitive one). Implemented as a sorted "
    "collect over the 7-row frame + integer element picks: the frame "
    "is <=7 values so the per-row sort is O(1), the window partitions "
    "by series key (parallel across event types / any real series "
    "cardinality), and no float percentile interpolation exists to "
    "diverge between engines. Positive-epoch day bucketing",
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(
            F.round(F.col("value") * 100, 0).cast("bigint")
        ).alias("cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    rolled = daily.select(
        "event_type",
        "day",
        "cents",
        F.sort_array(F.collect_list("cents").over(w)).alias("win"),
    )
    return rolled.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        F.col("cents").cast("bigint").alias("cents"),
        F.size("win").cast("int").alias("n_in_window"),
        F.expr(
            "CAST(element_at(win, CAST((size(win) - 1) div 2 + 1 AS INT))"
            " + element_at(win, CAST(size(win) div 2 + 1 AS INT))"
            " AS BIGINT)"
        ).alias("med_x2"),
    )
