"""Round-9 batch 6: model explainability, the PR-curve area, and
blocking recall — each completing a family the registry already ships.

- ``ml_linear_shap``: exact SHAP attributions for the fitted
  ``ml_ridge_2feature`` model — for a linear model under feature
  independence the Shapley value has the closed form
  phi_i(x) = b_i * (x_i - mean_i), so the global importance table
  (mean |phi| per feature and its share) is EXACT integer arithmetic
  on the same anchor-centered quantities the trainer used. The
  explainability companion every fitted model needs before anyone
  acts on its coefficients; the oracle re-derives the weights through
  the identical shared CTE chain.
- ``ml_auprc_exact``: area under the precision-recall curve (average
  precision, step form AP = sum dR_k * P_k over distinct-score
  thresholds) for the shared min-max score model — THE metric for
  imbalanced classes where ROC-AUC flatters (ml_auc_exact's
  complement; ml_pr_curve ships the points, this ships the area).
  Every term is floor-divided integer nano-units BEFORE summing —
  no libm anywhere, bit-identical by construction.
- ``er_blocking_recall``: recall of the production blocking key —
  ground truth = Levenshtein <= 3 keeper pairs under the coarser
  brand-only blocking, found = those sharing the (brand, first-token)
  key er_fuzzy_match actually uses. Completes the ER trilogy:
  er_blocking_stats prices a key, er_fuzzy_match runs it, this
  measures what the cheaper key MISSES — the recall/cost tradeoff
  made a number.

Scale notes (100 TB): SHAP reuses the ridge's one-scan moment shape
plus one broadcast weights join (per-row phi is map-only); AUPRC runs
its windows over the DISTINCT-SCORE dim (value-domain bounded, the
ml_auc_exact discipline), never the facts; blocking recall is C4-ordered
(keepers first) so brand blocks are bounded by the name VOCABULARY, not
the corpus — replicated rows collapse before any pair is enumerated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ml_linear_shap
# ---------------------------------------------------------------------------


def _linear_shap_sql() -> str:
    from jigsaw_spark.plans.queries_r24 import _RIDGE_WITH

    return f"""{_RIDGE_WITH},
    weights AS (
      SELECT grp, n,
             CAST(CASE WHEN n1 >= 0 THEN n1 // det
                       ELSE -((-n1) // det) END AS BIGINT) AS b1_micro,
             CAST(CASE WHEN n2 >= 0 THEN n2 // det
                       ELSE -((-n2) // det) END AS BIGINT) AS b2_micro,
             m1, m2
      FROM sol),
    phi AS (
      SELECT p.grp,
             abs(w.b1_micro * (p.x1 - w.m1)) AS a1,
             abs(w.b2_micro * (p.x2 - w.m2)) AS a2
      FROM pts p JOIN weights w ON p.grp = w.grp),
    sums AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a1) AS HUGEINT) AS s1,
             CAST(sum(a2) AS HUGEINT) AS s2
      FROM phi GROUP BY 1),
    longf AS (
      SELECT s.grp, f.feature,
             CASE f.feature WHEN 'quantity' THEN w.b1_micro
                            ELSE w.b2_micro END AS weight_micro,
             CASE f.feature WHEN 'quantity' THEN s.s1 ELSE s.s2 END AS sa,
             s.n, s.s1 + s.s2 AS st
      FROM sums s
      JOIN weights w ON s.grp = w.grp
      CROSS JOIN (SELECT unnest(['quantity', 'tax_pct']) AS feature) f)
    SELECT grp AS l_linestatus, feature,
           CAST(weight_micro AS BIGINT) AS weight_micro,
           CAST(sa // n AS BIGINT) AS mean_abs_phi_micro,
           CAST(CASE WHEN st = 0 THEN 0
                ELSE sa * 1000 // st END AS BIGINT) AS share_milli
    FROM longf
"""


@register(
    "ml_linear_shap",
    _linear_shap_sql(),
    "exact SHAP attributions for the fitted ml_ridge_2feature model: "
    "for a linear model under feature independence the Shapley value "
    "is closed-form phi_i(x) = b_i * (x_i - mean_i), so global "
    "importance (mean |phi| per feature, in the model's micro units) "
    "and each feature's share of total attribution are EXACT integers "
    "on the same anchor-centered quantities the trainer used — the "
    "explainability companion run before anyone acts on fitted "
    "coefficients (answers 'which feature actually drives the "
    "predictions', which raw coefficients cannot: b is per-unit, phi "
    "is per-unit x realized spread). The oracle re-derives the "
    "weights through the CTE chain shared verbatim with the trainer. "
    "Shape: the ridge's one-scan moment agg + one broadcast weights "
    "join; per-row phi is map-only; output is 2 features x |groups|",
)
def ml_linear_shap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.plans.queries_r24 import _ridge_fit

    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_linestatus").alias("grp"),
        F.round("l_quantity", 0).cast("bigint").alias("x1"),
        F.round(F.col("l_tax") * 100, 0).cast("bigint").alias("x2"),
    )
    # the fit frame carries the SAME anchor means the ridge trainer
    # used (identical agg over identical projections), so the SHAP
    # side reuses them instead of re-scanning lineitem for its own
    # moment agg; checkpointed lazily — the two broadcast projections
    # below would otherwise each re-run the 2-scan fit lineage (r14)
    fit = _ridge_fit(spark, sf_dir).localCheckpoint(eager=False)
    anchors = fit.select("grp", "m1", "m2")
    weights = fit.select("grp", "b1_micro", "b2_micro")
    phi = (
        pts.join(F.broadcast(anchors), "grp")
        .join(F.broadcast(weights), "grp")
        .select(
            "grp",
            F.abs(F.col("b1_micro") * (F.col("x1") - F.col("m1"))).alias(
                "a1"
            ),
            F.abs(F.col("b2_micro") * (F.col("x2") - F.col("m2"))).alias(
                "a2"
            ),
        )
    )
    dec = "decimal(38,0)"
    sums = phi.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a1").cast(dec)).alias("s1"),
        F.sum(F.col("a2").cast(dec)).alias("s2"),
    )
    fdim = F.broadcast(
        spark.createDataFrame(
            [("quantity",), ("tax_pct",)], "feature string"
        )
    )
    longf = (
        sums.join(F.broadcast(weights), "grp")
        .crossJoin(fdim)
        .select(
            F.col("grp").alias("l_linestatus"),
            "feature",
            F.when(F.col("feature") == "quantity", F.col("b1_micro"))
            .otherwise(F.col("b2_micro"))
            .cast("bigint")
            .alias("weight_micro"),
            F.when(F.col("feature") == "quantity", F.col("s1"))
            .otherwise(F.col("s2"))
            .alias("sa"),
            "n",
            (F.col("s1") + F.col("s2")).alias("st"),
        )
    )
    return longf.select(
        "l_linestatus",
        "feature",
        "weight_micro",
        F.expr("CAST(sa div n AS BIGINT)").alias("mean_abs_phi_micro"),
        F.expr(
            "CAST(CASE WHEN st = 0 THEN 0"
            " ELSE sa * 1000 div st END AS BIGINT)"
        ).alias("share_milli"),
    )


# ---------------------------------------------------------------------------
# ml_auprc_exact
# ---------------------------------------------------------------------------

_AUPRC_SQL = """
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
      SELECT p_micro, pos_k,
             sum(pos_k) OVER (ORDER BY p_micro DESC) AS tp,
             sum(n_k) OVER (ORDER BY p_micro DESC) AS pred
      FROM g),
    terms AS (
      SELECT CAST(pos_k AS HUGEINT) * tp * 1000000000
             // ((SELECT npos FROM t) * pred) AS term_nano
      FROM c WHERE pos_k > 0)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n,
           CAST((SELECT npos FROM t) AS BIGINT) AS npos,
           CAST((SELECT count(*) FROM g) AS BIGINT) AS n_thresholds,
           CAST(sum(term_nano) AS BIGINT) AS ap_nano
    FROM terms
"""


@register(
    "ml_auprc_exact",
    _AUPRC_SQL,
    "area under the precision-recall curve (average precision, step "
    "form AP = sum over distinct-score thresholds of dR_k * P_k with "
    "ties grouped) for the shared min-max score model — THE metric "
    "for imbalanced classes where ROC-AUC flatters (a classifier can "
    "score 0.95 ROC on a 1% class while its precision is garbage; AP "
    "weights exactly where precision lives). Completes the eval "
    "family: ml_auc_exact is the ROC area, ml_pr_curve the PR points, "
    "this the PR area. EXACT: each term dtp * tp * 1e9 div (npos * "
    "pred) is floor-divided to integer nano-units BEFORE the sum — no "
    "libm, no rounding discipline needed, bit-identical by "
    "construction. Shape: one fact hash-agg into the distinct-score "
    "dim; the cumulative windows run over that value-domain-bounded "
    "dim (the ml_auc_exact discipline), never over rows",
)
def ml_auprc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        "n",
        "npos",
        F.expr(
            "CASE WHEN hi - lo = 0 THEN 500000"
            " ELSE (cents - lo) * 1000000 div (hi - lo) END"
        ).alias("p_micro"),
    )
    g = p.groupBy("p_micro").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("y").cast("bigint").alias("pos_k"),
        F.first("n").alias("n"),
        F.first("npos").alias("npos"),
    )
    w = (
        Window.orderBy(F.desc("p_micro"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = g.select(
        "pos_k",
        "n",
        "npos",
        F.sum("pos_k").over(w).alias("tp"),
        F.sum("n_k").over(w).alias("pred"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_thresholds"),
    )
    terms = c.filter(F.col("pos_k") > 0).select(
        "n",
        "npos",
        "n_thresholds",
        F.expr(
            "CAST(pos_k AS DECIMAL(38,0)) * tp * 1000000000"
            " div (npos * pred)"
        ).alias("term_nano"),
    )
    return terms.groupBy().agg(
        F.first("n").alias("n"),
        F.first("npos").alias("npos"),
        F.first("n_thresholds").cast("bigint").alias("n_thresholds"),
        F.sum("term_nano").cast("bigint").alias("ap_nano"),
    )


# ---------------------------------------------------------------------------
# er_blocking_recall
# ---------------------------------------------------------------------------

_BLOCKING_RECALL_SQL = """
    WITH keepers AS (
      SELECT min(p_partkey) AS p_partkey, p_brand, p_name,
             split_part(p_name, ' ', 1) AS tok1
      FROM part GROUP BY p_brand, p_name),
    truth AS (
      SELECT a.p_brand,
             CASE WHEN a.tok1 = b.tok1 THEN 1 ELSE 0 END AS found
      FROM keepers a JOIN keepers b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 3)
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_truth,
           CAST(sum(found) AS BIGINT) AS n_found,
           CAST(sum(found) * 1000 // count(*) AS BIGINT) AS recall_milli
    FROM truth GROUP BY 1
"""


@register(
    "er_blocking_recall",
    _BLOCKING_RECALL_SQL,
    "recall of the production blocking key: ground truth = Levenshtein "
    "<= 3 keeper pairs under the COARSER brand-only blocking; found = "
    "those sharing er_fuzzy_match's (brand, first-token) key — the "
    "recall/cost tradeoff made a number, completing the ER trilogy "
    "(er_blocking_stats prices a key, er_fuzzy_match runs it, this "
    "measures what the cheaper key misses). Brands whose truth set is "
    "empty have no recall to report and produce no row. C4-ordered: "
    "exact (brand, name) identities collapse to keepers FIRST, so "
    "brand blocks are bounded by the name VOCABULARY, not the corpus "
    "— replicated rows never reach the pair stage. Shape: one dedup "
    "hash-agg, one brand-keyed block join over keeper names, one "
    "rollup",
)
def er_blocking_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    keepers = part.groupBy("p_brand", "p_name").agg(
        F.min("p_partkey").alias("p_partkey")
    ).select(
        "p_partkey",
        "p_brand",
        "p_name",
        F.expr("split_part(p_name, ' ', 1)").alias("tok1"),
    )
    a = keepers.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("p_name").alias("name_a"),
        F.col("tok1").alias("tok1_a"),
    )
    b = keepers.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_b"),
        F.col("tok1").alias("tok1_b"),
    )
    truth = (
        a.join(
            b,
            (F.col("brand_a") == F.col("brand_b"))
            & (F.col("key_a") < F.col("key_b")),
        )
        .filter(F.levenshtein(F.col("name_a"), F.col("name_b")) <= 3)
        .select(
            F.col("brand_a").alias("p_brand"),
            F.when(F.col("tok1_a") == F.col("tok1_b"), 1)
            .otherwise(0)
            .alias("found"),
        )
    )
    return truth.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth"),
        F.sum("found").cast("bigint").alias("n_found"),
        F.expr("CAST(sum(found) * 1000 div count(*) AS BIGINT)").alias(
            "recall_milli"
        ),
    )
