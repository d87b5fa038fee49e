"""Round-9 batch 8: distribution separation, anonymity auditing, and
graph mixing — each completing a family the registry already ships.

- ``ml_ks_statistic``: two-sample Kolmogorov-Smirnov statistic between
  the positive- and negative-class score distributions of the shared
  min-max score model — THE distribution-separation test (credit-risk
  teams report KS next to AUC; a model can have decent AUC while its
  score distributions barely separate anywhere). Exact: at every
  distinct threshold the CDF gap |F_pos - F_neg| is put over the
  common denominator npos*nneg, so the sup is an integer max and only
  the final report divides (floor, nano units).
- ``privacy_k_anonymity``: k-anonymity audit of the events table under
  the quasi-identifier (event_type, day-of-week, value band) — the
  re-identification risk gate run before any dataset leaves the
  pipeline (privacy_dp_counts noises counts, privacy_small_cell
  suppresses cells; this measures whether the raw QI partitioning is
  safe at all). Per event_type: class count, smallest class, classes
  and rows below k=5, and the at-risk row share.
- ``graph_degree_assortativity``: degree assortativity coefficient of
  the near-dup keeper graph (the graph_modularity edge set) — do
  high-degree templates attach to other templates (assortative, r>0)
  or to one-off documents (disassortative, r<0)? The one-number mixing
  summary that says whether near-dup mass sits in cliques or stars.
  EXACT: over the both-orientations edge list the endpoint-degree
  marginals coincide, so Pearson r = (m*Sxy - Sx^2)/(m*Sxx - Sx^2) is
  a ratio of integers — no sqrt ever appears.

Scale notes (100 TB): KS runs its cumulative windows over the
DISTINCT-SCORE dim (value-domain bounded — the ml_auc_exact
discipline), never the facts; the anonymity audit is a two-level
hash-agg on the bounded QI domain (the fact table is scanned once and
shuffles once, on the QI key); assortativity reuses the
localCheckpoint'ed keeper edge list (the graph_random_walk lesson) —
one degree agg, one degree join keyed on node id, one global sum.

Family cross-references (deliberate non-duplicates): ml_ks_statistic
is the CLASSIFIER-separation KS — dq_ks_2sample (r17) runs the same
statistic as a DRIFT screen between user-parity variants and reports
no attaining threshold; privacy_k_anonymity AUDITS a raw QI
partitioning — privacy_kanon_release (r6) is the suppression-based
release TRANSFORM and privacy_ldiversity (r7) the attribute-disclosure
audit on the customer QI; graph_degree_assortativity is the
EXACT-INTEGER twin of graph_assortativity (r14), which measures the
LSH candidate graph with a snapped-anchor Pearson and one final
IEEE-sqrt double — here the symmetric-marginal identity removes the
sqrt entirely, on the simhash keeper graph. An l-diversity audit of
the events QI was drafted for this batch and dropped pre-certification
as too close to privacy_ldiversity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ml_ks_statistic
# ---------------------------------------------------------------------------

_KS_SQL = """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS npos,
             CAST(count(*) - sum(y) AS BIGINT) AS nneg
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
             sum(pos_k) OVER (ORDER BY p_micro) AS cpos,
             sum(n_k - pos_k) OVER (ORDER BY p_micro) AS cneg
      FROM g),
    d AS (
      SELECT p_micro,
             abs(CAST(cpos AS HUGEINT) * (SELECT nneg FROM t)
                 - CAST(cneg AS HUGEINT) * (SELECT npos FROM t))
               AS d_scaled,
             row_number() OVER (
               ORDER BY abs(CAST(cpos AS HUGEINT) * (SELECT nneg FROM t)
                            - CAST(cneg AS HUGEINT)
                              * (SELECT npos FROM t)) DESC,
                        p_micro DESC) AS rn,
             count(*) OVER () AS n_thresholds
      FROM c)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n,
           CAST((SELECT npos FROM t) AS BIGINT) AS npos,
           CAST((SELECT nneg FROM t) AS BIGINT) AS nneg,
           CAST(n_thresholds AS BIGINT) AS n_thresholds,
           CAST(p_micro AS BIGINT) AS at_threshold_micro,
           CAST(d_scaled AS BIGINT) AS d_scaled,
           CAST(CASE WHEN (SELECT npos FROM t) = 0
                       OR (SELECT nneg FROM t) = 0 THEN 0
                ELSE d_scaled * 1000000000
                     // (CAST((SELECT npos FROM t) AS HUGEINT)
                         * (SELECT nneg FROM t)) END AS BIGINT) AS ks_nano
    FROM d WHERE rn = 1
"""


@register(
    "ml_ks_statistic",
    _KS_SQL,
    "two-sample Kolmogorov-Smirnov statistic between the positive- and "
    "negative-class score distributions of the shared min-max score "
    "model: sup over distinct thresholds of |F_pos(t) - F_neg(t)|, "
    "reported with the threshold attaining it (highest on ties) — THE "
    "distribution-separation number credit-risk teams quote next to "
    "AUC (a model can rank acceptably while its score distributions "
    "barely separate at any single cut; KS finds the best cut and says "
    "how wide the gap is there — it is also max(tpr - fpr), the "
    "Youden point of the ROC). EXACT: each CDF gap is put over the "
    "common denominator npos*nneg so the sup is an integer max; only "
    "the final report divides (floor, nano units). Shape: one fact "
    "hash-agg into the distinct-score dim; the cumulative windows and "
    "the argmax run over that value-domain-bounded dim (the "
    "ml_auc_exact discipline), never over rows",
)
def ml_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("nneg"),
    )
    p = s.crossJoin(F.broadcast(t)).select(
        "y",
        "n",
        "npos",
        "nneg",
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
        F.first("nneg").alias("nneg"),
    )
    w = Window.orderBy("p_micro").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dec = "decimal(38,0)"
    c = g.select(
        "p_micro",
        "n",
        "npos",
        "nneg",
        F.sum("pos_k").over(w).alias("cpos"),
        F.sum(F.col("n_k") - F.col("pos_k")).over(w).alias("cneg"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_thresholds"),
    ).select(
        "p_micro",
        "n",
        "npos",
        "nneg",
        "n_thresholds",
        F.abs(
            F.col("cpos").cast(dec) * F.col("nneg")
            - F.col("cneg").cast(dec) * F.col("npos")
        ).alias("d_scaled"),
    )
    rn = Window.orderBy(F.desc("d_scaled"), F.desc("p_micro"))
    d = c.withColumn("rn", F.row_number().over(rn)).filter(F.col("rn") == 1)
    return d.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("npos").cast("bigint").alias("npos"),
        F.col("nneg").cast("bigint").alias("nneg"),
        F.col("n_thresholds").cast("bigint").alias("n_thresholds"),
        F.col("p_micro").cast("bigint").alias("at_threshold_micro"),
        F.col("d_scaled").cast("bigint").alias("d_scaled"),
        F.expr(
            "CAST(CASE WHEN npos = 0 OR nneg = 0 THEN 0"
            " ELSE d_scaled * 1000000000"
            " div (CAST(npos AS DECIMAL(38,0)) * nneg) END AS BIGINT)"
        ).alias("ks_nano"),
    )


# ---------------------------------------------------------------------------
# privacy_k_anonymity
# ---------------------------------------------------------------------------

# quasi-identifier: (event_type, day-of-week, 20-dollar value band).
# day-of-week uses the subtract-pmod floor-day form on BOTH engines
# (the ts_seasonal_naive / dq_mutual_information pattern) so pre-1970
# epochs bucket identically; the value band is a fixed-width integer
# division, truncation-identical on both engines for the non-negative
# cent amounts the testdata carries.
_QI_CLASSES_CTE = """
    classes AS (
      SELECT event_type,
             CAST(((((epoch_us(ts)
                      - (((epoch_us(ts) % 86400000000) + 86400000000)
                         % 86400000000))
                     // 86400000000) % 7) + 7) % 7 AS INT) AS dow,
             CAST(round(value * 100, 0) AS BIGINT) // 2000 AS band,
             CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY 1, 2, 3)
"""

_K_ANON_SQL = f"""
    WITH {_QI_CLASSES_CTE}
    SELECT event_type,
           CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unsafe_classes,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             AS n_unsafe_rows,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000
                // sum(k) AS BIGINT) AS risk_milli
    FROM classes GROUP BY 1
"""


def _qi_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.expr(
            "CAST(pmod((unix_micros(ts) - pmod(unix_micros(ts), "
            "86400000000)) div 86400000000, 7) AS INT)"
        ).alias("dow"),
        F.expr(
            "CAST(round(value * 100, 0) AS BIGINT) div 2000"
        ).alias("band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("k"))


@register(
    "privacy_k_anonymity",
    _K_ANON_SQL,
    "k-anonymity audit of the events table under the quasi-identifier "
    "(event_type, day-of-week, 20-dollar value band): per event_type, "
    "the equivalence-class count, the smallest class, the classes and "
    "rows below k=5, and the at-risk row share in milli — the "
    "re-identification gate run before any dataset leaves the pipeline "
    "(privacy_dp_counts noises counts, privacy_small_cell suppresses "
    "published cells; this measures whether the raw QI partitioning is "
    "safe AT ALL — a min_k of 1 means some row is unique on its "
    "quasi-identifiers and linkable by anyone holding them). "
    "Day-of-week uses the subtract-pmod floor-day form on both engines "
    "(pre-1970-safe); all outputs are exact integers. Shape: one fact "
    "scan hash-agged on the bounded QI domain, then a per-type rollup "
    "— the facts shuffle once, on the QI key",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    classes = _qi_classes(spark, sf_dir)
    return classes.groupBy("event_type").agg(
        F.sum("k").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("k").cast("bigint").alias("min_k"),
        F.sum(F.when(F.col("k") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_unsafe_classes"),
        F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("n_unsafe_rows"),
        F.expr(
            "CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1000"
            " div sum(k) AS BIGINT)"
        ).alias("risk_milli"),
    )


# ---------------------------------------------------------------------------
# graph_degree_assortativity
# ---------------------------------------------------------------------------


def _assortativity_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
    joined AS (
      SELECT du.d AS x, dv.d AS y
      FROM edges e JOIN deg du ON e.u = du.u JOIN deg dv ON e.v = dv.u),
    sums AS (
      SELECT CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             (SELECT count(*) FROM deg) AS n_nodes
      FROM joined)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(m AS BIGINT) AS m_directed,
           CAST(sx AS BIGINT) AS sum_deg,
           CAST(sxy AS BIGINT) AS sum_xy,
           CAST(sxx AS BIGINT) AS sum_xx,
           CAST(m * sxy - sx * sx AS BIGINT) AS num,
           CAST(m * sxx - sx * sx AS BIGINT) AS den,
           CAST(CASE WHEN m * sxx - sx * sx = 0 THEN 0
                ELSE (m * sxy - sx * sx) * 1000
                     // (m * sxx - sx * sx) END AS BIGINT) AS r_milli
    FROM sums
"""


@register(
    "graph_degree_assortativity",
    _assortativity_sql(),
    "degree assortativity coefficient of the near-dup keeper graph "
    "(SimHash hamming <= 2 over exact-dedup keepers — the "
    "graph_modularity edge set): Pearson correlation of endpoint "
    "degrees over the both-orientations edge list — do high-degree "
    "template documents attach to other templates (assortative, r>0) "
    "or to one-off documents (disassortative, r<0)? The one-number "
    "mixing summary that says whether near-dup mass sits in cliques "
    "or in hub-and-spoke stars — which decides whether cluster-level "
    "dedup (keep one per clique) or hub removal is the right "
    "treatment. EXACT: over the symmetric edge list the two endpoint "
    "marginals coincide, so r = (m*Sxy - Sx^2)/(m*Sxx - Sx^2) is a "
    "ratio of integers and NO sqrt ever appears (degenerate regular "
    "graph: den = 0 reports 0). Both engines truncate the signed "
    "division toward zero. Shape: the keeper edge list is derived "
    "once and localCheckpoint'ed (degree agg, both endpoint joins, "
    "and the global sum all reuse it); the degree join is keyed on "
    "node id; output is one row",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_edges

    docs = _t(spark, sf_dir, "documents")
    edges = keeper_edges(docs, "doc_id")
    deg = edges.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    n_nodes = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    du = deg.select(F.col("u").alias("ju"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("jv"), F.col("d").alias("y"))
    joined = (
        edges.join(du, edges["u"] == du["ju"])
        .join(dv, edges["v"] == dv["jv"])
        .select("x", "y")
    )
    dec = "decimal(19,0)"
    sums = joined.agg(
        F.count(F.lit(1)).cast(dec).alias("m"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
    ).crossJoin(F.broadcast(n_nodes))
    return sums.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("m").cast("bigint").alias("m_directed"),
        F.col("sx").cast("bigint").alias("sum_deg"),
        F.col("sxy").cast("bigint").alias("sum_xy"),
        F.col("sxx").cast("bigint").alias("sum_xx"),
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("num"),
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("bigint")
        .alias("den"),
        F.expr(
            "CAST(CASE WHEN m * sxx - sx * sx = 0 THEN 0"
            " ELSE (m * sxy - sx * sx) * 1000"
            " div (m * sxx - sx * sx) END AS BIGINT)"
        ).alias("r_milli"),
    )
