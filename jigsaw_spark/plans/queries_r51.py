"""Round-9 batch 11: harmonic centrality, pairwise ER F1, cohort LTV,
and error slicing.

- ``graph_harmonic_centrality``: top-10 keeper-graph nodes by harmonic
  centrality truncated at 3 hops — sum over reachable nodes of 1/d,
  the centrality that stays well-defined on DISCONNECTED graphs
  (closeness breaks; near-dup graphs are always disconnected). The
  document it surfaces is the template family's center of mass — the
  right canonical representative for cluster-level dedup. EXACT:
  distances in {1,2,3} put 1/d over the common denominator 6, so
  h6 = 6*n1 + 3*n2 + 2*n3 is an integer.
- ``er_pairwise_f1``: pairwise precision / recall / F1 of the
  production blocking key's match pairs against the Levenshtein <= 3
  ground truth — the standard pairwise-evaluation scalarization of an
  ER run (er_blocking_stats prices the key, er_fuzzy_match runs it,
  er_blocking_recall measures per-brand recall; this is the global
  one-row summary with PRECISION, which recall alone cannot see).
  EXACT: F1 = 2PR/(P+R) algebraically collapses to
  2*|common| / (|pred| + |truth|) — one integer ratio, no float P or
  R ever computed.
- ``rel_cohort_ltv``: weekly cohort lifetime-value triangle — per
  (cohort week, week offset): revenue, CUMULATIVE revenue, and LTV
  per original cohort member — the money companion of
  rel_retention_cohorts (retention says who comes back; LTV says what
  a cohort member is WORTH by age k, the number acquisition spend is
  judged against). Exact integer cents/micro throughout.
- ``ml_error_slices``: worst-5 (event_type, day-of-week) slices of the
  shared score model operated at its cost-optimal threshold — the
  error-analysis step AFTER ml_cost_threshold picks the operating
  point (aggregate cost says how good the cut is; slicing says WHERE
  it fails, the fairness/debug report every deployment runs). The
  threshold is re-derived through the identical CTE chain, so the
  slice report certifies the whole composition.

Scale notes (100 TB): harmonic centrality's frontier joins are
keeper-graph-sized (bounded by near-dup density) and the edge list is
localCheckpoint'ed once; pairwise F1 is C4-ordered (exact identities
collapse to keepers BEFORE any pair is enumerated; blocks bounded by
the name vocabulary); cohort LTV shuffles facts once on user_id, then
everything runs on the (cohort, offset) calendar-bounded dim; error
slices scan facts twice (threshold derivation + slice confusion) with
all windows on the distinct-score / 35-slice dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# graph_harmonic_centrality
# ---------------------------------------------------------------------------


def _harmonic_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    d1 AS (SELECT u, v FROM edges),
    d2 AS (
      SELECT DISTINCT e1.u, e2.v
      FROM edges e1 JOIN edges e2 ON e1.v = e2.u
      WHERE e1.u <> e2.v
        AND NOT EXISTS (SELECT 1 FROM d1
                        WHERE d1.u = e1.u AND d1.v = e2.v)),
    d3 AS (
      SELECT DISTINCT p.u, e3.v
      FROM d2 p JOIN edges e3 ON p.v = e3.u
      WHERE p.u <> e3.v
        AND NOT EXISTS (SELECT 1 FROM d1
                        WHERE d1.u = p.u AND d1.v = e3.v)
        AND NOT EXISTS (SELECT 1 FROM d2
                        WHERE d2.u = p.u AND d2.v = e3.v)),
    counts AS (
      SELECT u,
             CAST(coalesce(n1, 0) AS BIGINT) AS n1,
             CAST(coalesce(n2, 0) AS BIGINT) AS n2,
             CAST(coalesce(n3, 0) AS BIGINT) AS n3
      FROM (SELECT u, count(*) AS n1 FROM d1 GROUP BY u) a
      LEFT JOIN (SELECT u AS u2, count(*) AS n2 FROM d2 GROUP BY u) b
        ON a.u = b.u2
      LEFT JOIN (SELECT u AS u3, count(*) AS n3 FROM d3 GROUP BY u) c
        ON a.u = c.u3),
    hscored AS (
      SELECT u, n1, n2, n3,
             6 * n1 + 3 * n2 + 2 * n3 AS h6,
             row_number() OVER (
               ORDER BY 6 * n1 + 3 * n2 + 2 * n3 DESC, u) AS rn,
             (SELECT count(*) FROM counts) AS n_nodes
      FROM counts)
    SELECT CAST(rn AS INT) AS rn, u AS doc_id,
           n1, n2, n3,
           CAST(h6 AS BIGINT) AS h6,
           CAST(CASE WHEN n_nodes <= 1 THEN 0
                ELSE h6 * 1000 // (6 * (n_nodes - 1)) END AS BIGINT)
             AS harmonic_milli
    FROM hscored WHERE rn <= 10
"""


@register(
    "graph_harmonic_centrality",
    _harmonic_sql(),
    "top-10 keeper-graph nodes by harmonic centrality truncated at 3 "
    "hops: sum over nodes within distance 3 of 1/d, normalized by the "
    "n-1 maximum — the centrality that stays well-defined on "
    "DISCONNECTED graphs (closeness degenerates; near-dup graphs are "
    "always a forest of clusters), surfacing each template family's "
    "center of mass — the right canonical representative for "
    "cluster-level dedup, where graph_pagerank_exact surfaces "
    "endorsement weight instead. EXACT: distances in {1,2,3} put 1/d "
    "over the common denominator 6, so h6 = 6*n1 + 3*n2 + 2*n3 is an "
    "integer (ties: doc_id). Shape: the keeper edge list is "
    "localCheckpoint'ed once; hop counts come from the size-adaptive "
    "hop_counts operator (single-task BFS kernel below the components "
    "edge threshold, anti-join frontier chain above it — bounded by "
    "near-dup density, never corpus all-pairs); the top-10 window "
    "runs over the node dim",
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import hop_counts, keeper_edges

    docs = _t(spark, sf_dir, "documents")
    edges = keeper_edges(docs, "doc_id")
    # n_k = nodes at hop distance exactly k; the edge list is distinct
    # (simhash_pairs dedups), so the old per-u edge-row counts equal the
    # operator's distinct-neighbor counts. Size-adaptive: single-task BFS
    # below the components threshold, frontier-join chain above it.
    counts = hop_counts(edges, max_hops=3)
    nn = counts.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    scored = counts.crossJoin(F.broadcast(nn)).withColumn(
        "h6",
        (6 * F.col("n1") + 3 * F.col("n2") + 2 * F.col("n3")).cast(
            "bigint"
        ),
    )
    # TakeOrdered shape: LIMIT the sorted node dim first, then rank the
    # surviving <= 10 rows — the global row_number window never sees
    # more than 10 rows, so there is no single-task funnel at scale
    top = scored.orderBy(F.desc("h6"), F.col("u")).limit(10)
    w = Window.orderBy(F.desc("h6"), F.col("u"))
    return (
        top.withColumn("rn", F.row_number().over(w))
        .select(
            F.col("rn").cast("int").alias("rn"),
            F.col("u").alias("doc_id"),
            "n1",
            "n2",
            "n3",
            "h6",
            F.expr(
                "CAST(CASE WHEN n_nodes <= 1 THEN 0"
                " ELSE h6 * 1000 div (6 * (n_nodes - 1)) END AS BIGINT)"
            ).alias("harmonic_milli"),
        )
    )


# ---------------------------------------------------------------------------
# er_pairwise_f1
# ---------------------------------------------------------------------------

_PAIRWISE_F1_SQL = """
    WITH keepers AS (
      SELECT min(p_partkey) AS p_partkey, p_brand, p_name,
             split_part(p_name, ' ', 1) AS tok1
      FROM part GROUP BY p_brand, p_name),
    cand AS MATERIALIZED (
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             CASE WHEN a.tok1 = b.tok1 THEN 1 ELSE 0 END AS pred,
             CASE WHEN levenshtein(a.p_name, b.p_name) <= 3
                  THEN 1 ELSE 0 END AS truth
      FROM keepers a JOIN keepers b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
    sums AS (
      SELECT CAST(sum(pred) AS BIGINT) AS n_pred,
             CAST(sum(truth) AS BIGINT) AS n_truth,
             CAST(sum(pred * truth) AS BIGINT) AS n_common
      FROM cand)
    SELECT n_pred, n_truth, n_common,
           CAST(CASE WHEN n_pred = 0 THEN 0
                ELSE n_common * 1000 // n_pred END AS BIGINT)
             AS precision_milli,
           CAST(CASE WHEN n_truth = 0 THEN 0
                ELSE n_common * 1000 // n_truth END AS BIGINT)
             AS recall_milli,
           CAST(CASE WHEN n_pred + n_truth = 0 THEN 0
                ELSE 2 * n_common * 1000 // (n_pred + n_truth) END
                AS BIGINT) AS f1_milli
    FROM sums
"""


@register(
    "er_pairwise_f1",
    _PAIRWISE_F1_SQL,
    "pairwise precision / recall / F1 of the production blocking key's "
    "match pairs — pred = keeper pairs sharing er_fuzzy_match's "
    "(brand, first-token) key, truth = Levenshtein <= 3 pairs under "
    "brand blocking — the standard pairwise scalarization of an ER "
    "run, completing the trilogy's eval (er_blocking_recall reports "
    "per-brand recall; this is the global one-row summary WITH "
    "precision, which recall alone cannot see: a key that lumps "
    "everything scores perfect recall and garbage precision). EXACT: "
    "F1 = 2PR/(P+R) collapses algebraically to 2*|common| / (|pred| + "
    "|truth|), one integer ratio — float P and R are never computed. "
    "C4-ordered: exact (brand, name) identities collapse to keepers "
    "FIRST, so brand blocks are bounded by the name VOCABULARY; both "
    "pair sets come from ONE block enumeration (single shuffle on the "
    "brand key, flags summed in the same pass)",
)
def er_pairwise_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    keepers = (
        part.groupBy("p_brand", "p_name")
        .agg(F.min("p_partkey").alias("p_partkey"))
        .select(
            "p_partkey",
            "p_brand",
            "p_name",
            F.expr("split_part(p_name, ' ', 1)").alias("tok1"),
        )
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
    cand = a.join(
        b,
        (F.col("brand_a") == F.col("brand_b"))
        & (F.col("key_a") < F.col("key_b")),
    ).select(
        F.when(F.col("tok1_a") == F.col("tok1_b"), 1)
        .otherwise(0)
        .alias("pred"),
        F.when(
            F.levenshtein(F.col("name_a"), F.col("name_b")) <= 3, 1
        )
        .otherwise(0)
        .alias("truth"),
    )
    sums = cand.agg(
        F.sum("pred").cast("bigint").alias("n_pred"),
        F.sum("truth").cast("bigint").alias("n_truth"),
        F.sum(F.col("pred") * F.col("truth"))
        .cast("bigint")
        .alias("n_common"),
    )
    return sums.select(
        "n_pred",
        "n_truth",
        "n_common",
        F.expr(
            "CAST(CASE WHEN n_pred = 0 THEN 0"
            " ELSE n_common * 1000 div n_pred END AS BIGINT)"
        ).alias("precision_milli"),
        F.expr(
            "CAST(CASE WHEN n_truth = 0 THEN 0"
            " ELSE n_common * 1000 div n_truth END AS BIGINT)"
        ).alias("recall_milli"),
        F.expr(
            "CAST(CASE WHEN n_pred + n_truth = 0 THEN 0"
            " ELSE 2 * n_common * 1000 div (n_pred + n_truth) END"
            " AS BIGINT)"
        ).alias("f1_milli"),
    )


# ---------------------------------------------------------------------------
# rel_cohort_ltv
# ---------------------------------------------------------------------------

_COHORT_LTV_SQL = """
    WITH ue AS (
      SELECT user_id,
             epoch_us(ts) // 86400000000 // 7 AS w,
             CAST(round(value * 100, 0) AS BIGINT) AS cents
      FROM events),
    coh AS MATERIALIZED (
      SELECT user_id, min(w) AS c FROM ue GROUP BY user_id),
    sizes AS (
      SELECT c, CAST(count(*) AS BIGINT) AS cohort_size
      FROM coh GROUP BY c),
    rev AS (
      SELECT coh.c, ue.w - coh.c AS off,
             CAST(sum(ue.cents) AS BIGINT) AS revenue_cents
      FROM ue JOIN coh ON ue.user_id = coh.user_id
      GROUP BY 1, 2),
    cum AS (
      SELECT c, off, revenue_cents,
             sum(revenue_cents) OVER (PARTITION BY c ORDER BY off)
               AS cum_revenue_cents
      FROM rev)
    SELECT CAST(cum.c AS BIGINT) AS cohort_week,
           CAST(off AS INT) AS week_offset,
           CAST(revenue_cents AS BIGINT) AS revenue_cents,
           CAST(cum_revenue_cents AS BIGINT) AS cum_revenue_cents,
           CAST(sizes.cohort_size AS BIGINT) AS cohort_size,
           CAST(cum_revenue_cents * 100 // sizes.cohort_size AS BIGINT)
             AS ltv_per_user_scaled
    FROM cum JOIN sizes ON cum.c = sizes.c
"""


@register(
    "rel_cohort_ltv",
    _COHORT_LTV_SQL,
    "weekly cohort lifetime-value triangle: cohort = epoch-week of a "
    "user's first event; per (cohort, week offset) the period revenue, "
    "the CUMULATIVE revenue, and LTV per original cohort member "
    "(scaled x100, exact integer) — the money companion of "
    "rel_retention_cohorts (retention says who comes back; this says "
    "what a cohort member is WORTH by age k, the number acquisition "
    "spend is judged against — the two triangles are read together). "
    "Shape: one per-user min (hash agg), one user-keyed join back, "
    "one (cohort, offset) revenue agg — facts shuffle once on "
    "user_id; the cumulative window and the size join run on the "
    "calendar-bounded (cohort, offset) dim. Week index is epoch-days "
    "div 7 (positive domain, floor/truncate engines agree)",
)
def rel_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ue = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000 div 7").alias("w"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    coh = ue.groupBy("user_id").agg(F.min("w").alias("c"))
    sizes = coh.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    rev = (
        ue.join(coh, "user_id")
        .groupBy("c", (F.col("w") - F.col("c")).alias("off"))
        .agg(F.sum("cents").cast("bigint").alias("revenue_cents"))
    )
    wc = (
        Window.partitionBy("c")
        .orderBy("off")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(wc)
    )
    return cum.join(F.broadcast(sizes), "c").select(
        F.col("c").cast("bigint").alias("cohort_week"),
        F.col("off").cast("int").alias("week_offset"),
        "revenue_cents",
        F.col("cum_revenue_cents").cast("bigint").alias(
            "cum_revenue_cents"
        ),
        "cohort_size",
        F.expr(
            "CAST(cum_revenue_cents * 100 div cohort_size AS BIGINT)"
        ).alias("ltv_per_user_scaled"),
    )


# ---------------------------------------------------------------------------
# ml_error_slices
# ---------------------------------------------------------------------------

_ERROR_SLICES_SQL = """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             event_type,
             CAST(((((epoch_us(ts)
                      - (((epoch_us(ts) % 86400000000) + 86400000000)
                         % 86400000000))
                     // 86400000000) % 7) + 7) % 7 AS INT) AS dow
      FROM events),
    t AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS npos
      FROM s),
    p AS (
      SELECT y, event_type, dow,
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
    best AS MATERIALIZED (
      SELECT p_micro AS thr FROM (
        SELECT p_micro,
               row_number() OVER (
                 ORDER BY 1 * fp + 5 * ((SELECT npos FROM t) - tp),
                          p_micro DESC) AS rn
        FROM c) b
      WHERE rn = 1),
    sliced AS (
      SELECT event_type, dow,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN p_micro >= (SELECT thr FROM best)
                            AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS fp,
             CAST(sum(CASE WHEN p_micro < (SELECT thr FROM best)
                            AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS fn
      FROM p GROUP BY 1, 2),
    ranked AS (
      SELECT *,
             (fp + fn) * 1000 // n AS err_milli,
             row_number() OVER (
               ORDER BY (fp + fn) * 1000 // n DESC, event_type, dow)
               AS rn
      FROM sliced)
    SELECT CAST(rn AS INT) AS rn, event_type, CAST(dow AS INT) AS dow,
           n, fp, fn,
           CAST(err_milli AS BIGINT) AS err_milli,
           CAST((SELECT thr FROM best) AS BIGINT) AS threshold_micro
    FROM ranked WHERE rn <= 5
"""


@register(
    "ml_error_slices",
    _ERROR_SLICES_SQL,
    "worst-5 (event_type, day-of-week) slices of the shared min-max "
    "score model operated at its COST-OPTIMAL threshold (FP=1/FN=5, "
    "re-derived through the identical CTE chain as ml_cost_threshold, "
    "highest threshold on ties): per slice the row count, false "
    "positives, false negatives, and error rate — the error-analysis "
    "step AFTER threshold selection (aggregate cost says how good the "
    "cut is; slicing says WHERE it fails — the fairness/debug report "
    "every deployment runs before shipping a cut). EXACT: the "
    "threshold sweep is integer (the ml_cost_threshold discipline); "
    "slice confusions are integer counts; err_milli floor-divides. "
    "Day-of-week uses the subtract-pmod floor-day form (pre-1970 "
    "safe). Shape: one fact hash-agg to the distinct-score dim for "
    "the sweep (windows on that bounded dim), one fact hash-agg to "
    "the <= |types|x7 slice dim for the confusion; the top-5 window "
    "runs over 35 slice rows",
)
def ml_error_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        "event_type",
        F.expr(
            "CAST(pmod((unix_micros(ts) - pmod(unix_micros(ts), "
            "86400000000)) div 86400000000, 7) AS INT)"
        ).alias("dow"),
    )
    t = s.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("npos"),
    )
    p = s.crossJoin(F.broadcast(t)).select(
        "y",
        "event_type",
        "dow",
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
    wdesc = Window.orderBy(F.desc("p_micro")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "p_micro",
        "npos",
        F.sum("pos_k").over(wdesc).alias("tp"),
        F.sum(F.col("n_k") - F.col("pos_k")).over(wdesc).alias("fp"),
    )
    wbest = Window.orderBy(
        (F.lit(1) * F.col("fp") + F.lit(5) * (F.col("npos") - F.col("tp"))),
        F.desc("p_micro"),
    )
    best = (
        c.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(F.col("p_micro").alias("thr"))
    )
    sliced = (
        p.crossJoin(F.broadcast(best))
        .groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(
                    (F.col("p_micro") >= F.col("thr"))
                    & (F.col("y") == 0),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(
                F.when(
                    (F.col("p_micro") < F.col("thr"))
                    & (F.col("y") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
            F.first("thr").alias("thr"),
        )
    )
    wrank = Window.orderBy(
        F.desc(F.expr("(fp + fn) * 1000 div n")),
        F.col("event_type"),
        F.col("dow"),
    )
    return (
        sliced.withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= 5)
        .select(
            F.col("rn").cast("int").alias("rn"),
            "event_type",
            F.col("dow").cast("int").alias("dow"),
            "n",
            "fp",
            "fn",
            F.expr("CAST((fp + fn) * 1000 div n AS BIGINT)").alias(
                "err_milli"
            ),
            F.col("thr").cast("bigint").alias("threshold_micro"),
        )
    )
