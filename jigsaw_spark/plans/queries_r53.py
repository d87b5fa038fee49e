"""Round-9 batch 13: dedup hub-removal what-if and temporal threshold
transfer.

- ``graph_hub_removal_impact``: the what-if behind hub treatment in
  near-dup graphs — remove the top-5 highest-degree keeper nodes and
  report the component structure BEFORE vs AFTER (component count,
  largest component, and how much of the largest component's mass the
  removal dissolves). graph_rich_club says whether hubs form a core;
  graph_degree_assortativity says how they mix; this runs the actual
  intervention and prices it — if the largest cluster shatters, the
  "near-dup cluster" was really one boilerplate hub and hub removal
  is the right dedup treatment; if it barely shrinks, the cluster is
  a genuine template family and cluster-level dedup wins.
- ``ml_threshold_transfer``: temporal generalization of the
  cost-optimal operating point — derive the FP=1/FN=5 optimal
  threshold on the TRAIN half of the timeline (weeks before the
  midpoint), apply it frozen to the TEST half, and report the regret
  against the test-optimal threshold — the deployment question
  ml_cost_threshold cannot answer (a cut tuned on history is operated
  on the future; regret is what that costs). Score normalization uses
  TRAIN bounds only, the production constraint.

Scale notes (100 TB): hub removal runs connected components TWICE over
keeper-graph edge sets (bounded by near-dup density; the one-task
union-find path at production edge counts — see
operators/dedup.connected_components) with the hub set a broadcast
5-row dim; threshold transfer is two fact hash-aggs into
distinct-score dims (train sweep + test sweep) — every window runs on
those value-domain-bounded dims, and the fact table is scanned twice,
never joined to itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# graph_hub_removal_impact
# ---------------------------------------------------------------------------


def _hub_removal_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _SIMHASH_KEEPER_CTE

    return f"""
    WITH RECURSIVE {_SIMHASH_KEEPER_CTE},
    prs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    edges AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs),
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
    hubs AS MATERIALIZED (
      SELECT u FROM (
        SELECT u, row_number() OVER (ORDER BY d DESC, u) AS rn
        FROM deg) t
      WHERE rn <= 5),
    reach_b(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach_b r JOIN edges e ON r.v = e.u
      WHERE e.v <> r.u),
    comp_b AS MATERIALIZED (
      SELECT u AS node, least(u, min(v)) AS comp
      FROM reach_b GROUP BY u),
    sizes_b AS (
      SELECT comp, CAST(count(*) AS BIGINT) AS sz
      FROM comp_b GROUP BY comp),
    kept AS MATERIALIZED (
      SELECT e.u, e.v FROM edges e
      WHERE NOT EXISTS (SELECT 1 FROM hubs h WHERE h.u = e.u)
        AND NOT EXISTS (SELECT 1 FROM hubs h WHERE h.u = e.v)),
    reach_a(u, v) AS (
      SELECT u, v FROM kept
      UNION
      SELECT r.u, k.v FROM reach_a r JOIN kept k ON r.v = k.u
      WHERE k.v <> r.u),
    comp_a AS MATERIALIZED (
      SELECT u AS node, least(u, min(v)) AS comp
      FROM reach_a GROUP BY u),
    sizes_a AS (
      SELECT comp, CAST(count(*) AS BIGINT) AS sz
      FROM comp_a GROUP BY comp),
    summary AS (
      SELECT
        (SELECT count(*) FROM deg) AS n_nodes,
        (SELECT count(*) FROM edges) AS m_directed,
        (SELECT count(*) FROM hubs) AS n_hubs,
        (SELECT count(*) FROM sizes_b) AS comp_before,
        (SELECT coalesce(max(sz), 0) FROM sizes_b) AS largest_before,
        (SELECT count(*) FROM sizes_a) AS comp_after,
        (SELECT coalesce(max(sz), 0) FROM sizes_a) AS largest_after)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(m_directed AS BIGINT) AS m_directed,
           CAST(n_hubs AS BIGINT) AS n_hubs,
           CAST(comp_before AS BIGINT) AS comp_before,
           CAST(largest_before AS BIGINT) AS largest_before,
           CAST(comp_after AS BIGINT) AS comp_after,
           CAST(largest_after AS BIGINT) AS largest_after,
           CAST(CASE WHEN largest_before = 0 THEN 0
                ELSE (largest_before - largest_after) * 1000
                     // largest_before END AS BIGINT)
             AS largest_drop_milli
    FROM summary
"""


@register(
    "graph_hub_removal_impact",
    _hub_removal_sql(),
    "hub-removal what-if on the near-dup keeper graph: remove the "
    "top-5 highest-degree nodes (degree desc, id — deterministic) and "
    "report component count and largest component BEFORE vs AFTER, "
    "plus how much of the largest component's mass dissolves — "
    "graph_rich_club says whether hubs form a core, this runs the "
    "actual intervention and prices it (largest cluster shatters => "
    "the 'cluster' was one boilerplate hub, remove hubs; barely "
    "shrinks => genuine template family, dedup at cluster level). "
    "Components are over nodes incident to the respective edge set "
    "(min-reachable-id labeling, both engines). All outputs exact "
    "integers. Shape: the keeper edge list is derived once; "
    "components run twice through connected_components (the one-task "
    "union-find path at production edge counts — near-dup edges are "
    "tiny relative to the corpus); the hub set is a broadcast 5-row "
    "dim anti-joined twice",
)
def graph_hub_removal_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import (
        connected_components,
        keeper_pairs,
        symmetric_edges,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = keeper_pairs(docs, "doc_id").localCheckpoint()
    edges = symmetric_edges(pairs)
    deg = edges.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    wh = Window.orderBy(F.desc("d"), F.col("u"))
    hubs = (
        deg.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") <= 5)
        .select("u")
        .localCheckpoint()
    )
    comp_b = connected_components(pairs, "doc_a", "doc_b")
    sizes_b = comp_b.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    kept = (
        pairs.join(hubs, pairs["doc_a"] == hubs["u"], "left_anti")
        .join(hubs, pairs["doc_b"] == hubs["u"], "left_anti")
    )
    comp_a = connected_components(kept, "doc_a", "doc_b")
    sizes_a = comp_a.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m_directed"))
    nh = hubs.agg(F.count(F.lit(1)).cast("bigint").alias("n_hubs"))
    before = sizes_b.agg(
        F.count(F.lit(1)).cast("bigint").alias("comp_before"),
        F.coalesce(F.max("sz"), F.lit(0))
        .cast("bigint")
        .alias("largest_before"),
    )
    after = sizes_a.agg(
        F.count(F.lit(1)).cast("bigint").alias("comp_after"),
        F.coalesce(F.max("sz"), F.lit(0))
        .cast("bigint")
        .alias("largest_after"),
    )
    return (
        n_nodes.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(nh))
        .crossJoin(F.broadcast(before))
        .crossJoin(F.broadcast(after))
        .select(
            "n_nodes",
            "m_directed",
            "n_hubs",
            "comp_before",
            "largest_before",
            "comp_after",
            "largest_after",
            F.expr(
                "CAST(CASE WHEN largest_before = 0 THEN 0"
                " ELSE (largest_before - largest_after) * 1000"
                " div largest_before END AS BIGINT)"
            ).alias("largest_drop_milli"),
        )
    )


# ---------------------------------------------------------------------------
# ml_threshold_transfer
# ---------------------------------------------------------------------------

_TRANSFER_SQL = """
    WITH s AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             epoch_us(ts) // 86400000000 // 7 AS w
      FROM events),
    span AS MATERIALIZED (
      SELECT (min(w) + max(w)) // 2 + 1 AS cut FROM s),
    train AS (SELECT * FROM s WHERE w < (SELECT cut FROM span)),
    test AS (SELECT * FROM s WHERE w >= (SELECT cut FROM span)),
    tb AS MATERIALIZED (
      SELECT min(cents) AS lo, max(cents) AS hi,
             CAST(sum(y) AS BIGINT) AS npos
      FROM train),
    tr AS (
      SELECT y,
             CASE WHEN (SELECT hi - lo FROM tb) = 0 THEN 500000
                  ELSE (cents - (SELECT lo FROM tb)) * 1000000
                       // (SELECT hi - lo FROM tb) END AS p
      FROM train),
    te AS (
      SELECT y,
             CASE WHEN (SELECT hi - lo FROM tb) = 0 THEN 500000
                  ELSE (cents - (SELECT lo FROM tb)) * 1000000
                       // (SELECT hi - lo FROM tb) END AS p
      FROM test),
    gtr AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(y) AS BIGINT) AS pos_k
      FROM tr GROUP BY 1),
    ctr AS (
      SELECT p,
             sum(pos_k) OVER (ORDER BY p DESC) AS tp,
             sum(n_k - pos_k) OVER (ORDER BY p DESC) AS fp
      FROM gtr),
    best_tr AS MATERIALIZED (
      SELECT p AS thr FROM (
        SELECT p, row_number() OVER (
          ORDER BY fp + 5 * ((SELECT npos FROM tb) - tp), p DESC) AS rn
        FROM ctr) t
      WHERE rn = 1),
    tstats AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(y) AS BIGINT) AS npos_test,
             CAST(sum(CASE WHEN p >= (SELECT thr FROM best_tr)
                            AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS fp_at,
             CAST(sum(CASE WHEN p < (SELECT thr FROM best_tr)
                            AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS fn_at
      FROM te),
    gte AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n_k,
             CAST(sum(y) AS BIGINT) AS pos_k
      FROM te GROUP BY 1),
    cte2 AS (
      SELECT p,
             sum(pos_k) OVER (ORDER BY p DESC) AS tp,
             sum(n_k - pos_k) OVER (ORDER BY p DESC) AS fp
      FROM gte),
    best_te AS MATERIALIZED (
      SELECT CAST(min(cost) AS BIGINT) AS best_cost FROM (
        SELECT fp + 5 * ((SELECT npos_test FROM tstats) - tp) AS cost
        FROM cte2) t)
    SELECT CAST((SELECT cut FROM span) AS BIGINT) AS cut_week,
           CAST((SELECT thr FROM best_tr) AS BIGINT) AS train_thr_micro,
           (SELECT n_test FROM tstats) AS n_test,
           (SELECT npos_test FROM tstats) AS npos_test,
           CAST((SELECT fp_at + 5 * fn_at FROM tstats) AS BIGINT)
             AS test_cost_at_train_thr,
           (SELECT best_cost FROM best_te) AS test_best_cost,
           CAST(CASE WHEN (SELECT best_cost FROM best_te) = 0 THEN 0
                ELSE ((SELECT fp_at + 5 * fn_at FROM tstats)
                      - (SELECT best_cost FROM best_te)) * 1000
                     // (SELECT best_cost FROM best_te) END AS BIGINT)
             AS regret_milli
"""


@register(
    "ml_threshold_transfer",
    _TRANSFER_SQL,
    "temporal generalization of the cost-optimal operating point: "
    "derive the FP=1/FN=5 optimal threshold on the TRAIN half of the "
    "timeline (weeks before the span midpoint), operate it FROZEN on "
    "the TEST half, and report the cost paid vs the test-optimal cost "
    "as regret in milli — the deployment question ml_cost_threshold "
    "cannot answer (a cut is tuned on history and operated on the "
    "future; regret is what the drift costs). Score normalization "
    "uses TRAIN bounds only — the production constraint — and the "
    "normalization is monotone, so the test-optimal sweep over "
    "train-scaled scores finds the true optimum. EXACT: both sweeps "
    "are the ml_cost_threshold integer discipline (ties: highest "
    "threshold); regret is one integer ratio (test_best = 0 reports "
    "0). Shape: two fact hash-aggs into distinct-score dims (train "
    "sweep, test sweep) plus one test confusion agg — all windows on "
    "value-domain-bounded dims, the fact table never joins itself",
)
def ml_threshold_transfer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    s = ev.select(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.expr("unix_micros(ts) div 86400000000 div 7").alias("w"),
    )
    span = s.agg(
        F.expr("(min(w) + max(w)) div 2 + 1").alias("cut")
    )
    sc = s.crossJoin(F.broadcast(span))
    train = sc.filter(F.col("w") < F.col("cut"))
    test = sc.filter(F.col("w") >= F.col("cut"))
    tb = train.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.sum("y").cast("bigint").alias("npos"),
    )
    p_expr = (
        "CASE WHEN hi - lo = 0 THEN 500000"
        " ELSE (cents - lo) * 1000000 div (hi - lo) END"
    )
    tr = train.crossJoin(F.broadcast(tb)).select(
        "y", "npos", F.expr(p_expr).alias("p")
    )
    te = test.crossJoin(F.broadcast(tb)).select(
        "y", F.expr(p_expr).alias("p")
    )
    gtr = tr.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("y").cast("bigint").alias("pos_k"),
        F.first("npos").alias("npos"),
    )
    wdesc = Window.orderBy(F.desc("p")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ctr = gtr.select(
        "p",
        "npos",
        F.sum("pos_k").over(wdesc).alias("tp"),
        F.sum(F.col("n_k") - F.col("pos_k")).over(wdesc).alias("fp"),
    )
    wbest = Window.orderBy(
        F.col("fp") + F.lit(5) * (F.col("npos") - F.col("tp")),
        F.desc("p"),
    )
    best_tr = (
        ctr.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(F.col("p").alias("thr"))
    )
    tec = te.crossJoin(F.broadcast(best_tr))
    tstats = tec.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum("y").cast("bigint").alias("npos_test"),
        F.sum(
            F.when((F.col("p") >= F.col("thr")) & (F.col("y") == 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("fp_at"),
        F.sum(
            F.when((F.col("p") < F.col("thr")) & (F.col("y") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("fn_at"),
    )
    gte = te.groupBy("p").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("y").cast("bigint").alias("pos_k"),
    )
    cte2 = gte.select(
        "p",
        F.sum("pos_k").over(wdesc).alias("tp"),
        F.sum(F.col("n_k") - F.col("pos_k")).over(wdesc).alias("fp"),
    )
    best_te = (
        cte2.crossJoin(F.broadcast(tstats.select("npos_test")))
        .select(
            (F.col("fp") + F.lit(5) * (F.col("npos_test") - F.col("tp")))
            .alias("cost")
        )
        .agg(F.min("cost").cast("bigint").alias("test_best_cost"))
    )
    return (
        span.crossJoin(F.broadcast(best_tr))
        .crossJoin(F.broadcast(tstats))
        .crossJoin(F.broadcast(best_te))
        .select(
            F.col("cut").cast("bigint").alias("cut_week"),
            F.col("thr").cast("bigint").alias("train_thr_micro"),
            "n_test",
            "npos_test",
            (F.col("fp_at") + F.lit(5) * F.col("fn_at"))
            .cast("bigint")
            .alias("test_cost_at_train_thr"),
            "test_best_cost",
            F.expr(
                "CAST(CASE WHEN test_best_cost = 0 THEN 0"
                " ELSE (fp_at + 5 * fn_at - test_best_cost) * 1000"
                " div test_best_cost END AS BIGINT)"
            ).alias("regret_milli"),
        )
    )
