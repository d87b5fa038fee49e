"""Round-11 queue: global transitivity and dominant period (module
queries_r60 sits BEHIND the 50-slot certification window by the
documented overflow policy — `_OVERFLOW_BOUNDARY` in plans/queries;
these two queries are the next round's queue, the r40/r55 pattern:
replica-verified now, driver row next round).

- ``graph_transitivity``: GLOBAL clustering coefficient of the keeper
  graph — 3*triangles / wedges, with wedges = sum over nodes of
  d(d-1)/2. graph_clustering_coeff averages LOCAL coefficients (every
  node votes equally); transitivity weights by wedge count, so one
  hub with a million open wedges drags it toward 0 while barely
  moving the local average — the pair of numbers TOGETHER
  distinguishes 'many small cliques' from 'one sparse hub', which is
  exactly the template-family-vs-boilerplate-hub question the graph
  family keeps asking. EXACT: triangles and wedges are integer
  counts; one floor division at the end.
- ``ts_dominant_period``: the dominant seasonal period per event
  type — argmax over lags 1..14 of the exact integer ACF (the
  ts_acf_exact machinery: u_t = n*x_t - S, shared denominator
  sum(u^2) per type, so the argmax compares INTEGER numerators with
  no division until the report; ties to the smallest lag). ts_mase /
  ts_seasonal_naive ASSUME period 7; ts_acf_exact prints the
  whole correlogram; this extracts the single number a pipeline can
  branch on (schedule detection: a type whose dominant lag is not 7
  should not be scored by a weekly-seasonal baseline).

Scale notes (100 TB): transitivity reuses the shared
localCheckpoint'ed keeper edge list — one degree hash-agg for wedges,
one adjacency-pair join for triangle closure (keeper-graph-sized,
never corpus all-pairs), two 1-row rollups; the dominant period is
day-grain pre-agg -> 14 shifted-key joins against the day dim -> a
per-type argmax over a 14-row relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# graph_transitivity
# ---------------------------------------------------------------------------


def _transitivity_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
    wed AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges
      FROM deg),
    tri AS MATERIALIZED (
      SELECT CAST(count(*) // 3 AS BIGINT) AS triangles
      FROM prs p
      JOIN edges e1 ON e1.u = p.doc_a
      JOIN edges e2 ON e2.u = p.doc_b AND e2.v = e1.v)
    SELECT (SELECT n_nodes FROM wed) AS n_nodes,
           CAST((SELECT count(*) FROM prs) AS BIGINT) AS n_edges,
           (SELECT wedges FROM wed) AS wedges,
           (SELECT triangles FROM tri) AS triangles,
           CAST(CASE WHEN (SELECT wedges FROM wed) = 0 THEN 0
             ELSE 3 * (SELECT triangles FROM tri) * 1000
                  // (SELECT wedges FROM wed) END AS BIGINT)
             AS transitivity_milli
"""


@register(
    "graph_transitivity",
    _transitivity_sql(),
    "global clustering coefficient (transitivity) of the keeper "
    "graph: 3*triangles div wedges, wedges = sum d(d-1)/2 — "
    "graph_clustering_coeff averages LOCAL coefficients (each node an "
    "equal vote); transitivity weights by wedge count, so one sparse "
    "hub drags it to 0 while barely moving the local average, and the "
    "two numbers together separate 'many small cliques' (both high) "
    "from 'one boilerplate hub' (local high, global low) — the "
    "cluster-shape diagnostic behind the hub-removal intervention. "
    "EXACT: integer triangle/wedge counts (each triangle closes 3 "
    "adjacent pairs, hence div 3), one floor division. Shape: the "
    "shared localCheckpoint'ed keeper edge list; one degree hash-agg, "
    "one pair-closure join (keeper-graph-sized), 1-row output",
)
def graph_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_pairs, symmetric_edges

    docs = _t(spark, sf_dir, "documents")
    pairs = keeper_pairs(docs, "doc_id").localCheckpoint()
    edges = symmetric_edges(pairs)
    deg = edges.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    wed = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("wedges"),
    )
    e1 = edges.select(F.col("u").alias("a1"), F.col("v").alias("c1"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    tri = (
        pairs.join(e1, pairs["doc_a"] == e1["a1"])
        .join(
            e2,
            (pairs["doc_b"] == e2["b2"]) & (e1["c1"] == e2["c2"]),
        )
        .agg(F.expr("CAST(count(1) div 3 AS BIGINT)").alias("triangles"))
    )
    ne = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        wed.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_nodes",
            "n_edges",
            "wedges",
            "triangles",
            F.expr(
                "CAST(CASE WHEN wedges = 0 THEN 0"
                " ELSE 3 * triangles * 1000 div wedges END AS BIGINT)"
            ).alias("transitivity_milli"),
        )
    )


# ---------------------------------------------------------------------------
# ts_dominant_period
# ---------------------------------------------------------------------------

_DOM_PERIOD_SQL = """
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    tot AS MATERIALIZED (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(cents) AS BIGINT) AS s
      FROM daily GROUP BY 1),
    u AS MATERIALIZED (
      SELECT d.event_type, d.day,
             CAST(t.n_days * d.cents - t.s AS HUGEINT) AS u
      FROM daily d JOIN tot t ON d.event_type = t.event_type),
    den AS (
      SELECT event_type, CAST(sum(u * u) AS HUGEINT) AS den
      FROM u GROUP BY 1),
    lags AS (SELECT unnest(range(1, 15)) AS lag),
    num AS (
      SELECT a.event_type, l.lag,
             CAST(sum(a.u * b.u) AS HUGEINT) AS num
      FROM u a
      CROSS JOIN lags l
      JOIN u b ON b.event_type = a.event_type AND b.day = a.day + l.lag
      GROUP BY 1, 2),
    ranked AS (
      SELECT n.event_type, n.lag, n.num, d.den, t.n_days,
             row_number() OVER (PARTITION BY n.event_type
               ORDER BY n.num DESC, n.lag) AS rn
      FROM num n
      JOIN den d ON n.event_type = d.event_type
      JOIN tot t ON n.event_type = t.event_type)
    SELECT event_type,
           CAST(lag AS INT) AS dominant_lag,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(CASE WHEN den = 0 THEN 0
             ELSE num * 1000 // den END AS BIGINT) AS acf_milli
    FROM ranked WHERE rn = 1
"""


@register(
    "ts_dominant_period",
    _DOM_PERIOD_SQL,
    "dominant seasonal period per event type: argmax over lags 1..14 "
    "of the exact integer ACF (the ts_acf_exact machinery — "
    "u_t = n*x_t - S, per-type denominator sum(u^2) shared across "
    "lags, so the argmax compares INTEGER numerators and divides only "
    "in the report; ties to the smallest lag) — ts_mase and "
    "ts_seasonal_naive ASSUME period 7, ts_acf_exact prints the whole "
    "correlogram; this extracts the one number a pipeline can branch "
    "on (a type whose dominant lag is not 7 must not be scored by a "
    "weekly-seasonal baseline). A constant series (den = 0) reports "
    "acf 0 at its argmax lag. Shape: day-grain pre-agg FIRST (the "
    "MASE discipline), 14 shifted-key joins against the day dim, "
    "then a per-type argmax window over a 14-row relation",
)
def ts_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cents").cast("bigint").alias("s"),
    )
    dec = "decimal(38,0)"
    u = (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "day",
            (F.col("n_days") * F.col("cents") - F.col("s"))
            .cast(dec)
            .alias("u"),
        )
        .localCheckpoint()
    )
    den = u.groupBy("event_type").agg(
        F.sum(F.col("u") * F.col("u")).alias("den")
    )
    lags = F.broadcast(
        spark.createDataFrame([(i,) for i in range(1, 15)], "lag int")
    )
    a = u.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("day_a"),
        F.col("u").alias("ua"),
    ).crossJoin(lags)
    b = u.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_b"),
        F.col("u").alias("ub"),
    )
    num = (
        a.join(
            b,
            (F.col("et") == F.col("et_b"))
            & (F.col("day_b") == F.col("day_a") + F.col("lag")),
        )
        .groupBy(F.col("et").alias("event_type"), "lag")
        .agg(F.sum(F.col("ua") * F.col("ub")).alias("num"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("num"), F.col("lag")
    )
    return (
        num.join(F.broadcast(den), "event_type")
        .join(F.broadcast(tot), "event_type")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("lag").cast("int").alias("dominant_lag"),
            F.col("n_days").cast("bigint").alias("n_days"),
            F.expr(
                "CAST(CASE WHEN den = 0 THEN 0"
                " ELSE num * 1000 div den END AS BIGINT)"
            ).alias("acf_milli"),
        )
    )
