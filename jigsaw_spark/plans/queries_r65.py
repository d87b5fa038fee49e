"""Round-12 queue: local bridges and the Fano factor (module
queries_r65 sits BEHIND the 50-slot certification window by the
documented overflow policy — `_OVERFLOW_BOUNDARY` in plans/queries;
these two queries are the next round's queue, the r40/r55/r60 pattern:
replica-verified now, driver row next round).

- ``graph_local_bridges``: how much of the keeper graph is held
  together by single threads — an edge is a LOCAL BRIDGE when its
  endpoints share no common neighbor (it closes no triangle; removing
  it lengthens every path between its sides). graph_transitivity
  reports the closed fraction of wedges; this reports the edges with
  NO closure at all: a dup graph that is mostly bridges is chains of
  weak pairwise evidence (each edge is uncorroborated), while a
  bridge-free graph is clique-like corroborated clusters — the
  confidence split that decides whether components can be trusted as
  dedup clusters. EXACT integer counts; one floor division.
- ``ts_fano_factor``: overdispersion of daily event COUNTS per type —
  Fano factor F = variance/mean of the day-grain counts as the exact
  integer ratio (n*Q - S^2) / (n*S) in milli. F ~ 1000 is Poisson
  (events arrive independently); F >> 1000 is bursty (campaign days,
  batch replays, incident retries) — the arrival-process diagnostic
  that says whether a rate-based anomaly rule (ts_anomaly_iqr,
  ts_control_rules) can assume stable variance at all.

Scale notes (100 TB): local bridges reuse the shared
localCheckpoint'ed keeper pair list — triangle-closure evidence comes
from ONE adjacency-pair join (keeper-graph-sized, the transitivity
shape) consumed as a LEFT ANTI join, then two 1-row rollups; the Fano
factor is a day-grain count pre-agg followed by one |types|-row moment
hash-agg — no windows, no pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# graph_local_bridges
# ---------------------------------------------------------------------------


def _local_bridges_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    closed AS MATERIALIZED (
      SELECT DISTINCT p.doc_a, p.doc_b
      FROM prs p
      JOIN edges e1 ON e1.u = p.doc_a
      JOIN edges e2 ON e2.u = p.doc_b AND e2.v = e1.v),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_edges FROM prs),
    ct AS (
      SELECT CAST(count(*) AS BIGINT) AS n_closed FROM closed)
    SELECT t.n_edges,
           CAST(t.n_edges - c.n_closed AS BIGINT) AS n_bridges,
           c.n_closed AS n_triangle_edges,
           CAST(CASE WHEN t.n_edges = 0 THEN 0
             ELSE (t.n_edges - c.n_closed) * 1000 // t.n_edges
             END AS BIGINT) AS bridge_milli
    FROM tot t CROSS JOIN ct c
"""


@register(
    "graph_local_bridges",
    _local_bridges_sql(),
    "local-bridge share of the keeper graph: an edge is a local "
    "bridge when its endpoints share NO common neighbor (closes no "
    "triangle — removing it lengthens every path between its sides). "
    "graph_transitivity reports the closed WEDGE fraction; this "
    "reports the UNCORROBORATED edge fraction: a dup graph that is "
    "mostly bridges is chains of weak pairwise evidence, a bridge-"
    "free graph is clique-like corroborated clusters — the confidence "
    "split that decides whether connected components can be trusted "
    "as dedup clusters. EXACT integer counts, one floor division. "
    "Shape: the shared keeper pair list; triangle evidence from ONE "
    "adjacency-pair join (the transitivity shape) consumed as a "
    "distinct + two 1-row rollups",
)
def graph_local_bridges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_pairs, symmetric_edges

    docs = _t(spark, sf_dir, "documents")
    pairs = keeper_pairs(docs, "doc_id").localCheckpoint()
    edges = symmetric_edges(pairs)
    e1 = edges.select(F.col("u").alias("a1"), F.col("v").alias("c1"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c2"))
    closed = (
        pairs.join(e1, pairs["doc_a"] == e1["a1"])
        .join(
            e2,
            (pairs["doc_b"] == e2["b2"]) & (e1["c1"] == e2["c2"]),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    tot = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    ct = closed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_closed")
    )
    return tot.crossJoin(F.broadcast(ct)).select(
        "n_edges",
        (F.col("n_edges") - F.col("n_closed"))
        .cast("bigint")
        .alias("n_bridges"),
        F.col("n_closed").alias("n_triangle_edges"),
        F.expr(
            "CAST(CASE WHEN n_edges = 0 THEN 0"
            " ELSE (n_edges - n_closed) * 1000 div n_edges"
            " END AS BIGINT)"
        ).alias("bridge_milli"),
    )


# ---------------------------------------------------------------------------
# ts_fano_factor
# ---------------------------------------------------------------------------

_FANO_SQL = """
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS n_events,
           CAST(CASE WHEN count(*) * sum(x) = 0 THEN 0
             ELSE (count(*) * sum(x * x) - sum(x) * sum(x)) * 1000
                  // (count(*) * sum(x)) END AS BIGINT) AS fano_milli
    FROM daily GROUP BY event_type
"""


@register(
    "ts_fano_factor",
    _FANO_SQL,
    "overdispersion (Fano factor) of daily event counts per type: "
    "F = variance/mean of the day-grain counts as the exact integer "
    "ratio (n*Q - S^2) / (n*S) in milli — F ~ 1000 is Poisson "
    "arrivals, F >> 1000 is bursty (campaign days, batch replays, "
    "incident retries). The arrival-process diagnostic read before "
    "any rate-based anomaly rule (ts_anomaly_iqr, ts_control_rules) "
    "is allowed to assume stable variance; ts_turning_points tests "
    "the VALUE sequence's shape, this tests the COUNT process's "
    "dispersion. Shape: day-grain count pre-agg, one |types|-row "
    "integer moment hash-agg — no windows, no pairs",
)
def ts_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    return daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("n_events"),
        F.expr(
            "CAST(CASE WHEN count(1) * sum(x) = 0 THEN 0"
            " ELSE (count(1) * sum(x * x) - sum(x) * sum(x)) * 1000"
            " div (count(1) * sum(x)) END AS BIGINT)"
        ).alias("fano_milli"),
    )
