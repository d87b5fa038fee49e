"""Round-9 queue (registered as OVERFLOW behind the r8 certification
window — the test_entry policy exempts queries_r40+ modules from the
current window; rotate these to the head next round):

- ``ts_mase``: mean absolute SCALED error of the weekly seasonal-naive
  forecast per event type — MAE(lag-7 forecast) / MAE(lag-1 naive), the
  scale-free forecast-accuracy standard (MAPE divides by the actual and
  explodes near zero; MASE divides by the naive baseline's error). The
  ratio of two rational MAEs stays EXACT: mase_micro =
  sum|e7| * n1 * 1e6 div (sum|e1| * n7), pure integers.
- ``graph_random_walk``: deterministic 4-step random walks from every
  node of the near-dup keeper graph, steps drawn from the md5 stream
  (next = sorted_neighbors[md5(seed|start|step|node) % degree]) — the
  walk-corpus generator for graph embeddings (DeepWalk/node2vec data
  prep), reproducible across engines/partitionings/retries because the
  'randomness' is a keyed hash, the same discipline as every sampler
  here. Oracle replays the walks with a recursive CTE over the same
  adjacency lists.

Scale notes (100 TB): MASE is one day-grain hash-agg + two shifted-key
equi-joins (never a window over raw rows); the walk graph is the
keeper pair graph (bounded by near-dup density, not corpus size), the
4 steps are 4 adjacency joins — frontier-sized, shuffle on the node
key each step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# ts_mase
# ---------------------------------------------------------------------------

_MASE_SQL = """
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    e7 AS (
      SELECT a.event_type,
             CAST(count(*) AS BIGINT) AS n7,
             CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS s7
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day = a.day - 7
      GROUP BY 1),
    e1 AS (
      SELECT a.event_type,
             CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(abs(a.cents - b.cents)) AS BIGINT) AS s1
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day = a.day - 1
      GROUP BY 1)
    SELECT e7.event_type, e7.n7, e7.s7, e1.n1, e1.s1,
           CAST(CASE WHEN e1.s1 = 0 THEN 0
                ELSE e7.s7 * e1.n1 * 1000000 // (e1.s1 * e7.n7) END
                AS BIGINT) AS mase_micro
    FROM e7 JOIN e1 ON e7.event_type = e1.event_type
"""


@register(
    "ts_mase",
    _MASE_SQL,
    "mean absolute scaled error of the weekly seasonal-naive forecast "
    "per event type: MAE(lag-7 forecast) / MAE(lag-1 naive) — the "
    "scale-free forecast-accuracy standard (MAPE blows up near zero "
    "actuals; MASE normalizes by the naive baseline instead, < 1e6 "
    "micro means the forecast beats naive). The ratio of two rational "
    "MAEs is kept EXACT as s7 * n1 * 1e6 div (s1 * n7) — pure integer "
    "cents, zero-denominator guarded. Shape: one day-grain hash-agg + "
    "two shifted-key equi-joins (the ts_seasonal_naive_mape shape) — "
    "no window ever touches raw rows",
)
def ts_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )

    def err(lag: int, n: str, s: str) -> DataFrame:
        a = daily.alias("a")
        b = daily.select(
            F.col("event_type").alias("bet"),
            (F.col("day") + lag).alias("bday"),
            F.col("cents").alias("bcents"),
        )
        return (
            a.join(
                b,
                (F.col("a.event_type") == F.col("bet"))
                & (F.col("a.day") == F.col("bday")),
            )
            .groupBy(F.col("a.event_type").alias("event_type"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias(n),
                F.sum(F.abs(F.col("a.cents") - F.col("bcents")))
                .cast("bigint")
                .alias(s),
            )
        )

    e7 = err(7, "n7", "s7")
    e1 = err(1, "n1", "s1")
    return e7.join(e1, "event_type").select(
        "event_type",
        "n7",
        "s7",
        "n1",
        "s1",
        F.expr(
            "CAST(CASE WHEN s1 = 0 THEN 0"
            " ELSE s7 * n1 * 1000000 div (s1 * n7) END AS BIGINT)"
        ).alias("mase_micro"),
    )


# ---------------------------------------------------------------------------
# graph_random_walk
# ---------------------------------------------------------------------------


def _walk_with_clause() -> str:
    """The full WITH RECURSIVE clause producing the ``walk`` relation —
    shared verbatim with graph_walk_skipgrams (queries_r44), which
    post-processes the same walks."""
    from jigsaw_spark.plans.queries_llm import _SIMHASH_KEEPER_CTE

    return f"""
    WITH RECURSIVE {_SIMHASH_KEEPER_CTE},
    prs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs),
    adj AS MATERIALIZED (
      SELECT u, list(v ORDER BY v) AS nbrs FROM edges GROUP BY u),
    walk(s, start, node, path) AS (
      SELECT 0, u, u, CAST(u AS VARCHAR) FROM adj
      UNION ALL
      SELECT s + 1, start,
             adj.nbrs[CAST(1 + CAST(CAST(('0x' || substr(
               md5(concat_ws('|', 'walk', CAST(start AS VARCHAR),
                             CAST(s AS VARCHAR),
                             CAST(node AS VARCHAR))), 1, 12))
               AS UBIGINT) AS BIGINT) % len(adj.nbrs) AS INT)],
             path || '->' || CAST(adj.nbrs[CAST(1 + CAST(CAST(('0x' ||
               substr(md5(concat_ws('|', 'walk', CAST(start AS VARCHAR),
                             CAST(s AS VARCHAR),
                             CAST(node AS VARCHAR))), 1, 12))
               AS UBIGINT) AS BIGINT) % len(adj.nbrs) AS INT)] AS VARCHAR)
      FROM walk JOIN adj ON adj.u = walk.node
      WHERE s < 4)
"""


def _walk_sql() -> str:
    return (
        _walk_with_clause()
        + """
    SELECT CAST(start AS BIGINT) AS start,
           CAST(node AS BIGINT) AS final_node,
           path
    FROM walk WHERE s = 4
"""
    )


@register(
    "graph_random_walk",
    _walk_sql(),
    "deterministic 4-step random walks from EVERY node of the "
    "near-dup keeper graph (SimHash hamming <= 2 over exact-dedup "
    "keepers — the graph_modularity edge set): step t at node v moves "
    "to sorted_neighbors[md5('walk'|start|t|v) % degree] — the "
    "walk-corpus generator behind DeepWalk/node2vec-style graph "
    "embeddings, reproducible across engines, partitionings, and "
    "retries because the randomness is the keyed md5 stream (the "
    "engine's universal sampler discipline; a rand() walk could never "
    "be oracle-checked or resumed). Walks can revisit nodes — that is "
    "the walk distribution, not a bug. Shape: the keeper pair graph "
    "is bounded by near-dup density (not corpus size); adjacency is "
    "one hash-agg; each of the 4 steps is one frontier-sized join on "
    "the node key. The oracle replays the walks with a recursive CTE "
    "over identical adjacency lists",
)
def graph_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import exact_dedup, simhash_pairs

    docs = _t(spark, sf_dir, "documents")
    keepers = (
        exact_dedup(docs, "doc_id")
        .filter(~F.col("is_dup"))
        .select("doc_id", "text")
    )
    pairs = simhash_pairs(keepers, "doc_id", max_hamming=2).select(
        "doc_a", "doc_b"
    )
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    # localCheckpoint: the 4 step-joins below would otherwise re-derive
    # the whole exact-dedup -> simhash-pairs -> groupBy lineage once per
    # step (10 scans / 35 shuffles in the plan audit for what is
    # logically 2 scans + 5 shuffles) — the graph_kcore r5 lesson.
    adj = edges.groupBy("u").agg(
        F.sort_array(F.collect_set("v")).alias("nbrs")
    ).localCheckpoint()
    walk = adj.select(
        F.col("u").alias("start"),
        F.col("u").alias("node"),
        F.col("u").cast("string").alias("path"),
    )
    for s in range(4):
        # fresh aliases each round: aliasing mints new attribute ids, so
        # the walk-frame (which descends from adj) never self-join-
        # collides with the adjacency side (the classic ambiguity trap)
        adj_s = adj.select(
            F.col("u").alias(f"_u{s}"), F.col("nbrs").alias(f"_nbrs{s}")
        )
        step = F.expr(
            f"element_at(_nbrs{s}, CAST(1 + pmod(CAST(conv(substring("
            f"md5(concat_ws('|', 'walk', CAST(start AS STRING), '{s}',"
            f" CAST(node AS STRING))), 1, 12), 16, 10) AS BIGINT),"
            f" size(_nbrs{s})) AS INT))"
        )
        walk = walk.join(
            adj_s, walk["node"] == adj_s[f"_u{s}"]
        ).select(
            "start",
            step.alias("node"),
            F.concat(
                F.col("path"), F.lit("->"), step.cast("string")
            ).alias("path"),
        )
    return walk.select(
        F.col("start").cast("bigint").alias("start"),
        F.col("node").cast("bigint").alias("final_node"),
        "path",
    )
