"""Round-11 batch 3: keeper-graph inequality/mixing diagnostics and
time-series shape tests.

- ``graph_degree_gini``: Gini coefficient of keeper-graph degrees in
  EXACT integers from the degree-value HISTOGRAM — sum-of-ranks is
  reconstructed per distinct degree value (rank mass = c*C_prev +
  c(c+1)/2), so the windows run over the distinct-degree dim
  (value-domain bounded, the ml_auc_exact class), never a global
  per-node rank. agg_gini measures revenue concentration with a
  per-customer rank window; this is the graph twin — degree
  inequality is the hub-dominance number that complements
  graph_rich_club (WHERE the high-degree mass sits) and transitivity
  (what it does to wedges).
- ``graph_lang_assortativity``: Newman CATEGORICAL assortativity of
  the keeper graph over the lang attribute — graph_assortativity /
  graph_degree_assortativity correlate endpoint DEGREES; this asks
  whether near-dup edges stay within a language (r -> 1: dedup can
  shard by lang with no cross-shard edges; r ~ 0: language labels are
  noisy or templates cross languages — the mislabel smoke alarm).
  EXACT: r = (2m*same - sum(a_l^2)) / ((2m)^2 - sum(a_l^2)) on
  directed-edge counts, one trunc division at the end.
- ``ts_turning_points``: per event type, strict local extrema count
  of the daily series (prev < x > next or prev > x < next over the
  day-ordered sequence) with the randomness reference E = 2(n-2)/3 —
  a series with far fewer turning points than random is trending or
  sticky (ts_control_rules' runs test asks about LEVELS vs the mean;
  this asks about local SHAPE, mean-free).
- ``ts_gap_stats``: per event type, daily-continuity report — days
  present, calendar span, missing days, number of gaps, longest gap
  (islands arithmetic: day - lag(day) - 1). ts_gap_fill/ts_locf FILL
  gaps assuming they are benign; this is the audit that says whether
  they are (a 30-day hole is an outage, not noise) — the per-type
  summary twin of rel_gaps_islands' island enumeration.

Scale notes (100 TB): degree Gini aggregates to the distinct-degree
histogram before any window (value-domain bounded); lang assortativity
is the keeper edge list joined twice against a broadcast doc->lang
projection then one |langs|-row rollup; both ts queries pre-aggregate
to day grain FIRST (the MASE discipline) so windows run over per-type
day series, partitioned by event_type — nothing global, nothing
row-pair shaped."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jigsaw_spark.plans.queries import _t, register

# ---------------------------------------------------------------------------
# graph_degree_gini
# ---------------------------------------------------------------------------


def _degree_gini_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    deg AS (
      SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
    hist AS (
      SELECT d, CAST(count(*) AS BIGINT) AS c FROM deg GROUP BY d),
    ranked AS (
      SELECT d, c,
             CAST(coalesce(sum(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cprev
      FROM hist),
    m AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(d * c) AS BIGINT) AS s,
             CAST(sum(d * (c * cprev + c * (c + 1) // 2)) AS BIGINT)
               AS w
      FROM ranked)
    SELECT n AS n_nodes, s AS sum_degree,
           CAST(2 * w - (n + 1) * s AS BIGINT) AS gini_num,
           CAST(n * s AS BIGINT) AS gini_den,
           CAST(CASE WHEN n * s = 0 THEN 0
             ELSE (2 * w - (n + 1) * s) * 1000 // (n * s)
             END AS BIGINT) AS gini_milli
    FROM m
"""


@register(
    "graph_degree_gini",
    _degree_gini_sql(),
    "Gini coefficient of keeper-graph degrees, exact integers from the "
    "degree-value HISTOGRAM: sum-of-ranks is reconstructed per "
    "distinct degree (rank mass = c*C_prev + c(c+1)/2, ties share a "
    "value so any within-tie order gives the same sum), so the prefix "
    "window runs over the distinct-degree dim (value-domain bounded, "
    "the ml_auc_exact class) — NEVER a global per-node rank (the "
    "agg_gini formula, the graph twin of its revenue concentration). "
    "High Gini + high rich-club = one hub family dominates the dup "
    "graph; low Gini + high transitivity = many comparable cliques. "
    "Nodes = endpoints with degree >= 1 (the graph family convention). "
    "Shape: keeper edges -> degree hash-agg -> distinct-degree "
    "histogram -> bounded-dim prefix window -> 1-row report",
)
def graph_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_edges

    docs = _t(spark, sf_dir, "documents")
    edges = keeper_edges(docs, "doc_id").localCheckpoint()
    deg = edges.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    hist = deg.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "d",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0))
        .cast("bigint")
        .alias("cprev"),
    )
    m = ranked.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("d") * F.col("c")).cast("bigint").alias("s"),
        F.sum(
            F.col("d")
            * (
                F.col("c") * F.col("cprev")
                + F.expr("c * (c + 1) div 2")
            )
        )
        .cast("bigint")
        .alias("w"),
    )
    return m.select(
        F.col("n").alias("n_nodes"),
        F.col("s").alias("sum_degree"),
        F.expr("CAST(2 * w - (n + 1) * s AS BIGINT)").alias("gini_num"),
        F.expr("CAST(n * s AS BIGINT)").alias("gini_den"),
        F.expr(
            "CAST(CASE WHEN n * s = 0 THEN 0"
            " ELSE (2 * w - (n + 1) * s) * 1000 div (n * s)"
            " END AS BIGINT)"
        ).alias("gini_milli"),
    )


# ---------------------------------------------------------------------------
# graph_lang_assortativity
# ---------------------------------------------------------------------------


def _lang_assort_sql() -> str:
    from jigsaw_spark.plans.queries_llm import _KEEPER_EDGES_CTE

    return f"""
    WITH {_KEEPER_EDGES_CTE},
    lab AS (SELECT doc_id, lang FROM documents),
    el AS MATERIALIZED (
      SELECT la.lang AS lang_u, lb.lang AS lang_v
      FROM edges e
      JOIN lab la ON la.doc_id = e.u
      JOIN lab lb ON lb.doc_id = e.v),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS m2,
             CAST(sum(CASE WHEN lang_u = lang_v THEN 1 ELSE 0 END)
               AS BIGINT) AS same
      FROM el),
    marg AS (
      SELECT CAST(sum(a * a) AS BIGINT) AS sa2 FROM (
        SELECT lang_u, CAST(count(*) AS BIGINT) AS a
        FROM el GROUP BY 1) t)
    SELECT t.m2 AS n_edges_directed, t.same AS n_same_lang,
           g.sa2 AS sum_marg_sq,
           CAST(CASE WHEN t.m2 = 0 THEN 0
             ELSE t.same * 1000 // t.m2 END AS BIGINT)
             AS same_share_milli,
           CAST(CASE WHEN t.m2 = 0 THEN 0
             ELSE g.sa2 * 1000 // (t.m2 * t.m2) END AS BIGINT)
             AS expected_share_milli,
           CAST(CASE WHEN t.m2 * t.m2 = g.sa2 THEN 0
             ELSE (t.m2 * t.same - g.sa2) * 1000
                  // (t.m2 * t.m2 - g.sa2) END AS BIGINT)
             AS assortativity_milli
    FROM tot t CROSS JOIN marg g
"""


@register(
    "graph_lang_assortativity",
    _lang_assort_sql(),
    "Newman CATEGORICAL assortativity of the keeper graph over lang: "
    "graph_assortativity / graph_degree_assortativity correlate "
    "endpoint DEGREES; this asks whether near-dup edges stay inside a "
    "language — r -> 1000 milli means dedup shards cleanly by lang "
    "(no cross-shard pair work), r ~ 0 means lang labels are noisy or "
    "templates cross languages (the mislabel smoke alarm). EXACT: on "
    "directed-edge counts, r = (2m*same - sum(a_l^2)) / ((2m)^2 - "
    "sum(a_l^2)) — integer numerator/denominator, one trunc division; "
    "same/expected shares reported alongside. Shape: keeper edge list "
    "joined twice to the doc->lang projection, a |langs|-row marginal "
    "rollup, two scalar dims crossed",
)
def graph_lang_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from jigsaw_spark.operators.dedup import keeper_edges

    docs = _t(spark, sf_dir, "documents")
    lab = docs.select("doc_id", "lang")
    edges = keeper_edges(docs, "doc_id").localCheckpoint()
    el = (
        edges.join(
            lab.select(
                F.col("doc_id").alias("u"), F.col("lang").alias("lang_u")
            ),
            "u",
        )
        .join(
            lab.select(
                F.col("doc_id").alias("v"), F.col("lang").alias("lang_v")
            ),
            "v",
        )
        .select("lang_u", "lang_v")
        .localCheckpoint()
    )
    tot = el.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum(F.when(F.col("lang_u") == F.col("lang_v"), 1).otherwise(0))
        .cast("bigint")
        .alias("same"),
    )
    marg = (
        el.groupBy("lang_u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("a"))
        .agg(F.sum(F.col("a") * F.col("a")).cast("bigint").alias("sa2"))
    )
    return tot.crossJoin(F.broadcast(marg)).select(
        F.col("m2").alias("n_edges_directed"),
        F.col("same").alias("n_same_lang"),
        F.col("sa2").alias("sum_marg_sq"),
        F.expr(
            "CAST(CASE WHEN m2 = 0 THEN 0"
            " ELSE same * 1000 div m2 END AS BIGINT)"
        ).alias("same_share_milli"),
        F.expr(
            "CAST(CASE WHEN m2 = 0 THEN 0"
            " ELSE sa2 * 1000 div (m2 * m2) END AS BIGINT)"
        ).alias("expected_share_milli"),
        F.expr(
            "CAST(CASE WHEN m2 * m2 = sa2 THEN 0"
            " ELSE (m2 * same - sa2) * 1000 div (m2 * m2 - sa2)"
            " END AS BIGINT)"
        ).alias("assortativity_milli"),
    )


# ---------------------------------------------------------------------------
# ts_turning_points
# ---------------------------------------------------------------------------

_TURNING_SQL = """
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, cents,
             lag(cents) OVER (PARTITION BY event_type ORDER BY day)
               AS prev,
             lead(cents) OVER (PARTITION BY event_type ORDER BY day)
               AS nxt
      FROM daily)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
             AND ((prev < cents AND nxt < cents)
                  OR (prev > cents AND nxt > cents))
             THEN 1 ELSE 0 END) AS BIGINT) AS n_turning,
           CAST(CASE WHEN count(*) < 3 THEN 0
             ELSE sum(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
               AND ((prev < cents AND nxt < cents)
                    OR (prev > cents AND nxt > cents))
               THEN 1 ELSE 0 END) * 1000 // (count(*) - 2)
             END AS BIGINT) AS turning_rate_milli,
           CAST(CASE WHEN count(*) < 3 THEN 0
             ELSE 2000 * (count(*) - 2) // 3 END AS BIGINT)
             AS expected_count_milli
    FROM lagged GROUP BY event_type
"""


@register(
    "ts_turning_points",
    _TURNING_SQL,
    "turning-point randomness test per event type: strict local "
    "extrema of the daily series (prev < x > next or prev > x < next "
    "over the day-ordered sequence; ties are NOT extrema), with the "
    "i.i.d. reference E = 2(n-2)/3 reported in milli — far fewer "
    "turning points than random means the series trends or sticks "
    "(ts_control_rules' runs test asks about LEVELS vs the mean; this "
    "asks about local SHAPE and needs no mean at all). Adjacency is "
    "value-order adjacency over the present days (a gap's endpoints "
    "are compared directly — ts_gap_stats audits the gaps "
    "themselves). Shape: day-grain pre-agg FIRST, one lag/lead window "
    "partitioned by type, one per-type rollup — exact integer counts",
)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "cents",
        F.lag("cents").over(w).alias("prev"),
        F.lead("cents").over(w).alias("nxt"),
    )
    turning = F.when(
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (
            ((F.col("prev") < F.col("cents")) & (F.col("nxt") < F.col("cents")))
            | ((F.col("prev") > F.col("cents")) & (F.col("nxt") > F.col("cents")))
        ),
        1,
    ).otherwise(0)
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(turning).cast("bigint").alias("n_turning"),
        F.expr(
            "CAST(CASE WHEN count(1) < 3 THEN 0 ELSE sum(CASE WHEN"
            " prev IS NOT NULL AND nxt IS NOT NULL AND ((prev < cents"
            " AND nxt < cents) OR (prev > cents AND nxt > cents))"
            " THEN 1 ELSE 0 END) * 1000 div (count(1) - 2) END"
            " AS BIGINT)"
        ).alias("turning_rate_milli"),
        F.expr(
            "CAST(CASE WHEN count(1) < 3 THEN 0"
            " ELSE 2000 * (count(1) - 2) div 3 END AS BIGINT)"
        ).alias("expected_count_milli"),
    )


# ---------------------------------------------------------------------------
# ts_gap_stats
# ---------------------------------------------------------------------------

_GAP_STATS_SQL = """
    WITH daily AS MATERIALIZED (
      SELECT DISTINCT event_type,
             epoch_us(ts) // 86400000000 AS day
      FROM events),
    lagged AS (
      SELECT event_type, day,
             lag(day) OVER (PARTITION BY event_type ORDER BY day)
               AS prev_day
      FROM daily)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
           CAST(max(day) - min(day) + 1 - count(*) AS BIGINT)
             AS n_missing,
           CAST(sum(CASE WHEN prev_day IS NOT NULL
             AND day - prev_day > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gaps,
           CAST(coalesce(max(CASE WHEN prev_day IS NOT NULL
             THEN day - prev_day - 1 END), 0) AS BIGINT)
             AS longest_gap
    FROM lagged GROUP BY event_type
"""


@register(
    "ts_gap_stats",
    _GAP_STATS_SQL,
    "daily-continuity audit per event type: days present, calendar "
    "span, missing days, gap count, longest gap (islands arithmetic: "
    "day - lag(day) - 1). ts_gap_fill / ts_locf FILL gaps assuming "
    "they are benign; this is the audit that says whether they are (a "
    "30-day hole is an outage to exclude, not noise to interpolate) — "
    "the per-type summary twin of rel_gaps_islands' island "
    "enumeration. Shape: DISTINCT day pre-agg, one lag window "
    "partitioned by type, one per-type rollup — exact integer day "
    "arithmetic, no calendar table",
)
def ts_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", F.lag("day").over(w).alias("prev_day")
    )
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (F.max("day") - F.min("day") + 1).cast("bigint").alias(
            "span_days"
        ),
        (F.max("day") - F.min("day") + 1 - F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_missing"),
        F.sum(
            F.when(
                F.col("prev_day").isNotNull()
                & (F.col("day") - F.col("prev_day") > 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_gaps"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("prev_day").isNotNull(),
                    F.col("day") - F.col("prev_day") - 1,
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("longest_gap"),
    )


# ---------------------------------------------------------------------------
# Round-11 batch 6 (same module — the window is governed by _R11_NEW in
# plans/queries; modules at/after _OVERFLOW_BOUNDARY queue behind it).
# ---------------------------------------------------------------------------

# p_shard_balance ------------------------------------------------------------


def _shard_balance_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH s AS (
      SELECT CAST(CAST(('0x' || substr(md5('shard|'
               || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT)
               % CAST(8 AS UBIGINT) AS BIGINT) AS shard,
             CAST(len({tokens_sql('text')}) AS BIGINT) AS toks
      FROM documents),
    per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(toks) AS BIGINT) AS n_tokens
      FROM s GROUP BY 1),
    tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_shards
      FROM per)
    SELECT p.shard, p.n_docs, p.n_tokens,
           CAST(CASE WHEN t.total = 0 THEN 0
             ELSE p.n_tokens * t.n_shards * 1000 // t.total
             END AS BIGINT) AS load_milli
    FROM per p CROSS JOIN tot t
"""


@register(
    "p_shard_balance",
    _shard_balance_sql(),
    "shard TOKEN balance: per md5-hash shard (fixed 8 here — the "
    "production n//1000+1 rule of p7_shard_assign yields one shard at "
    "test SF, so the diagnostic pins the count), docs, token mass, "
    "and load vs uniform (1000 = balanced). p7 balances DOC counts by "
    "construction; training-data shards must balance TOKENS or the "
    "largest shard gates every epoch (the straggler the "
    "ann_ivf_balance report catches for ANN cells, here for the "
    "packing/export path). Shape: map-side shard key, one 8-row "
    "hash-agg, one scalar cross",
)
def p_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr

    docs = _t(spark, sf_dir, "documents")
    shard = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit("shard"), F.col("doc_id"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(8),
    )
    s = docs.select(
        shard.alias("shard"),
        F.size(tokens_expr("text")).cast("bigint").alias("toks"),
    )
    per = s.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_tokens").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "n_tokens",
        F.expr(
            "CAST(CASE WHEN total = 0 THEN 0"
            " ELSE n_tokens * n_shards * 1000 div total END AS BIGINT)"
        ).alias("load_milli"),
    )


# dq_near_zero_variance ------------------------------------------------------

_NZV_SQL = """
    WITH vals AS (
      SELECT 'l_quantity' AS col,
             CAST(round(l_quantity * 100, 0) AS BIGINT) AS v
      FROM lineitem
      UNION ALL
      SELECT 'l_discount', CAST(round(l_discount * 100, 0) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'l_tax', CAST(round(l_tax * 100, 0) AS BIGINT)
      FROM lineitem),
    freq AS (
      SELECT col, v, CAST(count(*) AS BIGINT) AS c
      FROM vals GROUP BY 1, 2),
    ranked AS (
      SELECT col, c,
             row_number() OVER (PARTITION BY col ORDER BY c DESC, v)
               AS rk
      FROM freq),
    tops AS (
      SELECT col,
             CAST(max(CASE WHEN rk = 1 THEN c END) AS BIGINT) AS top1,
             CAST(coalesce(max(CASE WHEN rk = 2 THEN c END), 0)
               AS BIGINT) AS top2
      FROM ranked GROUP BY 1),
    stats AS (
      SELECT col, CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c) AS BIGINT) AS n
      FROM freq GROUP BY 1)
    SELECT s.col, s.n, s.n_distinct, t.top1, t.top2,
           CAST(t.top1 * 1000 // greatest(t.top2, 1) AS BIGINT)
             AS freq_ratio_milli,
           CAST(s.n_distinct * 1000 // s.n AS BIGINT)
             AS distinct_per_mille,
           (t.top1 * 1000 // greatest(t.top2, 1) >= 19000
            AND s.n_distinct * 1000 // s.n < 100) AS near_zero_var
    FROM stats s JOIN tops t ON s.col = t.col
"""


@register(
    "dq_near_zero_variance",
    _NZV_SQL,
    "near-zero-variance feature screen (the caret nearZeroVar rule in "
    "exact integers): per numeric lineitem column (cents-snapped for "
    "exact grouping), n, distinct count, top-1/top-2 value "
    "frequencies, the freq ratio and distinct-per-mille, and the NZV "
    "flag (ratio >= 19 AND unique share < 10%) — a feature that is "
    "one value 95% of the time carries no signal and breaks "
    "cross-validation folds; this is the screen run before any "
    "ml_woe_iv / ml_best_split treats a column as a feature. Shape: "
    "three column arms unioned into ONE (col, value) hash-agg; the "
    "rank window runs per column over its DISTINCT-VALUE dim "
    "(value-domain bounded)",
)
def dq_near_zero_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")

    def arm(col: str) -> DataFrame:
        return li.select(
            F.lit(col).alias("col"),
            F.round(F.col(col) * 100, 0).cast("bigint").alias("v"),
        )

    vals = (
        arm("l_quantity")
        .unionByName(arm("l_discount"))
        .unionByName(arm("l_tax"))
    )
    freq = vals.groupBy("col", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("col").orderBy(F.desc("c"), F.col("v"))
    ranked = freq.select(
        "col", "c", F.row_number().over(w).alias("rk")
    )
    tops = ranked.groupBy("col").agg(
        F.max(F.when(F.col("rk") == 1, F.col("c")))
        .cast("bigint")
        .alias("top1"),
        F.coalesce(
            F.max(F.when(F.col("rk") == 2, F.col("c"))), F.lit(0)
        )
        .cast("bigint")
        .alias("top2"),
    )
    stats = freq.groupBy("col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum("c").cast("bigint").alias("n"),
    )
    return stats.join(tops, "col").select(
        "col",
        "n",
        "n_distinct",
        "top1",
        "top2",
        F.expr(
            "CAST(top1 * 1000 div greatest(top2, 1) AS BIGINT)"
        ).alias("freq_ratio_milli"),
        F.expr("CAST(n_distinct * 1000 div n AS BIGINT)").alias(
            "distinct_per_mille"
        ),
        F.expr(
            "top1 * 1000 div greatest(top2, 1) >= 19000"
            " AND n_distinct * 1000 div n < 100"
        ).alias("near_zero_var"),
    )


# ab_power_mde ---------------------------------------------------------------

_POWER_SQL = """
    WITH s AS (
      SELECT CAST(CAST(('0x' || substr(md5('power|'
               || CAST(event_id AS VARCHAR)), 1, 15)) AS UBIGINT)
               % CAST(2 AS UBIGINT) AS BIGINT) AS arm,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events),
    agg AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(count(*) AS BIGINT) AS n
      FROM s)
    SELECT n_a, n_b,
           CAST(CASE WHEN n = 0 THEN 0
             ELSE pos * 1000000 // n END AS BIGINT) AS p_pooled_micro,
           CAST(CASE WHEN n = 0 OR least(n_a, n_b) = 0 THEN 0
             ELSE CAST(round(2.801585218
               * sqrt(2.0 * (pos * 1000000 // n)
                      * (1000000 - pos * 1000000 // n) / 1000000.0
                      / least(n_a, n_b)), 0) AS BIGINT)
             END AS BIGINT) AS mde_abs_micro,
           CAST(CASE WHEN n = 0 OR least(n_a, n_b) = 0 OR pos = 0 THEN 0
             ELSE CAST(round(2.801585218
               * sqrt(2.0 * (pos * 1000000 // n)
                      * (1000000 - pos * 1000000 // n) / 1000000.0
                      / least(n_a, n_b)), 0) AS BIGINT) * 1000
               // (pos * 1000000 // n) END AS BIGINT) AS mde_rel_milli
    FROM agg
"""


@register(
    "ab_power_mde",
    _POWER_SQL,
    "pre-experiment power check: minimum detectable effect of a 50/50 "
    "md5 split at alpha=0.05 (two-sided) and 80% power — "
    "MDE = (z_{0.975} + z_{0.8}) * sqrt(2 p(1-p) / n_min) with the "
    "pooled rate snapped to integer micro FIRST so the only floats "
    "are the constant z-sum and one IEEE sqrt (correctly rounded in "
    "both engines — the Welch-t precedent), then round-snapped. "
    "ab_srm_check validates the split AFTER the fact; this is the "
    "question asked BEFORE: can this experiment even see the effect "
    "size we care about, or is it theater. Shape: one map-side arm "
    "assignment, ONE 1-row aggregate",
)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    arm = F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("|", F.lit("power"), F.col("event_id"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint"),
        F.lit(2),
    )
    s = ev.select(
        arm.alias("arm"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("y"),
    )
    agg = s.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum("y").cast("bigint").alias("pos"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    mde = (
        "CAST(round(2.801585218"
        " * sqrt(2.0 * (pos * 1000000 div n)"
        " * (1000000 - pos * 1000000 div n) / 1000000.0"
        " / least(n_a, n_b)), 0) AS BIGINT)"
    )
    # empty-arm / empty-table guard (advisor r11 #2): sqrt(.../0) is a
    # float div-by-zero and pos*1000000 div 0 an integer one — DuckDB
    # raises while Spark returns NULL, so both engines agree on the 0
    # sentinel instead (the mde_rel_milli CASE pattern, extended)
    return agg.select(
        "n_a",
        "n_b",
        F.expr(
            "CAST(CASE WHEN n = 0 THEN 0"
            " ELSE pos * 1000000 div n END AS BIGINT)"
        ).alias("p_pooled_micro"),
        F.expr(
            f"CAST(CASE WHEN n = 0 OR least(n_a, n_b) = 0 THEN 0"
            f" ELSE {mde} END AS BIGINT)"
        ).alias("mde_abs_micro"),
        F.expr(
            f"CAST(CASE WHEN n = 0 OR least(n_a, n_b) = 0 OR pos = 0"
            f" THEN 0 ELSE {mde} * 1000"
            " div (pos * 1000000 div n) END AS BIGINT)"
        ).alias("mde_rel_milli"),
    )


# text_hapax_rate ------------------------------------------------------------


def _hapax_sql() -> str:
    from jigsaw_spark.operators.text import tokens_sql

    return f"""
    WITH toks AS (
      SELECT lang, unnest({tokens_sql('text')}) AS tok
      FROM documents),
    freq AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(sum(c) AS BIGINT) AS total_occ,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000
             // count(*) AS BIGINT) AS hapax_vocab_milli,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000
             // sum(c) AS BIGINT) AS hapax_mass_milli
    FROM freq GROUP BY lang
"""


@register(
    "text_hapax_rate",
    _hapax_sql(),
    "hapax legomena profile per lang: vocabulary size, once-seen "
    "tokens, and the hapax share of the vocabulary and of the token "
    "mass — a healthy natural corpus runs ~400-600 milli hapax vocab "
    "(Zipf); far BELOW means templated/duplicated text (the dedup "
    "signal before any pair is built), far ABOVE means OCR noise or "
    "tokenizer misfires (text_oov_rate's cause upstream). "
    "text_lexical_diversity is per-doc TTR; this is the corpus-level "
    "tail profile next to text_zipf_slope's head fit. Shape: one "
    "explode -> one (lang, token) hash-agg -> a |langs| rollup",
)
def text_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jigsaw_spark.operators.text import tokens_expr
    from jigsaw_spark.session import widen

    docs = widen(_t(spark, sf_dir, "documents"))
    freq = docs.select(
        "lang", F.explode(tokens_expr("text")).alias("tok")
    ).groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return freq.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum("c").cast("bigint").alias("total_occ"),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000"
            " div count(1) AS BIGINT)"
        ).alias("hapax_vocab_milli"),
        F.expr(
            "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000"
            " div sum(c) AS BIGINT)"
        ).alias("hapax_mass_milli"),
    )
